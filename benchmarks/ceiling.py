"""Driver-runnable single-chip ceiling harness (round-4 VERDICT #4).

Measures, on the attached chip, every primitive that bounds the fused
downsample+outlier+tilefilter chain's throughput, and prints ONE JSON
line with the numbers plus the implied ceiling.  The claim it makes
falsifiable: **any exact sort-based chain on one v5e is capped by the
measured 3-operand sort floor** (key + 62 payload bits), because

  * the voxel reduction must group 1M points by voxel key — grouping
    needs either a sort or a scatter, and the ISA has no per-lane
    scatter (random-gather rate measured here, ~70M rows/s, also rules
    out sort-by-index + permute);
  * the payload (in-voxel offsets + rgba = 62 bits) cannot ride fewer
    than 2 extra sort operands (measured: key+1op cannot carry it);
  * the remaining stages' floors were strip-measured in rounds 2-3
    (BASELINE.md) and sum to ~1.7 ms/1M — also reproduced here as the
    measured full-chain-minus-sort residue.

Falsification attempts recorded (run with --falsify to re-measure):
  F1 two-pass bucket sort: sort 16-bit key prefix only, then gather the
     payload by the permutation — the gather alone costs more than the
     full 3-op sort (bucketing by any means that is not itself a sort
     needs a scatter, which the ISA lacks).
  F2 keys-only sort width: i16 vs i32 keys — near-identical, so radix /
     narrower-key schemes do not beat the comparison network.
  (F3, rounds 2-3, not re-run: Pallas bitonic VMEM sort measured 7.5x
   slower than XLA's sort; per-cell DMA fetching dies on ~1 us DMA issue
   rate; dense 3D grids die on ~1% occupancy.)

Usage: python benchmarks/ceiling.py [--falsify]
Output: one JSON line (keys: sort1/sort2/sort3_ms, gather_mrows_s,
chain_ms, chain_minus_sort_ms, implied_ceiling_pts_s, north_star_frac,
falsify.*).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20


def diff_time(make_body, args, k_loop=16, reps=3):
    """Chip-side cost via K-loop differencing (bench.py methodology)."""

    @jax.jit
    def program(seed, *a):
        def body(i, acc):
            return acc + make_body(seed + i, *a)

        return jax.lax.fori_loop(0, k_loop, body, jnp.float32(0))

    @jax.jit
    def trivial(seed, *a):
        return seed.astype(jnp.float32)

    def run(prog, s):
        t0 = time.perf_counter()
        np.asarray(prog(jnp.int32(s), *args))
        return time.perf_counter() - t0

    run(trivial, 0)
    run(program, 1)  # compile
    t0 = min(run(trivial, 100 + r) for r in range(reps))
    tK = min(run(program, 200 + r) for r in range(reps))
    return max((tK - t0) / k_loop, 1e-9) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--falsify", action="store_true",
                    help="re-measure the falsification attempts too")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
    # complex64 cannot cross the relay as program I/O; build it in-program
    pay_a = jnp.asarray(rng.random(N, dtype=np.float32))
    pay_b = jnp.asarray(rng.random(N, dtype=np.float32))
    pay_i = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
    vals = jnp.asarray(rng.random((N,), dtype=np.float32))

    out = {}

    def nudge(seed, k):
        return (k + seed).astype(jnp.int32)

    out["sort1_ms"] = round(diff_time(
        lambda s, k: jax.lax.sort((nudge(s, k),), num_keys=1)[0][0]
        .astype(jnp.float32),
        (keys,),
    ), 3)
    out["sort2_ms"] = round(diff_time(
        lambda s, k, a, b: jnp.real(
            jax.lax.sort(
                (nudge(s, k), jax.lax.complex(a, b)), num_keys=1
            )[1][0]
        ),
        (keys, pay_a, pay_b),
    ), 3)

    def sort3_body(s, k, a, b, q):
        r = jax.lax.sort(
            (nudge(s, k), jax.lax.complex(a, b), q), num_keys=1
        )
        return jnp.real(r[1][0]) + r[2][0].astype(jnp.float32)

    out["sort3_ms"] = round(
        diff_time(sort3_body, (keys, pay_a, pay_b, pay_i)), 3
    )

    def gather_body(s, v, ix):
        ixs = (ix + s).astype(jnp.int32) % N
        return v[ixs][0]

    g_ms = diff_time(gather_body, (vals, idx))
    out["gather_mrows_s"] = round(N / g_ms / 1e3, 1)

    # the real chain, and the chain with the sort differenced out:
    # chain_minus_sort = chain - sort3 is the measured non-sort residue
    from cwipc_util_tpu.core.buffers import PointBuffer
    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops.chain import downsample_outliers_tilefilter

    buf = _generate(1000, 1000, N, jnp.float32(0.5))

    def chain_body(s, b_xyz, b_rgba, b_cnt):
        eps = s.astype(jnp.float32) * 1e-12
        bi = PointBuffer(xyz=b_xyz + eps, rgba=b_rgba, count=b_cnt)
        o = downsample_outliers_tilefilter(
            bi, jnp.float32(2.0 / 1000 * 2.0), k=30, mult=jnp.float32(1.0),
            tile=jnp.uint32(1), out_capacity=229376,
        )
        return o.count.astype(jnp.float32)

    out["chain_ms"] = round(
        diff_time(chain_body, (buf.xyz, buf.rgba, buf.count)), 3
    )
    out["chain_minus_sort_ms"] = round(out["chain_ms"] - out["sort3_ms"], 3)

    # Implied ceiling: even with every non-sort stage free, a sort-based
    # chain cannot beat N / sort3; the honest ceiling adds the measured
    # non-sort residue.
    out["implied_ceiling_pts_s"] = round(N / (out["sort3_ms"] / 1e3))
    out["implied_ceiling_note"] = (
        "N / sort3_ms: every non-sort stage free; the measured chain adds "
        "chain_minus_sort_ms on top"
    )
    out["north_star_frac"] = round(out["implied_ceiling_pts_s"] / 1e9, 4)

    if args.falsify:
        # F1: keys-only sort + payload permute via gather
        def f1_body(s, k, a, b):
            sk, si = jax.lax.sort(
                (nudge(s, k), jnp.arange(N, dtype=jnp.int32)), num_keys=1
            )
            p = jax.lax.complex(a, b)
            return jnp.real(p[si][0]) + sk[0].astype(jnp.float32)

        out["falsify_f1_keysort_permute_ms"] = round(
            diff_time(f1_body, (keys, pay_a, pay_b), k_loop=4), 3
        )
        # F2: i16 vs i32 keys-only
        k16 = (keys >> 15).astype(jnp.int16)
        out["falsify_f2_sort_i16_ms"] = round(diff_time(
            lambda s, k: jax.lax.sort(
                ((k + s.astype(jnp.int16)),), num_keys=1
            )[0][0].astype(jnp.float32),
            (k16,), k_loop=8,
        ), 3)
        out["falsify_f2_sort_i32_ms"] = out["sort1_ms"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
