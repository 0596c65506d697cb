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

Round 5 adds the EXACT-SELECTION roofline (VERDICT r4 weak #2: the
"~50% VPU peak, ALU-bound" floor was builder-asserted).  Everything is
measured on the attached chip, including the roofline DENOMINATORS:

  * vpu_peak_gops: a 64-deep dependent-FMA chain over an 8M-element
    array (arith intensity 32 flop/byte — compute-bound by construction;
    the chain coefficient is a traced scalar so XLA cannot fold it);
  * hbm_read_gbs: a 256 MB reduction (VPU cost ~70 us of the ~300 us
    transfer — bandwidth-bound by construction);
  * sel_ms: the exact-selection kernel alone, at the exact chain's
    bench shape (1M cloud -> 4 mm downsample -> gy=504, gz=152, cap=28,
    k=30, seeded), via the same K-loop differencing;
  * sel_build_ms: the probe="build" strip-down (distance build without
    selection) — the empirical split between build and bisection;
  * sel_vpu_frac: achieved element-ops/s over vpu_peak, with the
    op-count model stated in sel_ops_model (falsify it by editing the
    model or the kernel and re-running);
  * sel_hbm_frac: the kernel's total DMA traffic over hbm_read_gbs —
    shows the kernel is NOWHERE near memory-bound (the claim is an ALU
    wall, not an HBM wall);
  * mxu_count_ms / mxu_count_kth_equal: the round-5 falsification
    attempt — the bisection's count reduction routed through the MXU as
    an exact ones-row matmul (ops/pallas_cols_select.py mxu_count) —
    with the equal-results check that makes its verdict trustworthy.

Usage: python benchmarks/ceiling.py [--falsify]
Output: one JSON line (keys: sort1/sort2/sort3_ms, gather_mrows_s,
chain_ms, chain_minus_sort_ms, implied_ceiling_pts_s, north_star_frac,
vpu_peak_gops, hbm_read_gbs, sel_*, mxu_count_*, falsify.*).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# Persistent cache into the machine-wide default dir, enabled by the
# package import — BEFORE the first compile, so the sort probes cache
# too.  (An env setdefault here is dead code: jax is preloaded at
# interpreter startup in this image, so in-process JAX_* env edits never
# reach jax.config — NOTES_ROUND5.md.)
import cwipc_util_tpu  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
_F32_MAX_NP = float(np.finfo(np.float32).max)


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

    # ---- exact-selection roofline (round 5) --------------------------------
    # Measured denominators first: this chip's compute and bandwidth
    # peaks, by probes that are compute-/bandwidth-bound by construction.
    M_FMA = 1 << 23  # 32 MB array, 64-deep FMA chain -> AI 32 flop/byte

    def vpu_body(s, x):
        a = 1.0 + s.astype(jnp.float32) * 1e-12  # traced: no folding
        y = x
        for _ in range(64):
            y = y * a + 0.5
        # reduce, do NOT slice: returning y[0] lets XLA shrink the whole
        # elementwise chain to element 0 (measured: the probe costs zero
        # and the clamp floor reports vpu_peak = 2^30 — garbage)
        return jnp.sum(y)

    # k_loop=64: the per-iteration cost here is only ~0.3-0.6 ms, and an
    # 8-iteration delta (~2-5 ms) can drown in relay dispatch jitter —
    # measured: a K=8 run returned the exact clamp values 2^30/2^28,
    # i.e. tK - t0 <= 0.  64 iterations put the delta at 20-40 ms.
    vx = jnp.asarray(rng.random(M_FMA, dtype=np.float32))
    vpu_ms = diff_time(vpu_body, (vx,), k_loop=64)
    out["vpu_peak_gops"] = round(M_FMA * 128 / (vpu_ms * 1e-3) / 1e9, 1)

    H = 1 << 26  # 256 MB

    def hbm_body(s, x):
        # the seed must perturb the DATA PASS itself: `sum(x) + s*0.0`
        # folds the nudge to zero and XLA hoists the loop-invariant
        # reduction out of the K-loop (measured: 44 TB/s "bandwidth",
        # 50x over HBM spec).  (1 + s*1e-30) fuses into the read pass.
        return jnp.sum(x * (1.0 + s.astype(jnp.float32) * 1e-30))

    hx = jnp.asarray(rng.random(H, dtype=np.float32))
    hbm_ms = diff_time(hbm_body, (hx,), k_loop=64)
    out["hbm_read_gbs"] = round(H * 4 / (hbm_ms * 1e-3) / 1e9, 1)
    # A delta at the 1e-9 clamp means the probe drowned in relay jitter:
    # flag it so downstream readers never trust a clamp-floor number.
    out["denominators_valid"] = bool(vpu_ms > 1e-5 and hbm_ms > 1e-5)

    # The selection kernel alone, at the exact chain's bench shape.
    from cwipc_util_tpu.ops import voxelize
    from cwipc_util_tpu.ops.cols_knn import _cols_build
    from cwipc_util_tpu.ops.pallas_cols_select import (
        RING_COLS,
        SLOT_TIERS,
        TILE,
        cols_select_pallas,
        slab_occupancy,
    )

    K_SEL, GY, GZ, CAP = 30, 504, 152, 28
    cell = jnp.float32(2.0 / 1000 * 2.0)
    dx_, dy_, dz_, _rgba, dcnt = voxelize.downsample_cm(buf, cell, 1 << 18)
    dxyz = jnp.stack([dx_, dy_, dz_], axis=-1)
    planes = _cols_build(
        dxyz, dcnt, cell, gy=GY, gz=GZ, cap=CAP, chunk=256, want_orig=False,
    )
    xs_g, ys_g, zs_g = (jnp.asarray(p) for p in planes[:3])

    def sel_body(s, xs, ys, zs, probe="full", mxu=False):
        eps = s.astype(jnp.float32) * 1e-30
        su, kt = cols_select_pallas(
            xs + eps, ys, zs, k=K_SEL, gy=GY, gz=GZ, cap=CAP,
            cell=cell, seeded=True, probe=probe, mxu_count=mxu,
        )
        return su[0, 0] + kt[0, 0]

    out["sel_ms"] = round(diff_time(sel_body, (xs_g, ys_g, zs_g), k_loop=4), 2)
    out["sel_build_ms"] = round(diff_time(
        lambda s, xs, ys, zs: sel_body(s, xs, ys, zs, probe="build"),
        (xs_g, ys_g, zs_g), k_loop=4,
    ), 2)

    # Analytic element-op count of the seeded full path, mirroring the
    # kernel's per-tile tier dispatch and per-slot loop bound: per
    # occupied slot the kernel makes ~OPS_PER_ELEM passes over
    # [RING_COLS * tier, 128] candidates (build 8 + bitcast 1 + seed
    # count 2 + 13 bisection steps x 2 + 2 advances x 4 + final 5).
    OPS_PER_ELEM = 8 + 1 + 2 + 13 * 2 + 2 * 4 + 5
    xs_np = np.asarray(xs_g)
    gyz = GY * GZ
    off = 4 * GZ + 4
    occ_cols = (xs_np[off : off + gyz, :CAP] < _F32_MAX_NP / 2).sum(axis=1)
    ntiles = -(-gyz // TILE)
    total_elems = 0
    for t in range(ntiles):
        occ_b = slab_occupancy(xs_np, GZ, CAP, t)
        tier = next(
            (tt for tt in sorted({*SLOT_TIERS, CAP}) if occ_b <= tt), CAP
        )
        occ_q = int(occ_cols[t * TILE : (t + 1) * TILE].max(initial=0))
        total_elems += RING_COLS * tier * TILE * min(occ_q, CAP)
    out["sel_ops_model"] = (
        f"{OPS_PER_ELEM} elementwise passes per candidate element; "
        f"candidate elements = sum over tiles of ring({RING_COLS}) * tier "
        f"* 128 lanes * occupied slots = {total_elems}"
    )
    sel_s = out["sel_ms"] * 1e-3
    achieved = total_elems * OPS_PER_ELEM / sel_s / 1e9
    out["sel_achieved_gops"] = round(achieved, 1)
    out["sel_vpu_frac"] = round(achieved / out["vpu_peak_gops"], 3)
    # DMA traffic: each tile reads its [3*capp, sw] slab once + writes
    # two [capp, 128] results
    capp = -(-CAP // 8) * 8
    off_al = TILE * (-(-off // TILE))
    sw = TILE * (-(-(TILE + off_al + off) // TILE)) + TILE
    sel_bytes = ntiles * (3 * capp * sw + 2 * capp * TILE) * 4
    out["sel_hbm_gbs"] = round(sel_bytes / sel_s / 1e9, 1)
    out["sel_hbm_frac"] = round(
        (sel_bytes / sel_s / 1e9) / out["hbm_read_gbs"], 3
    )

    # The MXU-count falsification attempt: identical selection with the
    # bisection counts routed through the MXU (exact small-integer f32
    # matmuls), plus the result-equality check.
    out["mxu_count_ms"] = round(diff_time(
        lambda s, xs, ys, zs: sel_body(s, xs, ys, zs, mxu=True),
        (xs_g, ys_g, zs_g), k_loop=4,
    ), 2)
    su_v, kt_v = cols_select_pallas(
        xs_g, ys_g, zs_g, k=K_SEL, gy=GY, gz=GZ, cap=CAP,
        cell=cell, seeded=True,
    )
    su_m, kt_m = cols_select_pallas(
        xs_g, ys_g, zs_g, k=K_SEL, gy=GY, gz=GZ, cap=CAP,
        cell=cell, seeded=True, mxu_count=True,
    )
    out["mxu_count_kth_equal"] = bool(
        np.array_equal(np.asarray(kt_v), np.asarray(kt_m))
    )
    out["mxu_count_sums_close"] = bool(
        np.allclose(np.asarray(su_v), np.asarray(su_m), rtol=1e-5, atol=1e-5)
    )

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
