"""Headline benchmark: fused downsample + outlier-removal + tilefilter chain.

Measures points/sec/chip on a 1M-point synthetic cloud (the BASELINE.json
metric) on the default platform (the real TPU chip under the driver).

The host reaches the chip through a relay with ~33 ms fixed dispatch +
readback overhead per program execution (measured; a directly-attached host
is ~10 us).  To report the chip-side chain cost, the benchmark runs K
chained iterations inside ONE jitted program (lax.fori_loop with a
loop-dependent perturbation so iterations cannot be CSE'd) and differences
two program sizes: per-chain = (t_K - t_1) / (K - 1).

vs_baseline is the ratio to the driver-supplied north-star target of
1e9 points/sec/chip.
"""

import argparse
import json
import os
import time

# Persistent compilation cache: chain compiles are minutes through the
# remote-compile relay; cache them across bench runs.  The framework
# enables it at import (core/compile_cache.py) into one machine-wide
# default dir shared with the smoke suite, ceiling.py and the CLI flows;
# an env setdefault here would be DEAD — jax is preloaded at interpreter
# startup in this image, so only exported vars or config.update work.
import cwipc_util_tpu  # noqa: F401  (enables the persistent cache)

import jax
import jax.numpy as jnp
import numpy as np


def _backend_watchdog(timeout_s: float = 300.0) -> None:
    """Fail fast with a diagnostic JSON line if backend init hangs.

    A wedged relay blocks jax.devices() indefinitely (observed: a killed
    remote compile left it unavailable for hours); the driver must get a
    parseable artifact, not a hang."""
    import threading

    done = threading.Event()
    devices: list = []

    def probe():
        try:
            devices.extend(jax.devices())
        except Exception as e:  # backend init raised
            devices.append(e)
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "chain_pts_per_sec", "value": 0, "unit": "points/sec",
            "vs_baseline": 0.0,
            "error": f"backend init did not complete within {timeout_s:.0f}s"
                     " (relay unavailable)",
        }))
        os._exit(3)
    if devices and isinstance(devices[0], Exception):
        print(json.dumps({
            "metric": "chain_pts_per_sec", "value": 0, "unit": "points/sec",
            "vs_baseline": 0.0,
            "error": f"backend init failed: {devices[0]}",
        }))
        os._exit(3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="Write a jax.profiler trace of the timed runs to DIR")
    ap.add_argument("--exact", action="store_true",
                    help="(default since round 4; kept for compatibility)")
    ap.add_argument("--skip-exact", action="store_true",
                    help="Skip the exact-outlier chain measurement (its "
                         "first compile costs minutes through the "
                         "remote-compile relay; cached afterwards)")
    args = ap.parse_args()

    _backend_watchdog()

    from cwipc_util_tpu.core.buffers import PointBuffer
    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops.chain import (
        downsample_outliers_tilefilter,
        downsample_outliers_tilefilter_exact,
    )

    hsteps = asteps = 1000  # 1,000,000 points
    n_points = hsteps * asteps
    capacity = 1 << 20
    # The bench cloud reduces to 217,598 voxels (measured, deterministic);
    # sizing the post-downsample buffer at 5.4% headroom instead of a loose
    # power of two cuts the kNN/compaction stages' padded work (measured
    # +3.5% chain throughput vs 1<<18 in the same session).
    out_capacity = 229376
    cellsize = jnp.float32(2.0 / hsteps * 2.0)  # 4mm voxels on 2mm spacing
    k = 30
    mult = jnp.float32(1.0)
    tile = jnp.uint32(1)

    buf = _generate(hsteps, asteps, capacity, jnp.float32(0.5))

    def make_program(iters: int):
        @jax.jit
        def program(b: PointBuffer, seed: jax.Array) -> jax.Array:
            def body(i, acc):
                # loop-dependent nudge (sub-nm) so XLA cannot collapse
                # the K iterations into one
                eps = (seed + i).astype(jnp.float32) * 1e-12
                bi = PointBuffer(xyz=b.xyz + eps, rgba=b.rgba, count=b.count)
                out = downsample_outliers_tilefilter(
                    bi, cellsize, k=k, mult=mult, tile=tile,
                    out_capacity=out_capacity,
                )
                return acc + out.count
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
        return program

    # K amortizes the relay's ~33 ms dispatch variance (+/- a few ms):
    # at K=16 a 3 ms jitter is <0.2 ms per chain (~3%).
    K = 16
    pK = make_program(K)

    # Trivial program with the same dispatch+readback shape: its runtime IS
    # the relay overhead (measured ~33 ms; a directly-attached host would
    # see ~10 us).  Compiling only one chain program keeps the bench's
    # remote-compile time bounded.
    @jax.jit
    def trivial(b: PointBuffer, seed: jax.Array) -> jax.Array:
        return b.count + seed

    def timed(prog, s):
        t0 = time.perf_counter()
        v = int(np.asarray(prog(buf, jnp.int32(s))))  # forced readback sync
        return time.perf_counter() - t0, v

    # warmup / compile
    timed(trivial, 0)
    timed(pK, 0)

    import contextlib

    import jax as _jax

    profile_cm = (
        _jax.profiler.trace(args.profile)
        if args.profile
        else contextlib.nullcontext()
    )

    reps = 5
    with profile_cm:
        t0_overhead = min(timed(trivial, 100 + r)[0] for r in range(reps))
        tK = min(timed(pK, 200 + r)[0] for r in range(reps))
    per_chain = max((tK - t0_overhead) / K, 1e-9)

    pts_per_sec = n_points / per_chain
    result = {
        "metric": "downsample+outlier+tilefilter points/sec/chip (1M-pt cloud)",
        "value": round(pts_per_sec),
        "unit": "points/sec",
        "vs_baseline": round(pts_per_sec / 1e9, 4),
    }

    if not args.skip_exact:
        # The exact-outlier chain (column-grid kNN + brute fixup):
        # semantically parity-faithful, and orders of magnitude slower —
        # exact k-of-C selection is the measured wall on this chip (see
        # cwipc_util_tpu/ops/cols_knn.py and benchmarks/ceiling.py; the
        # round-4 bounds study, benchmarks/bounds_study.py, shows why no
        # cheap-bound hybrid can shortcut it).  Timed with K=2
        # differencing (the per-iteration cost dwarfs relay jitter).
        @jax.jit
        def exact_once(b: PointBuffer, seed: jax.Array):
            eps = seed.astype(jnp.float32) * 1e-12
            bi = PointBuffer(xyz=b.xyz + eps, rgba=b.rgba, count=b.count)
            # pinned at the certified 1<<18 capacity (the configuration the
            # on-chip keep-mask oracle test runs and the compile cache holds;
            # the exact chain's cost is ~95% plane-chunk selection, which the
            # post-downsample capacity does not touch)
            out, resid = downsample_outliers_tilefilter_exact(
                bi, cellsize, k=k, mult=mult, tile=tile,
                out_capacity=1 << 18, gy=504, gz=152, cap=28,
                chunk=int(os.environ.get("CWIPC_EXACT_CHUNK", "256")),
                cell_normal=True,  # concrete 4mm cellsize
            )
            return out.count + resid * 0

        def timed_exact(s):
            t0 = time.perf_counter()
            int(np.asarray(exact_once(buf, jnp.int32(s))))
            return time.perf_counter() - t0

        timed_exact(0)  # compile
        t1 = min(timed_exact(300 + r) for r in range(2))
        exact_pts = n_points / max(t1 - t0_overhead, 1e-9)
        result["exact_chain_value"] = round(exact_pts)
        result["exact_chain_note"] = "exact-outlier chain (cols kNN), pts/sec"

        # Keep-decision agreement of the fast (window-kNN) chain against
        # the exact chain, measured on the bench cloud: run both once and
        # compare output voxel SETS (both chains keep or drop whole
        # voxels of the same downsample, so set difference == decision
        # disagreement).  This puts both axes — speed AND parity — in
        # every round artifact.
        @jax.jit
        def fast_once(b: PointBuffer):
            return downsample_outliers_tilefilter(
                b, cellsize, k=k, mult=mult, tile=tile,
                out_capacity=out_capacity,
            )

        @jax.jit
        def exact_out(b: PointBuffer):
            out, _ = downsample_outliers_tilefilter_exact(
                b, cellsize, k=k, mult=mult, tile=tile,
                out_capacity=1 << 18, gy=504, gz=152, cap=28,
                chunk=int(os.environ.get("CWIPC_EXACT_CHUNK", "256")),
                cell_normal=True,
            )
            return out

        def voxel_set(out) -> set:
            # both chains emit bit-identical centroids for a commonly-kept
            # voxel (same downsample program, bit-exact compaction), so
            # raw f32 bytes are the right set key
            n = int(np.asarray(out.count))
            xyz = np.ascontiguousarray(np.asarray(out.xyz[:n], np.float32))
            return {r.tobytes() for r in xyz}

        from cwipc_util_tpu.ops import voxelize

        @jax.jit
        def down_count(b: PointBuffer):
            return voxelize.downsample_cm(b, cellsize, out_capacity)[4]

        fast_set = voxel_set(fast_once(buf))
        exact_set = voxel_set(exact_out(buf))
        total = int(np.asarray(down_count(buf)))  # decisions made
        sym_diff = len(fast_set ^ exact_set)
        result["fast_keep_agreement_pct"] = round(
            100.0 * (total - sym_diff) / total, 2
        )
        # Name the metric: this is voxel-SET symmetric difference over
        # all downsample decisions, NOT the per-point keep-mask agreement
        # (80.9% at W=16, ops/chain.py docstring) — the two measure the
        # same approximation differently and must not be compared.
        result["fast_keep_agreement_metric"] = "voxel-set-symdiff"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
