"""On-chip probe: exact column-grid selection, Pallas kernel vs XLA.

Builds the REAL bench-cloud planes (1M synthetic -> 4mm downsample ->
_cols_build at the bench grid 504x152 cap=28) so occupancy statistics —
which the Pallas kernel's per-tile occ_q bound exploits — match the
headline bench.  Times each selection with K-loop differencing
(tpu-bench-env: ~33 ms fixed relay dispatch, memoized identical runs).

Usage: python benchmarks/probe_colsel.py [pallas] [xla]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# Persistent cache via the package import (machine-wide default dir);
# an env setdefault here is dead — jax is preloaded at interpreter
# startup in this image (NOTES_ROUND5.md).
import cwipc_util_tpu  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

GY, GZ, CAP, K_NN, CHUNK = 504, 152, 28, 30, 256


def build_planes():
    from cwipc_util_tpu.core.buffers import PointBuffer
    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops import voxelize
    from cwipc_util_tpu.ops.cols_knn import _cols_build

    capacity = 1 << 20
    out_capacity = 1 << 18
    hsteps = asteps = 1000
    cellsize = jnp.float32(2.0 / hsteps * 2.0)
    buf = _generate(hsteps, asteps, capacity, jnp.float32(0.5))

    @jax.jit
    def prep(b: PointBuffer):
        x, y, z, rgba, cnt = voxelize.downsample_cm(b, cellsize, out_capacity)
        xyz = jnp.stack([x, y, z], axis=1)
        return _cols_build(
            xyz, cnt, cellsize, gy=GY, gz=GZ, cap=CAP, chunk=CHUNK
        )

    xs_g, ys_g, zs_g, slot_orig, valid, drop_ring, _point_slot = prep(buf)
    occ = np.asarray(jnp.sum((xs_g[:, :CAP] < 1e30).astype(jnp.int32)))
    print(f"planes built: occupied slots {occ} of {GY*GZ*CAP}")
    return xs_g, ys_g, zs_g


def diff_time(fn, args, label, k_loop, reps=3):
    @jax.jit
    def program(seed, *a):
        def body(i, acc):
            eps = (seed + i).astype(jnp.float32) * 1e-12
            s, kth = fn(a[0] + eps, a[1], a[2])
            return acc + s.ravel()[0] + kth.ravel()[1]

        return jax.lax.fori_loop(0, k_loop, body, jnp.float32(0))

    @jax.jit
    def trivial(seed, *a):
        return seed.astype(jnp.float32)

    def run(prog, s):
        t0 = time.perf_counter()
        np.asarray(prog(jnp.int32(s), *args))
        return time.perf_counter() - t0

    run(trivial, 0)
    t_compile = time.perf_counter()
    run(program, 1)
    print(f"{label}: compile+first {time.perf_counter()-t_compile:.1f}s")
    t0 = min(run(trivial, 100 + r) for r in range(reps))
    tK = min(run(program, 200 + r) for r in range(reps))
    ms = (tK - t0) / k_loop * 1e3
    print(f"{label:24s} {ms:9.3f} ms  (K={k_loop})")
    return ms


def stage_residual():
    """Time the exact chain's non-selection stages on the bench cloud:
    full cols_knn (build+select+finish), the brute fixup on the real
    uncovered mask, and the compaction tail — to locate the residual
    (chain total minus selection) measured by bench.py --exact."""
    from cwipc_util_tpu.core.buffers import PointBuffer
    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops import voxelize
    from cwipc_util_tpu.ops.cols_knn import (
        bruteforce_md_subset,
        cols_knn_mean_distance,
    )

    capacity = 1 << 20
    out_capacity = 1 << 18
    cell = jnp.float32(2.0 / 1000 * 2.0)
    buf = _generate(1000, 1000, capacity, jnp.float32(0.5))

    @jax.jit
    def down(b: PointBuffer):
        x, y, z, rgba, cnt = voxelize.downsample_cm(b, cell, out_capacity)
        return jnp.stack([x, y, z], axis=1), cnt

    xyz, cnt = down(buf)
    xyz, cnt = jax.device_get((xyz, cnt))
    xyz, cnt = jnp.asarray(xyz), jnp.asarray(cnt)

    @jax.jit
    def knn_full(xyz, cnt, seed):
        md, unc = cols_knn_mean_distance(
            xyz + seed.astype(jnp.float32) * 1e-12, cnt, cell, K_NN,
            gy=GY, gz=GZ, cap=CAP, chunk=CHUNK, voxel_unique=True,
        )
        return md, unc

    t0 = time.perf_counter()
    md, unc = knn_full(xyz, cnt, jnp.int32(0))
    n_unc = int(np.asarray(unc).sum())
    print(f"cols_knn full: compile+first {time.perf_counter()-t0:.1f}s; "
          f"uncovered {n_unc} of {int(cnt)}")

    def t_of(fn, args, label, k_loop=4, reps=3):
        @jax.jit
        def program(seed, *a):
            def body(i, acc):
                r = fn(*a, seed + i)
                return acc + jnp.sum(jnp.asarray(r[0]).ravel()[:1])

            return jax.lax.fori_loop(0, k_loop, body, jnp.float32(0))

        @jax.jit
        def trivial(seed, *a):
            return seed.astype(jnp.float32)

        def run(prog, s):
            t0 = time.perf_counter()
            np.asarray(prog(jnp.int32(s), *args))
            return time.perf_counter() - t0

        run(trivial, 0)
        run(program, 1)
        t0 = min(run(trivial, 100 + r) for r in range(reps))
        tK = min(run(program, 200 + r) for r in range(reps))
        print(f"{label:28s} {(tK - t0) / k_loop * 1e3:9.3f} ms")

    def knn_body(xyz, cnt, seed):
        md, unc = cols_knn_mean_distance(
            xyz + seed.astype(jnp.float32) * 1e-12, cnt, cell, K_NN,
            gy=GY, gz=GZ, cap=CAP, chunk=CHUNK, voxel_unique=True,
        )
        return (md,)

    t_of(knn_body, (xyz, cnt), "cols_knn full (b+sel+fin)")

    unc_j = jnp.asarray(np.asarray(unc))

    def fix_body(xyz, cnt, unc, seed):
        return (bruteforce_md_subset(
            xyz + seed.astype(jnp.float32) * 1e-12, cnt, unc, K_NN
        ),)

    t_of(fix_body, (xyz, cnt, unc_j), "brute fixup (real mask)")


def occupancy_stats(planes):
    """Host-side tier/occupancy statistics for the bench planes."""
    from cwipc_util_tpu.ops.pallas_cols_select import (
        SLOT_TIERS, TILE, slab_occupancy,
    )

    xs_g = planes[0]
    gyz = GY * GZ
    ntiles = -(-gyz // TILE)
    capp = -(-CAP // 8) * 8
    tier_list = sorted({min(t, capp) for t in (*SLOT_TIERS, capp)})
    occs = [slab_occupancy(xs_g, gz=GZ, cap=CAP, tile=t) for t in range(ntiles)]
    hist = {tc: 0 for tc in tier_list}
    for m in occs:
        hist[next(tc for tc in tier_list if m <= tc)] += 1
    print(f"tiles={ntiles} occ_b mean={np.mean(occs):.1f} "
          f"p50={np.percentile(occs, 50):.0f} max={max(occs)} tiers={hist}")
    # per-tile query-side max (the slot loop bound)
    off = 4 * GZ + 4
    occ_cols = (np.asarray(xs_g)[off:off + gyz, :CAP] < 1e30).sum(axis=1)
    occ_q = [occ_cols[t * TILE:(t + 1) * TILE].max() for t in range(ntiles)]
    print(f"occ_q (slot-loop bound) mean={np.mean(occ_q):.1f} "
          f"p50={np.percentile(occ_q, 50):.0f}; col-occ mean "
          f"{occ_cols[occ_cols > 0].mean():.2f} (occupied cols)")


def main():
    which = sys.argv[1:] or ["pallas", "xla"]
    if "residual" in which:
        stage_residual()
        which = [w for w in which if w != "residual"]
        if not which:
            return
    planes = build_planes()

    if "stats" in which:
        occupancy_stats(planes)
        which = [w for w in which if w != "stats"]

    strips = [w for w in which if w.startswith("strip")]
    if strips:
        # strip-down levels of the kernel body (cumulative cost method):
        # full > nofinal > bisectN > build.  strip[:LEVELS] to subset.
        from cwipc_util_tpu.ops.pallas_cols_select import cols_select_pallas

        arg = strips[0][len("strip"):].lstrip(":")
        levels = arg.split(",") if arg else [
            "full", "nofinal", "bisect16", "bisect8", "bisect1", "build",
        ]
        for lv in levels:
            def pal(xs, ys, zs, lv=lv):
                if lv == "seeded":  # the bench configuration (cell_normal)
                    return cols_select_pallas(
                        xs, ys, zs, k=K_NN, gy=GY, gz=GZ, cap=CAP,
                        cell=jnp.float32(2.0 / 1000 * 2.0), seeded=True,
                    )
                return cols_select_pallas(
                    xs, ys, zs, k=K_NN, gy=GY, gz=GZ, cap=CAP, probe=lv
                )

            diff_time(pal, planes, f"strip:{lv}", k_loop=8)
        which = [w for w in which if not w.startswith("strip")]

    if "pallas" in which:
        from cwipc_util_tpu.ops.pallas_cols_select import cols_select_pallas

        def pal(xs, ys, zs):
            return cols_select_pallas(xs, ys, zs, k=K_NN, gy=GY, gz=GZ, cap=CAP)

        diff_time(pal, planes, "cols_select pallas", k_loop=8)

    if "xla" in which:
        from cwipc_util_tpu.ops.cols_knn import _cols_select

        nchunks = -(-GY * GZ // CHUNK)
        c0s = jnp.arange(nchunks, dtype=jnp.int32) * CHUNK

        def xla(xs, ys, zs):
            return _cols_select(
                xs, ys, zs, c0s, k=K_NN, gy=GY, gz=GZ, cap=CAP, chunk=CHUNK,
                voxel_unique=True,
            )

        diff_time(xla, planes, "cols_select xla", k_loop=2, reps=2)


if __name__ == "__main__":
    main()
