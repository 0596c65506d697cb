"""Per-stage chip-side cost probe for the headline chain.

Times individual pipeline stages with bench.py's K-loop differencing
methodology (the relay adds ~33 ms fixed dispatch overhead and memoizes
identical executions, so every measurement runs K in-program iterations
with a loop-dependent perturbation and subtracts a trivial program's time).

Usage: python benchmarks/probe.py [stage ...]
Stages: sort3 sort2 sort1 segreduce knn compact chain
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

K = 16
REPS = 5
CAP = 1 << 20
OCAP = 1 << 18


def timeit(make_body, args_fn, label):
    """make_body(i, seed) -> scalar; K-loop differenced chip time in ms."""

    @jax.jit
    def program(seed, *args):
        def body(i, acc):
            return acc + make_body(i + seed, *args)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    @jax.jit
    def trivial(seed, *args):
        return seed.astype(jnp.float32)

    args = args_fn()

    def run(prog, s):
        t0 = time.perf_counter()
        np.asarray(prog(jnp.int32(s), *args))
        return time.perf_counter() - t0

    run(trivial, 0)
    run(program, 1)
    t0 = min(run(trivial, 100 + r) for r in range(REPS))
    tK = min(run(program, 200 + r) for r in range(REPS))
    ms = (tK - t0) / K * 1e3
    print(f"{label:30s} {ms:8.3f} ms")
    return ms


def _sorted_inputs():
    """Representative sorted (mkey, fracs, rgba) for the 1M cloud."""
    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops.voxelize import _CLAMP, _MORTON_MAX, _SENTINEL, morton3

    buf = _generate(1000, 1000, CAP, jnp.float32(0.5))
    cellsize = jnp.float32(2.0 / 1000 * 2.0)

    @jax.jit
    def prep(xyz, rgba, count):
        idx = jnp.arange(CAP, dtype=jnp.int32)
        valid = idx < count
        inv = 1.0 / cellsize
        v = jnp.floor(xyz * inv).astype(jnp.int32)
        v = jnp.clip(v, -_CLAMP, _CLAMP)
        vmin = jnp.min(jnp.where(valid[:, None], v, _SENTINEL), axis=0)
        vr = v - jnp.where(vmin == _SENTINEL, 0, vmin)[None, :]
        vm = jnp.clip(vr, 0, _MORTON_MAX)
        mkey = morton3(vm[:, 0], vm[:, 1], vm[:, 2])
        mkey = jnp.where(valid, mkey, _SENTINEL)
        frac = xyz * inv - v.astype(jnp.float32)
        q = jnp.clip((frac * 1024.0).astype(jnp.int32), 0, 1023)
        fracs = (q[:, 0] << 20) | (q[:, 1] << 10) | q[:, 2]
        return jax.lax.sort((mkey, fracs, rgba.astype(jnp.int32)), num_keys=1)

    smk, sfr, srgba = prep(buf.xyz, buf.rgba, buf.count)
    return smk, sfr, srgba, buf.count, cellsize


def stage_sort(nops):
    def args_fn():
        rng = np.random.default_rng(0)
        key = jnp.asarray(rng.integers(0, 1 << 30, CAP, dtype=np.int32))
        p1 = jnp.asarray(rng.integers(0, 1 << 30, CAP, dtype=np.int32))
        p2 = jnp.asarray(rng.integers(0, 1 << 30, CAP, dtype=np.int32))
        return key, p1, p2

    def body(seed, key, p1, p2):
        k = key + seed
        ops = (k, p1, p2)[:nops]
        out = jax.lax.sort(ops, num_keys=1)  # always a tuple of arrays
        return sum(o[0].astype(jnp.float32) for o in out)

    return timeit(body, args_fn, f"sort {nops}-op 1M")


def stage_sortc64():
    """2-operand sort where the payload is ONE complex64 (2 x f32-bitcast
    words — x32-mode-safe 8-byte payload): payloads are never compared
    with num_keys=1, so arbitrary bit patterns are fine.  If XLA prices
    sort operands above payload bytes, this beats the 3-op form."""

    def args_fn():
        rng = np.random.default_rng(0)
        key = jnp.asarray(rng.integers(0, 1 << 30, CAP, dtype=np.int32))
        p1 = jnp.asarray(rng.integers(0, 1 << 30, CAP, dtype=np.int32))
        p2 = jnp.asarray(rng.integers(0, 1 << 30, CAP, dtype=np.int32))
        return key, p1, p2

    def body(seed, key, p1, p2):
        pc = jax.lax.complex(
            jax.lax.bitcast_convert_type(p1, jnp.float32),
            jax.lax.bitcast_convert_type(p2, jnp.float32),
        )
        out = jax.lax.sort((key + seed, pc), num_keys=1)
        back = jax.lax.bitcast_convert_type(jnp.real(out[1]), jnp.int32)
        return out[0][0].astype(jnp.float32) + back[0].astype(jnp.float32)

    return timeit(body, args_fn, "sort key+c64payload 1M")


def stage_segreduce():
    from cwipc_util_tpu.ops.pallas_segment_reduce import segment_reduce_sorted

    smk, sfr, srgba, count, _ = _sorted_inputs()

    def body(seed, smk, sfr, srgba, count):
        out16, nseg = segment_reduce_sorted(
            smk + (seed - seed), sfr + seed * 0, srgba, count, out_capacity=OCAP
        )
        # seed-dependence via a harmless value twiddle on a payload channel
        out16 = out16 + seed.astype(jnp.float32) * 0.0
        return out16[6].sum() + nseg.astype(jnp.float32)

    # NOTE: the relay memoizes on (executable, args); twiddle srgba by seed
    def body2(seed, smk, sfr, srgba, count):
        out16, nseg = segment_reduce_sorted(
            smk, sfr, srgba ^ (seed * 0x1000000), count, out_capacity=OCAP
        )
        return out16[6].sum() + nseg.astype(jnp.float32)

    return timeit(body2, lambda: _sorted_inputs()[:4], "segment_reduce 1M")


def stage_knn(window=32):
    from cwipc_util_tpu.ops.pallas_window_knn import window_knn_mean_distance

    def args_fn():
        rng = np.random.default_rng(1)
        xyz = jnp.asarray(rng.random((OCAP, 3), np.float32))
        return (xyz,)

    def body(seed, xyz):
        md = window_knn_mean_distance(
            xyz + seed.astype(jnp.float32) * 1e-12, jnp.int32(OCAP - 7), 30,
            window=window,
        )
        return md.sum()

    return timeit(body, args_fn, f"window_knn 262k k=30 W={window}")


def stage_compact():
    from cwipc_util_tpu.core.buffers import PointBuffer
    from cwipc_util_tpu.ops.compaction import compact

    def args_fn():
        rng = np.random.default_rng(2)
        xyz = jnp.asarray(rng.random((OCAP, 3), np.float32))
        rgba = jnp.asarray(rng.integers(0, 1 << 31, OCAP, dtype=np.int64).astype(np.uint32))
        keepbits = jnp.asarray((rng.random(OCAP) < 0.8))
        return xyz, rgba, keepbits

    def body(seed, xyz, rgba, keep):
        buf = PointBuffer(
            xyz=xyz + seed.astype(jnp.float32) * 1e-12,
            rgba=rgba,
            count=jnp.int32(OCAP - 3),
        )
        out = compact(buf, keep)
        return out.xyz.sum() + out.count.astype(jnp.float32)

    return timeit(body, args_fn, "compact 262k")


def stage_chain():
    from cwipc_util_tpu.core.buffers import PointBuffer
    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops.chain import downsample_outliers_tilefilter

    buf = _generate(1000, 1000, CAP, jnp.float32(0.5))
    cellsize = jnp.float32(2.0 / 1000 * 2.0)

    def args_fn():
        return buf.xyz, buf.rgba, buf.count

    def body(seed, xyz, rgba, count):
        eps = seed.astype(jnp.float32) * 1e-12
        bi = PointBuffer(xyz=xyz + eps, rgba=rgba, count=count)
        out = downsample_outliers_tilefilter(
            bi, cellsize, k=30, mult=jnp.float32(1.0), tile=jnp.uint32(1),
            out_capacity=OCAP,
        )
        return out.count.astype(jnp.float32)

    return timeit(body, args_fn, "full chain 1M")


def stage_chain_strip(level):
    """In-chain strip-down: the chain with later stages removed.
    Levels: ds (downsample only), knn (+window kNN), full."""
    from functools import partial as _partial

    from cwipc_util_tpu.core.buffers import PointBuffer
    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops import compaction, outliers, voxelize
    from cwipc_util_tpu.ops.pallas_window_knn import window_knn_mean_distance_cm

    buf = _generate(1000, 1000, CAP, jnp.float32(0.5))
    cellsize = jnp.float32(2.0 / 1000 * 2.0)

    def args_fn():
        return buf.xyz, buf.rgba, buf.count

    def body(seed, xyz, rgba, count):
        eps = seed.astype(jnp.float32) * 1e-12
        bi = PointBuffer(xyz=xyz + eps, rgba=rgba, count=count)
        x, y, z, prgba, cnt = voxelize.downsample_cm(bi, cellsize, OCAP)
        if level == "ds":
            return x.sum() + prgba.sum().astype(jnp.float32) + cnt.astype(jnp.float32)
        md = jax.lax.platform_dependent(
            x, y, z, cnt,
            cpu=lambda a, b, c, d: a * 0.0,
            default=_partial(window_knn_mean_distance_cm, k=30, window=16),
        )
        if level == "knn":
            return md.sum() + cnt.astype(jnp.float32)
        valid = jnp.arange(OCAP, dtype=jnp.int32) < cnt
        keep = outliers._keep_from_mean_dists(md, valid, jnp.float32(1.0))
        keep = keep & (((prgba >> 24) & 0xFF) == 1)
        out = compaction.compact_cm(x, y, z, prgba, keep, cnt)
        return out.count.astype(jnp.float32)

    return timeit(body, args_fn, f"chain[{level}] 1M")


def stage_chain_pre(transposed=False):
    """Pre-sort elementwise only: quantize, rebase, morton keys, payload
    pack (no sort).  `transposed` computes from xyz.T rows instead of the
    [N,3] layout to expose lane-packing waste."""
    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops.voxelize import _CLAMP, _MORTON_MAX, _SENTINEL, morton3

    buf = _generate(1000, 1000, CAP, jnp.float32(0.5))
    cellsize = jnp.float32(2.0 / 1000 * 2.0)

    def args_fn():
        return buf.xyz, buf.rgba, buf.count

    def body(seed, xyz, rgba, count):
        eps = seed.astype(jnp.float32) * 1e-12
        xyz = xyz + eps
        idx = jnp.arange(CAP, dtype=jnp.int32)
        valid = idx < count
        inv = 1.0 / cellsize
        if transposed:
            xt = xyz.T  # [3, N]
            v = jnp.floor(xt * inv).astype(jnp.int32)
            v = jnp.clip(v, -_CLAMP, _CLAMP)
            vmin = jnp.min(jnp.where(valid[None, :], v, _SENTINEL), axis=1)
            vr = v - jnp.where(vmin == _SENTINEL, 0, vmin)[:, None]
            vm = jnp.clip(vr, 0, _MORTON_MAX)
            mkey = morton3(vm[0], vm[1], vm[2])
            frac = xt * inv - v.astype(jnp.float32)
            q = jnp.clip((frac * 1024.0).astype(jnp.int32), 0, 1023)
            fracs = (q[0] << 20) | (q[1] << 10) | q[2]
        else:
            v = jnp.floor(xyz * inv).astype(jnp.int32)
            v = jnp.clip(v, -_CLAMP, _CLAMP)
            vmin = jnp.min(jnp.where(valid[:, None], v, _SENTINEL), axis=0)
            vr = v - jnp.where(vmin == _SENTINEL, 0, vmin)[None, :]
            vm = jnp.clip(vr, 0, _MORTON_MAX)
            mkey = morton3(vm[:, 0], vm[:, 1], vm[:, 2])
            frac = xyz * inv - v.astype(jnp.float32)
            q = jnp.clip((frac * 1024.0).astype(jnp.int32), 0, 1023)
            fracs = (q[:, 0] << 20) | (q[:, 1] << 10) | q[:, 2]
        mkey = jnp.where(valid, mkey, _SENTINEL)
        return mkey.sum().astype(jnp.float32) + fracs.sum().astype(jnp.float32)

    label = "chain_pre.T" if transposed else "chain_pre"
    return timeit(body, args_fn, f"{label} 1M")


STAGES = {
    "sort3": lambda: stage_sort(3),
    "sort2": lambda: stage_sort(2),
    "sort1": lambda: stage_sort(1),
    "sortc64": stage_sortc64,
    "segreduce": stage_segreduce,
    "knn": stage_knn,
    "knn16": lambda: stage_knn(16),
    "compact": stage_compact,
    "chain": stage_chain,
    "chain_ds": lambda: stage_chain_strip("ds"),
    "chain_pre": lambda: stage_chain_pre(False),
    "chain_preT": lambda: stage_chain_pre(True),
    "chain_knn": lambda: stage_chain_strip("knn"),
}



def stage_colsort(rows, n):
    """Columnar (axis-0) sort of [rows, n]: the candidate-selection
    primitive for the exact column-grid kNN design (each lane sorts its
    own short column; XLA emits a vectorized sorting network)."""

    def args_fn():
        rng = np.random.default_rng(3)
        d = jnp.asarray(rng.random((rows, n), np.float32))
        return (d,)

    def body(seed, d):
        s = jnp.sort(d + seed.astype(jnp.float32) * 1e-12, axis=0)
        return s[:30].sum()

    return timeit(body, args_fn, f"colsort [{rows},{n//1000}k]")


def stage_colsort_topk(rows, n, k=30):
    """Columnar selection via 31-step count-bisection on packed keys
    (the window kernel's method) expressed in XLA, for comparison."""

    def args_fn():
        rng = np.random.default_rng(3)
        d = jnp.asarray(rng.random((rows, n), np.float32))
        return (d,)

    def body(seed, d):
        d = d + seed.astype(jnp.float32) * 1e-12
        row_iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        key = (jax.lax.bitcast_convert_type(d, jnp.int32) & ~511) | row_iota
        lo = jnp.zeros((n,), jnp.int32)
        hi = jnp.full((n,), jnp.iinfo(jnp.int32).max, jnp.int32)
        for _ in range(31):
            mid = lo + ((hi - lo) >> 1)
            cnt = jnp.sum((key <= mid[None, :]).astype(jnp.int32), axis=0)
            ge = cnt >= k
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        sel = key <= hi[None, :]
        return jnp.where(sel, d, 0.0).sum()

    return timeit(body, args_fn, f"colbisect [{rows},{n//1000}k] k={k}")


def stage_sortfill(n_real, n_slots):
    """Slot-grid fill: sort (real points + slot fillers) by slot address."""

    def args_fn():
        rng = np.random.default_rng(4)
        addr = np.sort(rng.choice(n_slots, n_real, replace=False)).astype(np.int32)
        keys = jnp.concatenate([jnp.asarray(addr), jnp.arange(n_slots, dtype=jnp.int32)])
        pay = jnp.asarray(rng.integers(0, 1 << 30, n_real + n_slots, dtype=np.int32))
        return keys, pay

    def body(seed, keys, pay):
        p2 = jax.lax.complex(
            jax.lax.bitcast_convert_type(pay + seed, jnp.float32),
            jax.lax.bitcast_convert_type(pay, jnp.float32),
        )
        sk, sp = jax.lax.sort((keys, p2), num_keys=1)
        return sk[:n_slots].sum().astype(jnp.float32) + jnp.real(sp)[0]

    return timeit(body, args_fn, f"sortfill {n_real//1000}k+{n_slots//1000}k")


def stage_rolls(n, nrolls):
    """Shifted-distance pass: nrolls static rolls of 3 channel rows."""

    def args_fn():
        rng = np.random.default_rng(5)
        return (jnp.asarray(rng.random((3, n), np.float32)),)

    def body(seed, xyz):
        xyz = xyz + seed.astype(jnp.float32) * 1e-12
        acc = jnp.zeros((n,), jnp.float32)
        for i in range(nrolls):
            r = jnp.roll(xyz, i + 1, axis=1)
            d = xyz - r
            acc = acc + (d * d).sum(axis=0)
        return acc.sum()

    return timeit(body, args_fn, f"rolls x{nrolls} [{n//1000}k]")


STAGES.update({
    "colsort343": lambda: stage_colsort(343, 465_000),
    "colsort343s": lambda: stage_colsort(343, 232_000),
    "colsort64": lambda: stage_colsort(64, 262_144),
    "colbisect343": lambda: stage_colsort_topk(343, 465_000),
    "sortfill": lambda: stage_sortfill(218_000, 465_000),
    "rolls343": lambda: stage_rolls(465_000, 343),
    "rolls49": lambda: stage_rolls(465_000, 49),
})




def stage_topk(rows, n, k=30):
    """lax.top_k over the last axis [n, rows] (per-query candidates)."""

    def args_fn():
        rng = np.random.default_rng(6)
        return (jnp.asarray(rng.random((n, rows), np.float32)),)

    def body(seed, d):
        top, _ = jax.lax.top_k(-(d + seed.astype(jnp.float32) * 1e-12), k)
        return top.sum()

    return timeit(body, args_fn, f"top_k [{n//1000}k,{rows}] k={k}")


def stage_rowsort(rows, n):
    """jnp.sort along the last axis [n, rows]."""

    def args_fn():
        rng = np.random.default_rng(6)
        return (jnp.asarray(rng.random((n, rows), np.float32)),)

    def body(seed, d):
        s = jnp.sort(d + seed.astype(jnp.float32) * 1e-12, axis=-1)
        return s[:, :30].sum()

    return timeit(body, args_fn, f"rowsort [{n//1000}k,{rows}]")


def stage_approx_topk(rows, n, k=30):
    def args_fn():
        rng = np.random.default_rng(6)
        return (jnp.asarray(rng.random((n, rows), np.float32)),)

    def body(seed, d):
        top, _ = jax.lax.approx_min_k(
            d + seed.astype(jnp.float32) * 1e-12, k,
            recall_target=0.999, aggregate_to_topk=True,
        )
        return top.sum()

    return timeit(body, args_fn, f"approx_min_k [{n//1000}k,{rows}] k={k}")


STAGES.update({
    "topk343": lambda: stage_topk(343, 465_000),
    "rowsort343": lambda: stage_rowsort(343, 465_000),
    "approx343": lambda: stage_approx_topk(343, 465_000),
    "topk64": lambda: stage_topk(64, 262_144),
})




def stage_sort_narrow(dtype_name, with_payload):
    """Narrow-key sorts: does XLA's TPU sort price key width, or only
    operand count?  (Decides whether a 2-pass 15-bit LSD radix could beat
    the single 30-bit-key sort.)"""
    import numpy as _np

    dt = {"i16": _np.int16, "i32": _np.int32}[dtype_name]

    def args_fn():
        rng = np.random.default_rng(0)
        key = jnp.asarray(rng.integers(0, 32000, CAP, dtype=dt))
        p1 = jnp.asarray(rng.integers(0, 1 << 30, CAP, dtype=np.int32))
        p2 = jnp.asarray(rng.integers(0, 1 << 30, CAP, dtype=np.int32))
        return key, p1, p2

    def body(seed, key, p1, p2):
        k = key + seed.astype(key.dtype)
        if with_payload:
            pc = jax.lax.complex(
                jax.lax.bitcast_convert_type(p1, jnp.float32),
                jax.lax.bitcast_convert_type(p2, jnp.float32),
            )
            out = jax.lax.sort((k, pc), num_keys=1, is_stable=True)
            back = jax.lax.bitcast_convert_type(jnp.real(out[1]), jnp.int32)
            return out[0][0].astype(jnp.float32) + back[0].astype(jnp.float32)
        out = jax.lax.sort((k,), num_keys=1, is_stable=True)
        return out[0][0].astype(jnp.float32)

    tag = "stable+c64" if with_payload else "stable keys-only"
    return timeit(body, args_fn, f"sort {dtype_name} {tag} 1M")


STAGES.update({
    "sort16": lambda: stage_sort_narrow("i16", False),
    "sort16p": lambda: stage_sort_narrow("i16", True),
    "sort32s": lambda: stage_sort_narrow("i32", False),
    "sort32sp": lambda: stage_sort_narrow("i32", True),
})


if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        STAGES[name]()
