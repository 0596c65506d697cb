"""Pallas TPU kernel: fused Morton-window kNN mean distance.

The window-kNN outlier stage (ops/outliers.py `window` method) in XLA
materializes a [2W, CAP] distance matrix in HBM and sorts it.  This kernel
fuses the whole stage block-wise in VMEM:

* the cloud is split into two halves that ride in sublane rows 0-2 and 4-6
  of one [8, lanes] f32 tile, so every VPU op processes TWO point blocks —
  an f32 tile has 8 sublanes and xyz only needs 3, so the unpacked form
  wasted 5/8 of each distance op.  The halves' halos carry the REAL seam
  neighbors (the other half's edge points), so results are identical to
  the unsplit order;
* each grid step DMAs one row block plus a 128-lane-aligned halo from HBM,
* the 2W shifted squared distances live as register/VMEM values,
* the k smallest are selected on packed (distance | lane) keys — either by
  dropping the (2W-k) largest (k close to 2W) or by count-bisection,
* one [2, BLOCK] result row pair is written back.

HBM traffic is one read of xyz plus one write of md — the minimum possible
— versus read+write of the [2W, CAP] matrix (~2W/3 x more) for the XLA
version.  Grid steps run sequentially on the TPU core, so no cross-block
synchronization is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_MAX = jnp.finfo(jnp.float32).max

BLOCK = 2048
HALO = 64  # half of the 128-lane alignment unit, >= max supported window


def _wk_out_map(i, c):
    # named, module-level index map: fresh lambdas per call defeat the
    # jit/persistent-compile caches (jax_explain_cache_misses, round 4)
    return (0, i)


def _window_knn_kernel(count_ref, xyz_hbm, md_ref, xyz_vmem, sem,
                       *, window: int, k: int, half: int):
    # xyz_hbm is [8, HALO + half + HALO]: rows 0-2 hold the first half of
    # the cloud, rows 4-6 the second half, each flanked by the true
    # neighboring points across the half boundary (zeros at the cloud
    # ends).  Rows 3 and 7 are zero.  The slice
    # [block_start, block_start + BLOCK + 2*HALO) is always in bounds,
    # 128-aligned, and the block's point 0 sits at lane HALO.
    i = pl.program_id(0)
    count = count_ref[0]
    block_start = i * BLOCK

    dma = pltpu.make_async_copy(
        xyz_hbm.at[:, pl.ds(block_start, BLOCK + 2 * HALO)],
        xyz_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    base = xyz_vmem[:, pl.ds(HALO, BLOCK)]  # [8, B]: two halves stacked
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    ids_a = block_start + iota  # global ids, first half
    ids_b = half + block_start + iota  # global ids, second half

    # 2W shifted squared distances for BOTH halves per VPU pass.
    d2a_list, d2b_list = [], []
    for w in range(-window, window + 1):
        if w == 0:
            continue
        nb = xyz_vmem[:, pl.ds(HALO + w, BLOCK)]
        diff = base - nb
        dd = diff * diff  # [8, B]
        d2a = dd[0:1] + dd[1:2] + dd[2:3]  # [1, B]
        d2b = dd[4:5] + dd[5:6] + dd[6:7]
        ok_a = (ids_a + w >= 0) & (ids_a + w < count)
        ok_b = (ids_b + w >= 0) & (ids_b + w < count)
        d2a_list.append(jnp.where(ok_a, d2a, _F32_MAX))
        d2b_list.append(jnp.where(ok_b, d2b, _F32_MAX))
    # candidates for 2*BLOCK points: halves side by side in the lanes
    d2 = jnp.concatenate(
        [jnp.concatenate(d2a_list, axis=0), jnp.concatenate(d2b_list, axis=0)],
        axis=1,
    )  # [2W, 2B]

    # Exact k-smallest selection on packed keys.  The row index is packed
    # into the 6 low mantissa bits of the squared distance (bitcast of a
    # non-negative f32 is order-preserving), which makes every column's
    # keys UNIQUE, so both selection strategies below pick exactly k.
    # Truncating 6 mantissa bits perturbs d2 by <= 2^-17 relative (~4e-6 on
    # the distance), far below the outlier statistics' sensitivity.
    row_iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    key = (jax.lax.bitcast_convert_type(d2, jnp.int32) & ~63) | row_iota
    drop = d2.shape[0] - k
    if drop <= 6:
        # k close to the candidate count (e.g. the production chain's
        # k=30 of 32): sum-everything-minus-the-(2W-k)-largest.  Each
        # extraction is one max-reduce + one masked update — measured far
        # cheaper than the 31-step count-bisection when drop is small.
        # Invalid candidates carry F32_MAX keys, so they are dropped first
        # (identical semantics to k-smallest selection with 0-contribution
        # for missing neighbors).
        sel = jnp.ones(key.shape, jnp.bool_)
        kk = key
        for _ in range(drop):
            m = jnp.max(kk, axis=0)
            hit = kk == m[None, :]
            sel = sel & ~hit
            kk = jnp.where(hit, jnp.iinfo(jnp.int32).min, kk)
    else:
        # general k: count-bisection for the k-th smallest key
        lo = jnp.zeros((2 * BLOCK,), jnp.int32)
        hi = jnp.full((2 * BLOCK,), jnp.iinfo(jnp.int32).max, jnp.int32)
        for _ in range(31):
            mid = lo + ((hi - lo) >> 1)
            cnt = jnp.sum((key <= mid[None, :]).astype(jnp.int32), axis=0)
            ge = cnt >= k
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        sel = key <= hi[None, :]
    d2t = jax.lax.bitcast_convert_type(key & ~63, jnp.float32)
    contrib = jnp.where(
        sel & (d2t < _F32_MAX / 2), jnp.sqrt(jnp.maximum(d2t, 0.0)), 0.0
    )
    total = jnp.sum(contrib, axis=0, keepdims=True)  # [1, 2B]

    md = total / float(k)
    md_a = jnp.where(ids_a < count, md[:, :BLOCK], 0.0)
    md_b = jnp.where(ids_b < count, md[:, BLOCK:], 0.0)
    md_ref[:, :] = jnp.concatenate([md_a, md_b], axis=0)


@partial(jax.jit, static_argnames=("k", "window"))
def window_knn_mean_distance(
    xyz: jax.Array, count: jax.Array, k: int, window: int = 32
) -> jax.Array:
    """Per-point mean distance to the k nearest among the +/-window Morton
    neighbors, as one fused Pallas kernel.  Drop-in for the XLA
    `_mean_knn_dist_window` (same semantics, same approximation)."""
    return window_knn_mean_distance_cm(
        xyz[:, 0], xyz[:, 1], xyz[:, 2], count, k, window
    )


@partial(jax.jit, static_argnames=("k", "window"))
def window_knn_mean_distance_cm(
    x: jax.Array, y: jax.Array, z: jax.Array, count: jax.Array, k: int,
    window: int = 32,
) -> jax.Array:
    """Channel-major entry: coordinate ROWS instead of an [N,3] matrix.
    The fused chain keeps the whole post-sort pipeline channel-major (the
    segment reduce produces rows) — the row-major entry's xyz.T was a
    262k-point relayout the chain paid twice."""
    cap = x.shape[0]
    assert window <= HALO, f"window {window} exceeds the kernel halo {HALO}"
    # The packed-key selection reserves 6 low mantissa bits for the
    # candidate-row index (`key & ~63 | row_iota`), so at most 2*window=64
    # candidate rows can carry unique ids; beyond that, row ids would
    # overflow into live mantissa bits and break both key uniqueness and
    # the divide-by-k statistics.
    assert 2 * window <= 64, (
        f"window {window} > 32 would overflow the 6-bit row-id packing"
    )
    # Small clouds: pad the point axis to two grid blocks (padding lanes sit
    # beyond `count`, so the kernel masks them out of every distance).
    pad = (-cap) % (2 * BLOCK)
    if pad:
        zpad = jnp.zeros((pad,), x.dtype)
        x = jnp.concatenate([x, zpad])
        y = jnp.concatenate([y, zpad])
        z = jnp.concatenate([z, zpad])
    # interpret-vs-compiled is chosen per LOWERING platform so a TPU-hosted
    # process running CPU-mesh computations gets the right kernel for each.
    md = jax.lax.platform_dependent(
        x,
        y,
        z,
        count,
        cpu=partial(_window_knn_call, k=k, window=window, interpret=True),
        default=partial(_window_knn_call, k=k, window=window, interpret=False),
    )
    return md[:cap]


def _window_knn_call(x, y, z, count, *, k: int, window: int, interpret: bool):
    cap = x.shape[0]
    half = cap // 2
    grid = half // BLOCK
    xyz_t = jnp.stack([x, y, z])  # [3, cap]: three row copies, no transpose
    zero3 = jnp.zeros((3, HALO), jnp.float32)
    zero1 = jnp.zeros((1, HALO + half + HALO), jnp.float32)
    # first half with the second half's first HALO points as right halo;
    # second half with the first half's last HALO points as left halo
    row_a = jnp.concatenate([zero3, xyz_t[:, :half], xyz_t[:, half : half + HALO]], axis=1)
    row_b = jnp.concatenate([xyz_t[:, half - HALO : half], xyz_t[:, half:], zero3], axis=1)
    packed = jnp.concatenate([row_a, zero1, row_b, zero1], axis=0)  # [8, H+half+H]
    kernel = partial(_window_knn_kernel, window=window, k=min(k, 2 * window), half=half)
    md = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((2, BLOCK), _wk_out_map, memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((8, BLOCK + 2 * HALO), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((2, half), jnp.float32),
    )(jnp.asarray(count, jnp.int32).reshape(1), packed)
    return jnp.concatenate([md[0], md[1]])
