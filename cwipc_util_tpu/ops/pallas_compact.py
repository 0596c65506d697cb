"""Pallas TPU kernel: order-preserving stream compaction.

Replaces the sort-based `compact` on TPU (a 1-key/4-payload lax.sort,
0.40 ms at 262k) with the same MXU ring machinery as the segmented reduce
(ops/pallas_segment_reduce.py):

* per block: keep-flag prefix via per-quarter [1,Q]@[Q,Q] triangular
  matmuls (quarter bases chained through scalars AFTER all matmuls),
* each KEPT lane is placed into its destination column through a
  membership one-hot matmul; dropped lanes have all-zero membership,
* payload channels are 16-bit integer halves (xyz bitcast to int32 and
  split, rgba split) so TWO bf16 splits reproduce every value exactly and
  each destination column receives exactly one point's values,
* completed 128-column chunks flush from the VMEM ring to HBM.

Output is [8, out_cap] f32 rows (x_lo, x_hi, y_lo, y_hi, z_lo, z_hi,
rgba_lo, rgba_hi); the wrapper recombines them into xyz f32 / rgba u32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._mxu_ring import fill_tri, make_flush_chunk, quarter_prefixes, split_dot, zero_flushed

B = 1024
STAGE_CHUNKS = 10
QUARTER = 256
Q_W = QUARTER + 128
STAGE_W = STAGE_CHUNKS * 128
NCH = 8

# bf16 splits for the placement matmuls: all channel values are 16-bit
# integer halves, so two splits are exact.
_SPLITS = 2


def _pc_out_map(i, c):
    # named, module-level index map: fresh lambdas per call defeat the
    # jit/persistent-compile caches (jax_explain_cache_misses, round 4)
    return (i,)


def _split_dot(ch_q, member_q):
    return split_dot(ch_q, member_q, _SPLITS)


def _kernel(count_ref, xi_ref, yi_ref, zi_ref, rgba_ref, keep_ref,
            out_ref, nkept_ref, stage, tri, carry, sem, *, grid: int):
    # carry (SMEM, i32[2]): [0] kept points so far (next free column),
    #                       [1] chunks flushed so far
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        stage[:, :] = jnp.zeros((NCH, STAGE_W), jnp.float32)
        fill_tri(tri, QUARTER)
        carry[0] = 0
        carry[1] = 0

    xi = xi_ref[:].reshape(1, B)
    yi = yi_ref[:].reshape(1, B)
    zi = zi_ref[:].reshape(1, B)
    rgba = rgba_ref[:].reshape(1, B)
    keep = keep_ref[:].reshape(1, B) != 0
    kf = jnp.where(keep, 1.0, 0.0)

    def halves(v):
        return (
            (v & 0xFFFF).astype(jnp.float32),
            ((v >> 16) & 0xFFFF).astype(jnp.float32),
        )

    x_lo, x_hi = halves(xi)
    y_lo, y_hi = halves(yi)
    z_lo, z_hi = halves(zi)
    r_lo, r_hi = halves(rgba)
    ch = jnp.concatenate(
        [x_lo, x_hi, y_lo, y_hi, z_lo, z_hi, r_lo, r_hi], axis=0
    )  # [8, B]

    wp = carry[0]  # next free output column (absolute)
    nq = B // QUARTER
    pres, tbs, n_kept = quarter_prefixes(kf, tri, QUARTER)

    col_iota_q = jax.lax.broadcasted_iota(jnp.int32, (QUARTER, Q_W), 1)
    for q in range(nq):
        ch_q = ch[:, q * QUARTER : (q + 1) * QUARTER]
        keep_q = keep[:, q * QUARTER : (q + 1) * QUARTER]
        # kept lane l lands at absolute column wp + tbs[q] + pre_q[l] - 1;
        # dropped lanes get no membership at all
        tgt = jnp.where(keep_q, pres[q] - 1, -1)
        member_q = (col_iota_q == tgt.reshape(QUARTER, 1)).astype(jnp.bfloat16)
        placed = _split_dot(ch_q, member_q)  # [NCH, Q_W]
        padded = jnp.concatenate(
            [placed, jnp.zeros((NCH, STAGE_W - Q_W), jnp.float32)], axis=1
        )
        offset_q = (wp + tbs[q]) % STAGE_W
        stage[:, :] = stage[:, :] + pltpu.roll(padded, offset_q, 1)

    wp_new = wp + n_kept
    closed_chunks = wp_new // 128
    base_chunk = carry[1]
    nflush = closed_chunks - base_chunk
    _flush_chunk, max_chunks = make_flush_chunk(out_ref, stage, sem, STAGE_CHUNKS)

    # a block closes at most B/128 = 8 chunks, and at typical keep rates
    # most of them: ONE branch with 8 clamped idempotent flushes
    @pl.when((nflush > 0) & (base_chunk < max_chunks))
    def _flush_common():
        last = jnp.minimum(base_chunk + nflush - 1, max_chunks - 1)
        for f in range(B // 128):
            _flush_chunk(jnp.minimum(base_chunk + f, last))

    zero_flushed(stage, base_chunk, nflush, STAGE_CHUNKS)

    carry[0] = wp_new
    carry[1] = base_chunk + nflush

    is_last_block = i == grid - 1

    @pl.when(is_last_block & (base_chunk + nflush < max_chunks))
    def _finalize_flush():
        # the final partial chunk: columns closed_chunks*128 .. wp_new
        _flush_chunk(base_chunk + nflush)

    @pl.when(is_last_block)
    def _finalize_count():
        nkept_ref[0] = wp_new


@partial(jax.jit, static_argnames=())
def compact_pallas_cm(x, y, z, rgba, keep, count):
    """Channel-major compaction: coordinate rows in, rows out.

    Returns (x', y', z', rgba' (uint32), kept_count).  Capacity is
    preserved; slots past the kept count are zero.
    """
    cap = x.shape[0]
    pad = (-cap) % B
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    yi = jax.lax.bitcast_convert_type(y, jnp.int32)
    zi = jax.lax.bitcast_convert_type(z, jnp.int32)
    rgbai = rgba.astype(jnp.int32)
    keepi = keep.astype(jnp.int32)
    if pad:
        zp = jnp.zeros((pad,), jnp.int32)
        xi, yi, zi, rgbai, keepi = (
            jnp.concatenate([a, zp]) for a in (xi, yi, zi, rgbai, keepi)
        )
    out, nkept = jax.lax.platform_dependent(
        xi, yi, zi, rgbai, keepi, count,
        cpu=partial(_compact_call, out_capacity=cap, interpret=True),
        default=partial(_compact_call, out_capacity=cap, interpret=False),
    )
    def recomb(lo, hi):
        return (hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32)

    out = out[:, :cap]
    cx = jax.lax.bitcast_convert_type(recomb(out[0], out[1]), jnp.float32)
    cy = jax.lax.bitcast_convert_type(recomb(out[2], out[3]), jnp.float32)
    cz = jax.lax.bitcast_convert_type(recomb(out[4], out[5]), jnp.float32)
    new_rgba = recomb(out[6], out[7]).astype(jnp.uint32)
    return cx, cy, cz, new_rgba, nkept


@partial(jax.jit, static_argnames=())
def compact_pallas(xyz, rgba, keep, count):
    """Order-preserving compaction of kept points (TPU MXU-ring kernel).

    Returns (xyz', rgba' (uint32), kept_count).  Capacity is preserved;
    slots past the kept count are zero.
    """
    cx, cy, cz, new_rgba, nkept = compact_pallas_cm(
        xyz[:, 0], xyz[:, 1], xyz[:, 2], rgba, keep, count
    )
    return jnp.stack([cx, cy, cz], axis=-1), new_rgba, nkept


def _compact_call(xi, yi, zi, rgbai, keepi, count, *, out_capacity: int,
                  interpret: bool):
    cap = xi.shape[0]
    assert cap % B == 0
    grid = cap // B
    out_cap = -(-out_capacity // 128) * 128 + 256
    kernel = partial(_kernel, grid=grid)
    out, nkept = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((B,), _pc_out_map, memory_space=pltpu.VMEM)
                for _ in range(5)
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((NCH, STAGE_W), jnp.float32),
                pltpu.VMEM((QUARTER, QUARTER), jnp.bfloat16),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NCH, out_cap), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(count, jnp.int32).reshape(1), xi, yi, zi, rgbai, keepi)
    return out, nkept[0]
