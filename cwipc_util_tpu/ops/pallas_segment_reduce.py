"""Pallas TPU kernel: segmented reduction over sorted voxel runs.

Replaces the XLA post-sort pipeline of the voxel downsample (boundary
detection + global cumsum + 15-channel segment_sum, ~4-5 ms at 1M points)
with ONE pass over the sorted data:

* grid steps run sequentially, carrying the open run's partial sums, the
  previous key, the staging write pointer and the flushed-chunk counter in
  scratch;
* per block: boundaries -> Hillis-Steele prefix scan (pltpu.roll shift-adds
  — Mosaic has no cumsum), segmented inclusive sums with a window mask,
  segmented bitwise-OR for the tile mask;
* completed runs are PLACED into a VMEM staging buffer with a one-hot MXU
  matmul (each emitted run owns one staging column, so sum == assignment)
  — Mosaic has no scatter, and dynamic DMA offsets must be provably
  128-aligned, so the staging buffer is flushed to HBM in 128-column chunks
  at offsets built as chunk_counter * 128;
* the channel set is (fx, fy, fz, r, g, b, count, tile_or, key_lo, key_hi):
  in-voxel fractional sums (the quantized-payload downsample layout),
  color sums, occupancy, OR'd tile bits, and the 30-bit Morton key split
  into two f32-exact 15-bit halves.

Output: channel-major [16, out_cap] f32 plus the number of runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL = jnp.iinfo(jnp.int32).max

B = 1024  # points per grid step (XLA's 1-D i32 layout tiles T(1024))
STAGE_CHUNKS = 10  # staging width = 127 leftover + up to B emitted, in 128s
QUARTER = 256  # emission sub-tile: narrow one-hots cut staging traffic 3.3x
Q_W = QUARTER + 128  # relative target range within a quarter
STAGE_W = STAGE_CHUNKS * 128
NCH = 16  # emission channel rows (10 used), sublane-aligned
NSUM = 8  # rows that actually need the segmented sum scan (7 sums + pad)


def _lane_iota2(n):
    """[1, n] lane iota (Mosaic rolls need 2-D operands)."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _prefix_sum(x):
    """Inclusive prefix sum over a [1, B] i32 row (Hillis-Steele, roll-based)."""
    iota = _lane_iota2(B)
    d = 1
    while d < B:
        shifted = pltpu.roll(x, d, 1)
        x = x + jnp.where(iota >= d, shifted, 0)
        d *= 2
    return x


# Runs at/under this length finish in log2(_SHORT_RUN) scan steps; the rest
# of the Hillis-Steele ladder runs under a lax.cond only when a longer run
# is present (voxel runs average ~4 points, so the tail rarely runs).
# 0 disables the adaptive split (always run the full ladder).
# MEASURED on v5e (K=16 in-program A/B): the adaptive split LOSES ~11%
# end-to-end (128.9 vs 144.7 Mpts/s on the 1M chain) — the per-block
# scalar reduction + lax.cond stalls the sequential-grid pipeline for more
# than the 5 skipped scan steps are worth.  Kept at 0; the machinery
# documents the experiment (tests cover both settings).
_SHORT_RUN = 0

# Emission-matmul decomposition.  The one-hot placement matmul computes
# pure 1.0*value selections (each staging column receives at most one run),
# so any decomposition that represents the f32 VALUE operand exactly is
# EXACT here.  A manual bf16x3 split (hand-rolled: Mosaic's dot lowering
# only supports DEFAULT and HIGHEST) carries 3x8=24 mantissa bits >= f32's
# 24 — exact for the 15-bit key channels and the value sums — at 3 MXU
# passes versus HIGHEST's 6 (and the one-hot side is exactly bf16, so it
# needs no split at all).  Set to 0 to use Precision.HIGHEST instead
# (A/B hook for the parity tests).
_EMIT_BF16_SPLITS = 3


def _split_dot_onehot(ch_q, onehot_q):
    """Exact [NCH, Q] @ one-hot [Q, W] via bf16-split MXU passes."""
    if not _EMIT_BF16_SPLITS:
        return jax.lax.dot_general(
            ch_q, onehot_q.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    oh = onehot_q if onehot_q.dtype == jnp.bfloat16 else onehot_q.astype(jnp.bfloat16)
    acc = jnp.zeros((ch_q.shape[0], onehot_q.shape[1]), jnp.float32)
    rem = ch_q
    for _ in range(_EMIT_BF16_SPLITS):
        part = rem.astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            part, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rem = rem - part.astype(jnp.float32)
    return acc


def _segmented_scan_add(ch, bcum, lo=1, hi=B):
    """Segmented inclusive sums of ch [rows, B] within runs defined by bcum,
    for Hillis-Steele strides lo..hi."""
    rows = ch.shape[0]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (rows, B), 1)
    bcum2 = jnp.broadcast_to(bcum, (rows, B))
    d = lo
    while d < hi:
        shifted = pltpu.roll(ch, d, 1)
        bshift = pltpu.roll(bcum2, d, 1)
        same_run = (bcum2 - bshift == 0) & (iota2 >= d)
        ch = ch + jnp.where(same_run, shifted, 0.0)
        d *= 2
    return ch


def _segmented_scan_or(x, bcum, lo=1, hi=B):
    """Segmented inclusive bitwise-OR of x [1, B] i32 within runs."""
    iota = _lane_iota2(B)
    d = lo
    while d < hi:
        shifted = pltpu.roll(x, d, 1)
        bshift = pltpu.roll(bcum, d, 1)
        same_run = (bcum - bshift == 0) & (iota >= d)
        x = x | jnp.where(same_run, shifted, 0)
        d *= 2
    return x


def _segmented_scans(ch, tile, bcum):
    """Segmented sum of ch and OR of tile in one pass, short-run adaptive.

    Voxel runs average ~4 points (1M points -> ~260k voxels), so the first
    log2(_SHORT_RUN) Hillis-Steele steps complete almost every block; the
    remaining steps run under a lax.cond only when some run in the block is
    longer than _SHORT_RUN (detected as a lane whose run already spans the
    whole window).  Measured SLOWER end-to-end than the straight ladder
    (see _SHORT_RUN above) — disabled by default, kept for documentation.
    """
    if not _SHORT_RUN:
        return (_segmented_scan_add(ch, bcum, 1, B),
                _segmented_scan_or(tile, bcum, 1, B))
    ch = _segmented_scan_add(ch, bcum, 1, _SHORT_RUN)
    tile = _segmented_scan_or(tile, bcum, 1, _SHORT_RUN)
    iota = _lane_iota2(B)
    spans = (bcum - pltpu.roll(bcum, _SHORT_RUN, 1) == 0) & (iota >= _SHORT_RUN)
    has_long = jnp.max(jnp.where(spans, 1, 0)) == 1
    return jax.lax.cond(
        has_long,
        lambda: (_segmented_scan_add(ch, bcum, _SHORT_RUN, B),
                 _segmented_scan_or(tile, bcum, _SHORT_RUN, B)),
        lambda: (ch, tile),
    )


def _kernel(count_ref, smk_ref, sfr_ref, srgba_ref, out_ref, nseg_ref,
            stage, carry_sums, carry_or_key, chunk_ptr, sem, *, grid: int):
    i = pl.program_id(0)
    count = count_ref[0]

    @pl.when(i == 0)
    def _init():
        stage[:, :] = jnp.zeros((NCH, STAGE_W), jnp.float32)
        carry_sums[:, :] = jnp.zeros((NSUM, 128), jnp.float32)
        carry_or_key[0] = 0  # carry OR
        carry_or_key[1] = _SENTINEL  # previous key
        carry_or_key[2] = 0  # staging write pointer (columns)
        chunk_ptr[0] = 0

    smk = smk_ref[:].reshape(1, B)
    sfr = sfr_ref[:].reshape(1, B)
    srgba = srgba_ref[:].reshape(1, B)
    iota = _lane_iota2(B)
    valid = smk != _SENTINEL

    # channels [NCH, B]
    fx = (((sfr >> 20) & 1023).astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    fy = (((sfr >> 10) & 1023).astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    fz = ((sfr & 1023).astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    r = ((srgba >> 16) & 0xFF).astype(jnp.float32)
    g = ((srgba >> 8) & 0xFF).astype(jnp.float32)
    b_ch = (srgba & 0xFF).astype(jnp.float32)
    ones = jnp.where(valid, 1.0, 0.0)
    key_lo = jnp.where(valid, (smk & 0x7FFF).astype(jnp.float32), 0.0)
    key_hi = jnp.where(valid, ((smk >> 15) & 0x7FFF).astype(jnp.float32), 0.0)
    zero = jnp.zeros((1, B), jnp.float32)
    w = ones
    # Only the 7 accumulating channels ride the segmented scan ([NSUM, B]);
    # per-run VALUE rows (tile OR, key halves) are concatenated afterwards —
    # scanning them too (and overwriting post-scan) cost ~2x the scan work.
    ch = jnp.concatenate(
        [fx * w, fy * w, fz * w, r * w, g * w, b_ch * w, ones, zero],
        axis=0,
    )  # [NSUM, B]
    tile = jnp.where(valid, (srgba >> 24) & 0xFF, 0)

    # run boundaries (first lane compares against the carried key)
    prev_key = pltpu.roll(smk, 1, 1)
    carry_key = carry_or_key[1]
    # select over int32, not bool (Mosaic can't truncate i8 selects to i1)
    neq_carry = (smk != carry_key).astype(jnp.int32)
    neq_prev = (smk != prev_key).astype(jnp.int32)
    b_flag = jnp.where(iota == 0, neq_carry, neq_prev)
    bcum = _prefix_sum(b_flag)

    # continuation: the open run's partial is seeded into LANE 0 only (the
    # segmented scan then propagates it through the run; seeding every
    # continuation lane would multiply-count it).  The OR seed is idempotent
    # but gets the same treatment for clarity.
    is_cont_seed = (iota == 0) & (bcum == 0)
    ch = ch + jnp.where(is_cont_seed, carry_sums[:, 0:1], 0.0)
    tile = tile | jnp.where(is_cont_seed, carry_or_key[0], 0)

    ch, tile_or = _segmented_scans(ch, tile, bcum)
    # emission layout [NCH, B]: scanned sums (pad row 7 replaced by the
    # tile OR), then the per-run VALUE rows (the emission matmul picks
    # exactly one column per run, so values pass through unchanged)
    ch16 = jnp.concatenate(
        [ch[0:7], tile_or.astype(jnp.float32), key_lo, key_hi,
         jnp.zeros((NCH - 10, B), jnp.float32)],
        axis=0,
    )  # [NCH, B]

    # ends: a run ends where the NEXT lane starts a new run; the block's
    # last lane carries over instead (the final block force-closes it)
    next_b = pltpu.roll(b_flag, B - 1, 1)  # roll left by 1
    ends = jnp.where(iota == B - 1, 0, next_b)
    is_last_block = i == grid - 1
    force_close = is_last_block & (iota == B - 1) & valid
    ends = jnp.where(force_close, 1, ends).astype(jnp.int32)
    ends = jnp.where(valid, ends, 0)

    # If this block STARTS a new run while a previous run is still open
    # (it ended exactly at the block boundary), the carried partial must be
    # emitted now, ahead of the in-block emissions.
    carry_open = carry_key != _SENTINEL
    emit_carry = ((b_flag[0, 0] == 1) & carry_open).astype(jnp.int32)

    ends_scan = _prefix_sum(ends)
    erank = ends_scan - 1 + emit_carry  # emitted rank within block
    n_emit = jnp.max(ends_scan) + emit_carry

    wp = carry_or_key[2]
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, STAGE_W), 1)
    carry_target = jnp.where(emit_carry == 1, wp, -1)
    # Rebuild the carried run's full emission column: 7 sums from the
    # carry, then its tile OR and key halves from the scalar carries.
    carry_col = jnp.concatenate(
        [carry_sums[0:7, 0:1],
         jnp.full((1, 1), carry_or_key[0], jnp.int32).astype(jnp.float32),
         (jnp.full((1, 1), carry_key, jnp.int32) & 0x7FFF).astype(jnp.float32),
         ((jnp.full((1, 1), carry_key, jnp.int32) >> 15) & 0x7FFF).astype(jnp.float32),
         jnp.zeros((NCH - 10, 1), jnp.float32)],
        axis=0,
    )  # [NCH, 1]
    stage[:, :] = stage[:, :] + jnp.where(
        lane_w == carry_target, 1.0, 0.0
    ) * carry_col

    # Emission in QUARTER-point sub-tiles: each quarter's targets span at
    # most QUARTER+128 consecutive staging columns, so a narrow RELATIVE
    # one-hot places them at column (erank - base_rank), and a dynamic 2-D
    # roll shifts the quarter result to its absolute position — 3.3x less
    # one-hot materialization than a full-width placement, which measured
    # as this kernel's dominant cost.
    ecum = _prefix_sum(ends)  # emitted count up to each lane
    col_iota_q = jax.lax.broadcasted_iota(jnp.int32, (QUARTER, Q_W), 1)
    for q in range(B // QUARTER):
        lo = q * QUARTER
        ends_q = ends[:, lo : lo + QUARTER]
        ch_q = ch16[:, lo : lo + QUARTER]
        erank_q = erank[:, lo : lo + QUARTER]
        # emitted before this quarter (global, incl. the carry emission)
        before_q = (ecum[0, lo] - ends[0, lo]) + emit_carry
        # erank already includes the carry shift; before_q does too
        rel_target = jnp.where(ends_q == 1, erank_q - before_q, -1)
        # materialize the one-hot directly in bf16 (half the vreg traffic
        # of f32; 0/1 are exact in bf16)
        onehot_q = (col_iota_q == rel_target.reshape(QUARTER, 1)).astype(jnp.bfloat16)
        # Raised precision: the default single-pass bf16 MXU decomposition
        # corrupts the 15-bit key channels (measured).  The bf16x3 split is
        # exact and halves the MXU passes vs HIGHEST (see _EMIT_BF16_SPLITS).
        placed = _split_dot_onehot(ch_q, onehot_q)  # [NCH, Q_W]
        padded = jnp.concatenate(
            [placed, jnp.zeros((NCH, STAGE_W - Q_W), jnp.float32)], axis=1
        )
        offset_q = wp + before_q
        stage[:, :] = stage[:, :] + pltpu.roll(padded, offset_q, 1)

    # flush completed 128-column chunks
    wp_new = wp + n_emit
    nflush = wp_new // 128
    base_chunk = chunk_ptr[0]
    max_chunks = out_ref.shape[1] // 128
    for f in range(STAGE_CHUNKS):
        @pl.when((f < nflush) & (base_chunk + f < max_chunks))
        def _flush(f=f):
            dst = out_ref.at[:, pl.ds(pl.multiple_of((base_chunk + f) * 128, 128), 128)]
            dma = pltpu.make_async_copy(stage.at[:, pl.ds(f * 128, 128)], dst, sem)
            dma.start()
            dma.wait()

    # shift the staging buffer left by the flushed columns (static rolls
    # selected by nflush — Mosaic needs static shift amounts)
    shifted = stage[:, :]
    acc = jnp.zeros((NCH, STAGE_W), jnp.float32)
    for f in range(STAGE_CHUNKS + 1):
        rolled = pltpu.roll(shifted, STAGE_W - f * 128, 1) if f > 0 else shifted
        acc = acc + jnp.where(nflush == f, rolled, 0.0)
    rem = wp_new - nflush * 128
    keep_cols = jax.lax.broadcasted_iota(jnp.int32, (NCH, STAGE_W), 1) < rem
    stage[:, :] = jnp.where(keep_cols, acc, 0.0)

    # carry for the next block: the open run's partials = scanned values at
    # the last lane (unless it was force-closed / invalid)
    last_cols = ch[:, B - 1 : B]  # [NSUM, 1] (scanned sums)
    open_run = jnp.logical_not(is_last_block) & (smk[0, B - 1] != _SENTINEL)
    carry_sums[:, 0:1] = jnp.where(open_run, last_cols, 0.0)
    carry_or_key[0] = jnp.where(open_run, tile_or[0, B - 1], 0)
    carry_or_key[1] = smk[0, B - 1]
    carry_or_key[2] = rem
    chunk_ptr[0] = base_chunk + nflush

    @pl.when(is_last_block & (base_chunk + nflush < max_chunks))
    def _finalize_flush():
        # flush the final partial chunk (trailing columns are zero)
        dst = out_ref.at[:, pl.ds(pl.multiple_of((base_chunk + nflush) * 128, 128), 128)]
        dma = pltpu.make_async_copy(stage.at[:, pl.ds(0, 128)], dst, sem)
        dma.start()
        dma.wait()

    @pl.when(is_last_block)
    def _finalize_count():
        nseg_ref[0] = (base_chunk + nflush) * 128 + rem


@partial(jax.jit, static_argnames=("out_capacity",))
def segment_reduce_sorted(smk, sfr, srgba, count, out_capacity: int):
    """Reduce sorted voxel runs: returns (channels [16, out_cap] f32, nseg).

    Inputs are the sorted arrays of the quantized downsample path
    (ops/voxelize.py): Morton keys with _SENTINEL padding, packed 10-bit
    fracs, rgba as int32.  Capacities below the B=1024 grid block (small
    clouds: per-tile ops, registration subsamples, codec tiles) are padded
    with sentinel keys — the kernel already treats sentinel lanes as
    invalid, so padding is free of semantic effect.
    """
    cap = smk.shape[0]
    pad = (-cap) % B
    if pad:
        smk = jnp.concatenate([smk, jnp.full((pad,), _SENTINEL, jnp.int32)])
        sfr = jnp.concatenate([sfr, jnp.zeros((pad,), jnp.int32)])
        srgba = jnp.concatenate([srgba, jnp.zeros((pad,), jnp.int32)])
    # The chip path and the interpret path are selected per LOWERING
    # platform (a TPU-hosted process running a CPU mesh must get the
    # interpreted kernel on its CPU computations and the compiled one on
    # TPU — a global jax.devices()[0] check picks wrongly for one of them).
    return jax.lax.platform_dependent(
        smk,
        sfr,
        srgba,
        count,
        cpu=partial(_segment_reduce_call, out_capacity=out_capacity, interpret=True),
        default=partial(_segment_reduce_call, out_capacity=out_capacity, interpret=False),
    )


def _segment_reduce_call(smk, sfr, srgba, count, *, out_capacity: int, interpret: bool):
    cap = smk.shape[0]
    assert cap % B == 0
    grid = cap // B
    # slack for the final partial-chunk flush; rounds odd capacities up
    out_cap = -(-out_capacity // 128) * 128 + 256
    assert out_cap % 128 == 0
    kernel = partial(_kernel, grid=grid)
    out, nseg = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((B,), lambda i, c: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((B,), lambda i, c: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((B,), lambda i, c: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((NCH, STAGE_W), jnp.float32),
                pltpu.VMEM((NSUM, 128), jnp.float32),
                pltpu.SMEM((3,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NCH, out_cap), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(count, jnp.int32).reshape(1), smk, sfr, srgba)
    return out[:, :out_capacity], nseg[0]
