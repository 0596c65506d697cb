"""Pallas TPU kernel: segmented reduction over sorted voxel runs.

Replaces the XLA post-sort pipeline of the voxel downsample (boundary
detection + global cumsum + 15-channel segment_sum, ~4-5 ms at 1M points)
with ONE pass over the sorted data, built around the MXU:

* grid steps run sequentially, carrying only three scalars in SMEM — the
  previous block's last key, the open run's staging column, and the flushed
  chunk counter;
* per block: run boundaries -> boundary prefix-count via ONE matmul with a
  constant upper-triangular matrix (v2 used a Hillis-Steele roll ladder,
  which measured as the kernel's dominant cost: lane-crossing rolls on
  [1, B] rows are ~8x the throughput cost of their data size);
* every lane contributes its channel values to its RUN's staging column
  through a run-MEMBERSHIP matmul (column j sums all lanes of run j) in
  QUARTER-point sub-tiles — so per-run sums, counts and OR-able bit sums
  all come out of the MXU and no segmented scan exists at all.  A run
  spanning quarters or blocks simply keeps accumulating into the same
  staging column;
* per-run VALUES (the two 15-bit Morton-key halves) are masked to the
  run's FIRST lane before the matmul, so each column receives them exactly
  once — exact in f32;
* the tile OR rides as 4 packed base-2048 digit-pair channels (digit sum
  > 0 <=> OR), saturated to 1 per digit after every block so runs of any
  length decode exactly, recombined by the host-side wrapper;
* the staging buffer is a RING: completed columns (strictly before the
  open run's column) flush to HBM in 128-column chunks at dynamically
  computed, provably 128-aligned offsets, and flushed columns are zeroed
  in place for the next wrap.

The emission matmuls use a hand-rolled bf16x2 split of the f32 channel
operand (Mosaic's dot lowering only supports DEFAULT and HIGHEST): 2x8=16
mantissa bits reproduce every channel value exactly (the widest are the
15-bit key halves), and all column sums stay < 2^24, so the result is
bit-exact at a third of the MXU passes of HIGHEST.

Output: channel-major [NCH, out_cap] f32 plus the number of runs, with
rows (fx, fy, fz, r, g, b, count, tile_or, key_lo, key_hi) — the wrapper
`segment_reduce_sorted` recombines the bit sums into the row-7 tile OR so
the public contract matches v2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._mxu_ring import fill_tri, make_flush_chunk, quarter_prefixes, split_dot, zero_flushed

_SENTINEL = jnp.iinfo(jnp.int32).max

B = 1024  # points per grid step
STAGE_CHUNKS = 10  # ring width: 127 leftover + up to B new columns, in 128s
QUARTER = 256  # emission sub-tile: narrow membership one-hots
# Relative target range within a quarter.  (A [0, Q-1] mapping exists —
# subtract the quarter's first-lane boundary flag — which would cut the
# emission matmul to 2 N-tiles, but the per-quarter scalar read it needs
# on the emission path measured WORSE in-session: 1.53 vs 1.41 ms.)
Q_W = QUARTER + 128
STAGE_W = STAGE_CHUNKS * 128
NCH = 16  # channel rows: 7 sums + 4 packed tile-bit pairs + 2 keys + pad
# The 8 tile bits ride as 4 base-2048 digit PAIRS (bit j + 2048*bit j+4):
# per-run digit sums are <= B=1024 < 2048, so both digits decode exactly
# from the f32 sum (max 1024 + 2048*1024 = 2^21 < 2^24) — 4 rows instead
# of 8 keeps NCH at 16 (two f32 sublane tiles instead of three, cutting
# staging, roll, and matmul traffic by a third).
NBITPAIRS = 4
_BIT_BASE = 2048.0

# Number of bf16 splits for the emission matmuls (see module docstring).
# 0 selects Precision.HIGHEST instead (A/B hook for the parity tests).
# TWO splits (16 mantissa bits) are exact here: the widest channel values
# are the 15-bit key halves, the 12-bit tile digit pairs and the 11-bit
# centered fracs ((q+0.5)/1024) — every input is reproduced exactly by
# bf16_hi + bf16_lo, and all column sums stay < 2^24 so the f32
# accumulation is exact too.  (3 splits would cover arbitrary f32; no
# channel needs that width, and the third split was 1/3 of the emission
# MXU passes.)
_EMIT_BF16_SPLITS = 2


def _sr_out_map(i, c):
    # named, module-level index map: fresh lambdas per call defeat the
    # jit/persistent-compile caches (jax_explain_cache_misses, round 4)
    return (i,)


def _split_dot(ch_q, member_q):
    """Exact [NCH, Q] @ membership [Q, W] (shared MXU machinery)."""
    return split_dot(ch_q, member_q, _EMIT_BF16_SPLITS)


def _kernel(count_ref, smk_ref, sfr_ref, srgba_ref, out_ref, nseg_ref,
            stage, tri, carry, sem, *, grid: int):
    # carry (SMEM, i32[3]): [0] previous block's last key,
    #                       [1] open run's absolute column (-1 before any run),
    #                       [2] chunks flushed so far
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        stage[:, :] = jnp.zeros((NCH, STAGE_W), jnp.float32)
        fill_tri(tri, QUARTER)
        carry[0] = _SENTINEL
        carry[1] = -1
        carry[2] = 0

    smk = smk_ref[:].reshape(1, B)
    sfr = sfr_ref[:].reshape(1, B)
    srgba = srgba_ref[:].reshape(1, B)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    valid = smk != _SENTINEL
    ones = jnp.where(valid, 1.0, 0.0)

    # run boundaries (first lane compares against the carried key); invalid
    # (sentinel) lanes never start runs, so trailing padding contributes
    # nothing and nseg counts only real runs
    prev_key = pltpu.roll(smk, 1, 1)
    neq_carry = (smk != carry[0]).astype(jnp.int32)
    neq_prev = (smk != prev_key).astype(jnp.int32)
    b_flag = jnp.where(iota == 0, neq_carry, neq_prev)
    b_flag = jnp.where(valid, b_flag, 0)
    bf_f = b_flag.astype(jnp.float32)

    # channels [NCH, B]: sums, first-lane-masked key halves, tile bit sums
    fx = (((sfr >> 20) & 1023).astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    fy = (((sfr >> 10) & 1023).astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    fz = ((sfr & 1023).astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    r = ((srgba >> 16) & 0xFF).astype(jnp.float32)
    g = ((srgba >> 8) & 0xFF).astype(jnp.float32)
    b_ch = (srgba & 0xFF).astype(jnp.float32)
    key_lo = (smk & 0x7FFF).astype(jnp.float32) * bf_f
    key_hi = ((smk >> 15) & 0x7FFF).astype(jnp.float32) * bf_f
    tile = jnp.where(valid, (srgba >> 24) & 0xFF, 0)
    bitpairs = [
        (((tile >> j) & 1) + ((tile >> (j + NBITPAIRS)) & 1) * 2048
         ).astype(jnp.float32)
        for j in range(NBITPAIRS)
    ]
    ch = jnp.concatenate(
        [fx * ones, fy * ones, fz * ones, r * ones, g * ones, b_ch * ones,
         ones] + bitpairs + [key_lo, key_hi]
        + [jnp.zeros((NCH - 9 - NBITPAIRS, B), jnp.float32)],
        axis=0,
    )  # [NCH, B]: 0-6 sums, 7-10 bit pairs, 11-12 keys, 13-15 pad

    wp_open = carry[1]  # absolute column of the open run (-1 = none yet)
    # lane b's run lives at absolute column wp_open + (boundaries at or
    # before b); lanes before the first boundary continue the open run.
    # Invalid lanes land on the open column with all-zero values (harmless).
    #
    nq = B // QUARTER
    pres, tbs, n_bounds = quarter_prefixes(bf_f, tri, QUARTER)

    # The membership one-hot needs the prefix on the SUBLANE axis: the
    # [1,Q]->[Q,1] reshape is a lane->sublane relayout that the strip-down
    # probe put at ~0.24 ms/1M total — but batching all four into one
    # [nq,Q]->[Q,nq] transpose measured WORSE (1.43 vs 1.37 ms), so the
    # per-quarter reshape stays.
    col_iota_q = jax.lax.broadcasted_iota(jnp.int32, (QUARTER, Q_W), 1)
    for q in range(nq):
        ch_q = ch[:, q * QUARTER : (q + 1) * QUARTER]
        # lane l of quarter q lands at absolute column
        # wp_open + tbs[q] + pre_q[l]; the membership one-hot targets
        # pre_q directly (in [0, QUARTER] <= Q_W-1) and the quarter base
        # rides in the roll offset — no per-quarter scalar extraction on
        # the matmul's critical path.
        member_q = (col_iota_q == pres[q].reshape(QUARTER, 1)).astype(jnp.bfloat16)
        placed = _split_dot(ch_q, member_q)  # [NCH, Q_W]
        padded = jnp.concatenate(
            [placed, jnp.zeros((NCH, STAGE_W - Q_W), jnp.float32)], axis=1
        )
        # ring placement of the quarter at its absolute column
        offset_q = (wp_open + tbs[q]) % STAGE_W
        stage[:, :] = stage[:, :] + pltpu.roll(padded, offset_q, 1)

    # columns strictly below the new open column are complete -> flush
    wp_new = wp_open + n_bounds
    closed_chunks = jnp.maximum(wp_new, 0) // 128
    base_chunk = carry[2]
    nflush = closed_chunks - base_chunk
    _flush_chunk, max_chunks = make_flush_chunk(out_ref, stage, sem, STAGE_CHUNKS)

    # Typical blocks close 0-2 chunks (~218 runs/block on the bench cloud):
    # one branch with two clamped flushes covers them; a second, rarely
    # taken branch catches blocks that closed more (up to B/128 = 8).
    # Chunks at/past max_chunks are output overflow: never written (the
    # clamp below keeps repeats within the already-closed range).
    @pl.when((nflush > 0) & (base_chunk < max_chunks))
    def _flush_common():
        last = jnp.minimum(base_chunk + nflush - 1, max_chunks - 1)
        _flush_chunk(jnp.minimum(base_chunk, last))
        _flush_chunk(jnp.minimum(base_chunk + 1, last))

    @pl.when((nflush > 2) & (base_chunk + 2 < max_chunks))
    def _flush_catchup():
        last = jnp.minimum(base_chunk + nflush - 1, max_chunks - 1)
        for f in range(2, STAGE_CHUNKS):
            _flush_chunk(jnp.minimum(base_chunk + f, last))

    # Saturate the packed tile digit pairs: a run spanning blocks keeps
    # accumulating into its staging column, so a >= 2048-point run with a
    # tile bit set would overflow its base-2048 digit (bit j would decode
    # as bit j+4).  One block adds <= B = 1024 per digit, so clamping both
    # digits to 1 after every block keeps every digit < 1 + B < 2048 and
    # the OR decode ("digit sum > 0") exact for ANY run length.
    pair_rows = stage[7 : 7 + NBITPAIRS, :]
    hi_dig = jnp.floor(pair_rows * (1.0 / _BIT_BASE))
    lo_dig = pair_rows - hi_dig * _BIT_BASE
    stage[7 : 7 + NBITPAIRS, :] = (
        jnp.minimum(lo_dig, 1.0) + jnp.minimum(hi_dig, 1.0) * _BIT_BASE
    )

    zero_flushed(stage, base_chunk, nflush, STAGE_CHUNKS)

    carry[0] = smk[0, B - 1]
    carry[1] = wp_new
    carry[2] = base_chunk + nflush

    is_last_block = i == grid - 1

    @pl.when(is_last_block & (base_chunk + nflush < max_chunks))
    def _finalize_flush():
        # the final partial chunk: columns closed_chunks*128 .. wp_new
        _flush_chunk(base_chunk + nflush)

    @pl.when(is_last_block)
    def _finalize_count():
        nseg_ref[0] = wp_new + 1


@partial(jax.jit, static_argnames=("out_capacity",))
def segment_reduce_sorted(smk, sfr, srgba, count, out_capacity: int):
    """Reduce sorted voxel runs: returns (channels [16, out_cap] f32, nseg).

    Rows: fx, fy, fz, r, g, b sums; count; tile OR; key_lo, key_hi (the
    30-bit Morton key split into two f32-exact 15-bit halves); rest zero.

    Inputs are the sorted arrays of the quantized downsample path
    (ops/voxelize.py): Morton keys with _SENTINEL padding, packed 10-bit
    fracs, rgba as int32.  Capacities below the B=1024 grid block (small
    clouds: per-tile ops, registration subsamples, codec tiles) are padded
    with sentinel keys — the kernel treats sentinel lanes as invalid, so
    padding has no semantic effect.
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
                pl.BlockSpec((B,), _sr_out_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((B,), _sr_out_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((B,), _sr_out_map, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((NCH, STAGE_W), jnp.float32),
                pltpu.VMEM((QUARTER, QUARTER), jnp.bfloat16),
                pltpu.SMEM((3,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NCH, out_cap), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(count, jnp.int32).reshape(1), smk, sfr, srgba)
    out = out[:, :out_capacity]
    # public contract (v2-compatible 16 rows): row 7 = tile OR, recombined
    # from the 4 packed digit-pair rows (a bit was present iff its base-2048
    # digit sum > 0); rows 8/9 = the key halves (kernel rows 11/12)
    pairs = out[7 : 7 + NBITPAIRS]  # [4, cap]
    hi_digit = jnp.floor(pairs * (1.0 / _BIT_BASE))
    lo_digit = pairs - hi_digit * _BIT_BASE
    weights_lo = (1 << jnp.arange(NBITPAIRS, dtype=jnp.int32)).astype(jnp.float32)
    weights_hi = weights_lo * float(1 << NBITPAIRS)
    tile_or = (
        (lo_digit > 0).astype(jnp.float32) * weights_lo[:, None]
        + (hi_digit > 0).astype(jnp.float32) * weights_hi[:, None]
    ).sum(axis=0)
    out16 = jnp.concatenate(
        [out[0:7], tile_or[None, :], out[11:13],
         jnp.zeros((6, out.shape[1]), jnp.float32)],
        axis=0,
    )
    return out16, nseg[0]
