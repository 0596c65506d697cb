"""Pallas TPU kernel: all-VMEM bitonic sort of int32 arrays by one key.

STATUS: correct on v5e but a measured NEGATIVE result for performance —
12.2 ms vs 1.63 ms for ``lax.sort`` at 1M x 3 operands (in-program,
K-loop differenced).  Every one of the 210 compare-exchange stages
round-trips the full working set through VMEM (~20 vector ops x 4 MB per
stage ≈ 4 TB/s of VMEM traffic), whereas XLA's dedicated sort emitter
fuses whole sub-networks in registers.  Kept as a working reference for
Mosaic techniques this repo relies on (dynamic sublane rolls,
value-returning lax.cond, VMEM-resident outputs via constant block
index, vmem_limit_bytes above the 16 MB default on v5e's 128 MB VMEM) —
NOT wired into any production path; lax.sort with a single packed key is
the production formulation (ops/voxelize.py, ops/compaction.py).

Design (what was built and validated):

* the sequential TPU grid iterates over the network's compare-exchange
  stages (log2(N)*(log2(N)+1)/2 of them; 210 at N=2^20), one stage per
  grid step, with stage parameters (stride, direction bit) delivered via
  scalar prefetch;
* data lives as [N/1024, 1024] i32; a stage at stride s exchanges partner
  elements i <-> i^s, realised as two circular ``pltpu.roll``s (one per
  direction) along the lane axis (s < 1024) or the sublane axis
  (s >= 1024) plus masked selects — Mosaic has no gather/scatter;
* HBM is touched exactly twice (DMA in at step 0, DMA out at the last
  step).

The sort is NOT stable, which is fine for the downsample's fast path: the
single Morton key determines the voxel, and the segmented reduction that
follows is order-invariant within a run (sums / bitwise-OR).  Padding
lanes carry the i32-max sentinel key and sort to the end.

Reference behavior context: the downsample this was built for implements
src/cwipc_filters.cpp:89-172 (voxel grid averaging); output order is
identical to lax.sort up to permutations within equal keys.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024


def _stage_tables(n: int):
    """Per-stage (lane_stride, row_stride, lane_dirbit, row_dirbit) tables.

    Stage order: for level k = 1..log2(n) (bitonic subsequence length 2^k),
    strides s = 2^(k-1) down to 1.  The direction of element i at level k is
    ascending iff (i & 2^k) == 0; the final level is ascending everywhere
    (encoded as dirbit 0).  Each bit is split into its lane part (< 1024)
    and row part (>= 1024) so the kernel can mask a single [rows, 1024]
    iota pair with plain scalar ANDs.
    """
    logn = n.bit_length() - 1
    s_lane, s_row, d_lane, d_row = [], [], [], []
    for k in range(1, logn + 1):
        dirbit = (1 << k) if k < logn else 0
        s = 1 << (k - 1)
        while s >= 1:
            s_lane.append(s if s < LANES else 0)
            s_row.append(s // LANES)
            d_lane.append(dirbit if dirbit < LANES else 0)
            d_row.append(dirbit // LANES)
            s //= 2
    mk = lambda v: jnp.asarray(np.asarray(v, np.int32))
    return mk(s_lane), mk(s_row), mk(d_lane), mk(d_row)


def _kernel(*refs, rows: int, nstages: int, nops: int):
    # refs: 4 stage tables, nops HBM inputs, nops VMEM outputs (the working
    # buffers: their constant block index keeps them resident in VMEM across
    # the sequential grid, written back to HBM once after the last step), sem
    tables, rest = refs[:4], refs[4:]
    sl_ref, sr_ref, dl_ref, dr_ref = tables
    in_refs = rest[:nops]
    scr = rest[nops:2 * nops]
    sem = rest[2 * nops]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _load():
        for src, dst in zip(in_refs, scr):
            dma = pltpu.make_async_copy(src, dst, sem)
            dma.start()
            dma.wait()

    sl = sl_ref[t]
    sr = sr_ref[t]
    dl = dl_ref[t]
    dr = dr_ref[t]

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    # (i & s) == 0: i sits in the low half of its partner pair.
    low = ((lane & sl) | (row & sr)) == 0
    # (i & 2^k) == 0: this subsequence sorts ascending.
    up = ((lane & dl) | (row & dr)) == 0
    keep_min = low == up

    is_lane_stage = sl > 0

    def _partner_lane(x):
        fwd = pltpu.roll(x, sl, 1)            # x[l - s]
        bwd = pltpu.roll(x, LANES - sl, 1)    # x[l + s]
        return jnp.where(low, bwd, fwd)

    def _partner_row(x):
        fwd = pltpu.roll(x, sr, 0)            # x[r - s]
        bwd = pltpu.roll(x, rows - sr, 0)     # x[r + s]
        return jnp.where(low, bwd, fwd)

    mine = [s[:, :] for s in scr]
    theirs = jax.lax.cond(
        is_lane_stage,
        lambda: tuple(_partner_lane(x) for x in mine),
        lambda: tuple(_partner_row(x) for x in mine),
    )

    # Take the partner's tuple iff its key belongs on this side.  Equal
    # keys keep their own payloads on both sides (a no-op exchange).
    tk, mk = theirs[0], mine[0]
    take = (tk != mk) & ((tk < mk) == keep_min)
    for s, m, th in zip(scr, mine, theirs):
        s[:, :] = jnp.where(take, th, m)



@partial(jax.jit, static_argnames=("interpret",))
def sort_by_key(key: jax.Array, *payloads: jax.Array, interpret: bool = False):
    """Sort i32[N] arrays by the first (N a power of two >= 8192).

    Drop-in for ``lax.sort((key, *payloads), num_keys=1)`` up to
    permutations within equal keys (this sort is not stable).  Total operand
    bytes must fit comfortably in VMEM (128 MB on v5e; the conservative
    12 MB bound here covers 3 operands at N=2^20).
    """
    n = key.shape[0]
    assert n >= 8 * LANES and (n & (n - 1)) == 0, n
    ops = (key,) + payloads
    nops = len(ops)
    assert nops * n * 4 <= 12 * 1024 * 1024, (nops, n)
    rows = n // LANES
    s_lane, s_row, d_lane, d_row = _stage_tables(n)
    nstages = int(s_lane.shape[0])
    shape = (rows, LANES)

    # The outputs double as the VMEM working buffers (constant block
    # index -> resident across the sequential grid, flushed to HBM after
    # the last step).  Dedicated VMEM scratch + whole-array outputs would
    # double the footprint: XLA stack-allocates pallas whole-array outputs
    # in VMEM regardless of a HBM/ANY memory-space request (measured:
    # 43.8 MB scoped-vmem OOM at N=2^20).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nstages,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * nops,
        out_specs=[
            pl.BlockSpec(shape, lambda t, *_: (0, 0), memory_space=pltpu.VMEM)
        ] * nops,
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    outs = pl.pallas_call(
        partial(_kernel, rows=rows, nstages=nstages, nops=nops),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.int32)] * nops,
        # XLA stack-allocates the whole-array results in VMEM; the default
        # 16 MB scoped-vmem budget rejects that at N=2^20 even though v5e
        # has 128 MB of physical VMEM.  Raise the per-kernel limit instead
        # (the host-side XLA_FLAGS route rejects TPU-only flags).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s_lane, s_row, d_lane, d_row, *(x.reshape(shape) for x in ops))
    return tuple(o.reshape(n) for o in outs)


def sort3(key, pa, pb, *, interpret: bool = False):
    """Sort three i32[N] arrays by the first; see sort_by_key."""
    return sort_by_key(key, pa, pb, interpret=interpret)
