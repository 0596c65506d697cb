"""Shared machinery of the MXU ring kernels.

Both the segmented reduce (pallas_segment_reduce.py) and the stream
compactor (pallas_compact.py) are built on the same pattern: per-quarter
triangular-matmul prefixes, membership one-hot emission through exact
bf16-split matmuls into a VMEM ring, and clamped idempotent 128-column
chunk flushes to HBM.  The pieces with subtle correctness constraints live
here once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def split_dot(ch_q, member_q, splits: int):
    """Exact [C, Q] @ membership [Q, W] on the MXU via bf16-split passes.

    Each input value must fit in splits*8 mantissa bits for bit-exact
    results (the callers' channel layouts guarantee it); ``splits=0``
    selects one Precision.HIGHEST pass instead (A/B hook for parity
    tests)."""
    if not splits:
        return jax.lax.dot_general(
            ch_q, member_q.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    m = member_q if member_q.dtype == jnp.bfloat16 else member_q.astype(jnp.bfloat16)
    acc = jnp.zeros((ch_q.shape[0], member_q.shape[1]), jnp.float32)
    rem = ch_q
    for _ in range(splits):
        part = rem.astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            part, m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rem = rem - part.astype(jnp.float32)
    return acc


def fill_tri(tri_ref, quarter: int) -> None:
    """Fill the constant inclusive-prefix matrix: tri[r, c] = 1 iff r <= c,
    so (flags [1,Q]) @ tri = inclusive prefix count, exact in bf16/f32.
    Prefixes run PER QUARTER ([1,256]@[256,256] = 4 MXU passes) because an
    M=1 operand's cost is pure pass count ([1,B]@[B,B] measured 0.54 ms/1M)."""
    r_io = jax.lax.broadcasted_iota(jnp.int32, (quarter, quarter), 0)
    c_io = jax.lax.broadcasted_iota(jnp.int32, (quarter, quarter), 1)
    tri_ref[:, :] = (r_io <= c_io).astype(jnp.bfloat16)


def quarter_prefixes(bf_f, tri_ref, quarter: int):
    """All per-quarter inclusive prefixes of a [1, B] flag row as ONE
    batched [nq, Q] @ [Q, Q] matmul (an M=1 operand wastes 127/128 MXU
    rows and pays pure pass count, so four M=1 calls are 4x the passes of
    one M=4 call), with the scalar quarter bases chained only afterwards —
    interleaving scalar reads between matmuls serializes the kernel
    pipeline (measured 2.2 ms vs 1.67 even against the 64-pass full-block
    prefix).  Returns (pres [list of [1,Q] i32], tbs [list of scalar
    bases], total boundary count)."""
    nq = bf_f.shape[1] // quarter
    bf4 = bf_f.reshape(nq, quarter).astype(jnp.bfloat16)
    pre4 = jax.lax.dot_general(
        bf4, tri_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [nq, Q]
    pres = [pre4[q : q + 1, :] for q in range(nq)]
    tbs = [jnp.int32(0)]
    for q in range(nq - 1):
        tbs.append(tbs[-1] + pres[q][0, quarter - 1])
    total = tbs[nq - 1] + pres[nq - 1][0, quarter - 1]
    return pres, tbs, total


def make_flush_chunk(out_ref, stage, sem, stage_chunks: int):
    """Clamped, idempotent 128-column chunk flush: repeating a chunk
    re-writes identical data, so common paths need no per-chunk branches
    (conditional regions in a sequential-grid kernel body stall the
    pipeline).  Callers must keep chunk indices < max_chunks themselves
    when overflow chunks must NOT be written."""
    max_chunks = out_ref.shape[1] // 128

    def _flush_chunk(c):
        c = jnp.minimum(c, max_chunks - 1)
        src_col = (c % stage_chunks) * 128
        dst = out_ref.at[:, pl.ds(pl.multiple_of(c * 128, 128), 128)]
        dma = pltpu.make_async_copy(
            stage.at[:, pl.ds(pl.multiple_of(src_col, 128), 128)], dst, sem
        )
        dma.start()
        dma.wait()

    return _flush_chunk, max_chunks


def zero_flushed(stage, base_chunk, nflush, stage_chunks: int) -> None:
    """Zero the flushed ring columns so the next wrap accumulates cleanly."""
    nch, stage_w = stage.shape
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (nch, stage_w), 1)
    ring_dist = (lane_s - (base_chunk % stage_chunks) * 128) % stage_w
    stage[:, :] = jnp.where(ring_dist < nflush * 128, 0.0, stage[:, :])
