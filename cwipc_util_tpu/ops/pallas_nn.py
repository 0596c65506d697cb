"""Pallas TPU kernel: cross-cloud nearest-neighbor over a column grid.

The registration toolkit's inner kernel (ICP correspondences, analyzer
distances — reference: python/cwipc/registration/fine.py ICP loop,
analyze.py KDTree queries) asks, for every SOURCE point, the nearest
REFERENCE point within a correspondence radius.  The round-3 formulation
(ops/knn.py two-scale grid) gathers 27*48 candidate rows per query
through XLA's gather — measured ~2.5 s per 65k-point iteration on the
v5e (the ISA has no per-lane gather; every gathered row is serialized).

This kernel is the gather-free form, structured like the exact-kNN
selection kernel (pallas_cols_select.py): the REFERENCE cloud lives in a
dense (y, z)-column slot grid whose ring slices are contiguous
lane-shifted slab reads; QUERIES live in a second slot grid on the SAME
plane (same cell, same origin), so a 128-column tile's queries and their
complete candidate sets arrive with two DMAs.  Per query slot the kernel
scans the 77-column ring (9x9 minus the 4 corners, which are provably
outside the 4-cell radius), tracking the MINIMUM squared distance and
its candidate id — no k-selection, no bisection: two scans per slot.

Exactness: with cell >= maxd/3.5 the ring covers every reference point
within maxd of any in-grid query (|delta| <= maxd < 3.5 cells plus the
one-cell fp-quantization margin stays within column offset 4), so

  * a found minimum <= maxd IS the true nearest within the radius;
  * min > maxd (or an empty ring) is a true "no correspondence";
  * only queries that are out-of-grid / rank-dropped, or whose ring
    touches a DROPPED reference column (cap overflow, marked by
    _cols_build's drop_ring), need the caller's exact fallback.

The candidate id is encoded tier-independently as ring_index * capp_r +
slot_row; the finish phase decodes it to a plane slot and maps to the
original reference index through the reference grid's slot_orig plane.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_cols_select import _M, RING_COLS, SLOT_TIERS, TILE, _out_index_map

_F32_MAX = float(jnp.finfo(jnp.float32).max)
_INF = float("inf")


def _nn_kernel(scalars_ref, rplane_hbm, qplane_hbm, d2_ref, cid_ref,
               slab, qblk, cnd, sem_r, sem_q,
               *, cap_r: int, capp_r: int, cap_q: int, capp_q: int,
               gz: int, off: int, off_al: int, sw: int, nt_max: int):
    t = jnp.minimum(scalars_ref[0] + pl.program_id(0), nt_max - 1)
    dma_r = pltpu.make_async_copy(
        rplane_hbm.at[:, pl.ds(t * TILE, sw)], slab, sem_r
    )
    dma_r.start()
    # query planes are read at the tile's own lanes only (no ring halo);
    # the query plane is laid out WITHOUT the alignment front-pad, so the
    # tile's queries start at lane t*TILE directly
    dma_q = pltpu.make_async_copy(
        qplane_hbm.at[:, pl.ds(t * TILE, TILE)], qblk, sem_q
    )
    dma_q.start()
    dma_r.wait()
    dma_q.wait()

    ring = [
        (dy, dz)
        for dy in range(-_M, _M + 1)
        for dz in range(-_M, _M + 1)
        if max(abs(dy) - 1, 0) ** 2 + max(abs(dz) - 1, 0) ** 2 < _M * _M
    ]
    row_iota_q = jax.lax.broadcasted_iota(jnp.int32, (capp_q, TILE), 0)

    q_all_x = qblk[0:capp_q, :]
    q_all_y = qblk[capp_q : 2 * capp_q, :]
    q_all_z = qblk[2 * capp_q : 3 * capp_q, :]

    occ_q = jnp.max(
        jnp.sum((q_all_x < _F32_MAX / 2).astype(jnp.int32), axis=0)
    )
    occ_b = jnp.max(
        jnp.sum(
            (slab[0:capp_r, pl.ds(off_al - off, 2 * off + TILE)] < _F32_MAX / 2)
            .astype(jnp.int32),
            axis=0,
        )
    )

    def run(capp_sel: int):
        nrows = len(ring) * capp_sel

        # hoist the slot-invariant candidate gathering (see
        # pallas_cols_select.py: Mosaic does not hoist this itself)
        j = 0
        for dy in range(-_M, _M + 1):
            dzs = [dz for (dy2, dz) in ring if dy2 == dy]
            base = off_al + dy * gz + dzs[0]
            base_al = (base // TILE) * TILE
            rel = base - base_al
            w = (dzs[-1] - dzs[0]) + TILE
            span = TILE * (-(-(rel + w) // TILE))
            bx = slab[0:capp_sel, pl.ds(base_al, span)]
            by = slab[capp_r : capp_r + capp_sel, pl.ds(base_al, span)]
            bz = slab[2 * capp_r : 2 * capp_r + capp_sel, pl.ds(base_al, span)]
            for dz in dzs:
                o = rel + (dz - dzs[0])
                cnd[j * capp_sel : (j + 1) * capp_sel, :] = jax.lax.slice(
                    bx, (0, o), (capp_sel, o + TILE)
                )
                cnd[nrows + j * capp_sel : nrows + (j + 1) * capp_sel, :] = (
                    jax.lax.slice(by, (0, o), (capp_sel, o + TILE))
                )
                cnd[2 * nrows + j * capp_sel : 2 * nrows + (j + 1) * capp_sel, :] = (
                    jax.lax.slice(bz, (0, o), (capp_sel, o + TILE))
                )
                j += 1

        # tier-independent candidate ids: ring_index * capp_r + slot_row
        row_in_blk = jax.lax.broadcasted_iota(jnp.int32, (nrows, TILE), 0)
        blk = row_in_blk // capp_sel
        cid_iota = blk * capp_r + (row_in_blk - blk * capp_sel)

        def per_slot(s_q, acc):
            hit = row_iota_q == s_q
            qx = jnp.sum(jnp.where(hit, q_all_x, 0.0), axis=0, keepdims=True)
            qy = jnp.sum(jnp.where(hit, q_all_y, 0.0), axis=0, keepdims=True)
            qz = jnp.sum(jnp.where(hit, q_all_z, 0.0), axis=0, keepdims=True)
            dx = cnd[0:nrows, :] - qx
            dy_ = cnd[nrows : 2 * nrows, :] - qy
            dz_ = cnd[2 * nrows : 3 * nrows, :] - qz
            d2 = dx * dx + dy_ * dy_ + dz_ * dz_
            # empty ref slots hold F32_MAX coords -> d2 overflows to +inf
            m = jnp.min(d2, axis=0, keepdims=True)
            cid = jnp.min(
                jnp.where(d2 <= m, cid_iota, jnp.iinfo(jnp.int32).max),
                axis=0, keepdims=True,
            )
            acc_d, acc_c = acc
            return (
                jnp.where(hit, jnp.minimum(m, _F32_MAX), acc_d),
                jnp.where(hit, cid, acc_c),
            )

        init = (
            jnp.full((capp_q, TILE), _F32_MAX, jnp.float32),
            jnp.full((capp_q, TILE), jnp.iinfo(jnp.int32).max, jnp.int32),
        )
        acc_d, acc_c = jax.lax.fori_loop(
            0, jnp.minimum(occ_q, cap_q), per_slot, init
        )
        d2_ref[:, :] = acc_d
        cid_ref[:, :] = acc_c

    tiers = sorted({min(tc, capp_r) for tc in (*SLOT_TIERS, capp_r)})
    for n, t_cap in enumerate(tiers):
        cond = occ_b <= t_cap
        if n:
            cond = cond & (occ_b > tiers[n - 1])

        @pl.when(cond)
        def _tier(t_cap=t_cap):
            run(t_cap)


@partial(jax.jit, static_argnames=(
    "gy", "gz", "cap_r", "cap_q", "ntiles_run", "interpret"))
def nn_select_pallas(
    r_xs, r_ys, r_zs,
    q_xs, q_ys, q_zs,
    gy: int,
    gz: int,
    cap_r: int,
    cap_q: int,
    tile0: jax.Array | None = None,
    ntiles_run: int | None = None,
    interpret: bool = False,
):
    """Per query slot: (min squared distance, candidate id) over the full
    77-column ring of the reference grid.  Inputs are the padded channel
    planes from cols_knn._cols_build for BOTH clouds on the SAME grid
    (identical gy/gz/origin; caps may differ).  Returns [gyz, cap_q]
    arrays; candidate id = ring_index * ceil8(cap_r) + slot_row, or
    INT32_MAX for an empty ring."""
    gyz = gy * gz
    off = _M * gz + _M
    off_al = TILE * (-(-off // TILE))
    capp_r = -(-cap_r // 8) * 8
    capp_q = -(-cap_q // 8) * 8
    ntiles = -(-gyz // TILE)
    sw = TILE * (-(-(TILE + off_al + off) // TILE)) + TILE
    lp = (ntiles - 1) * TILE + sw
    full = ntiles_run is None
    if full:
        ntiles_run = ntiles
    t0 = (
        jnp.zeros((1,), jnp.int32)
        if tile0 is None
        else jnp.asarray(tile0, jnp.int32).reshape(1)
    )

    def prep_r(a):
        at = a[:, :cap_r].T
        at = jnp.pad(
            at,
            ((0, capp_r - cap_r),
             (off_al - off, max(0, lp - at.shape[1] - (off_al - off)))),
            constant_values=_F32_MAX,
        )
        return at[:, :lp]

    lq = ntiles * TILE

    def prep_q(a):
        # query planes carry no halo: drop the build's front halo rows
        # and pad the tail to the tile grid
        at = a[off : off + gyz, :cap_q].T
        at = jnp.pad(
            at,
            ((0, capp_q - cap_q), (0, lq - gyz)),
            constant_values=_F32_MAX,
        )
        return at

    rplane = jnp.concatenate([prep_r(r_xs), prep_r(r_ys), prep_r(r_zs)], axis=0)
    qplane = jnp.concatenate([prep_q(q_xs), prep_q(q_ys), prep_q(q_zs)], axis=0)

    kernel = partial(
        _nn_kernel, cap_r=cap_r, capp_r=capp_r, cap_q=cap_q, capp_q=capp_q,
        gz=gz, off=off, off_al=off_al, sw=sw, nt_max=ntiles,
    )
    # candidate scratch scales with cap_r (3*77*cap_r*128 f32): raise the
    # scoped-VMEM limit above XLA's 16 MB default (v5e has 128 MB; the
    # host-side chooser bounds cap_r so this fits — ops/knn.nn_grid_params)
    scratch_bytes = 4 * (
        3 * capp_r * sw            # ref slab
        + 3 * capp_q * TILE        # query block
        + 3 * RING_COLS * capp_r * TILE  # hoisted candidates
        + RING_COLS * capp_r * TILE      # per-slot d2 value
        + 4 * capp_q * TILE        # outputs + accumulators
    )
    vmem_bytes = min(scratch_bytes * 2 + (1 << 22), 110 * (1 << 20))
    d2_t, cid_t = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles_run,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((capp_q, TILE), _out_index_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((capp_q, TILE), _out_index_map,
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((3 * capp_r, sw), jnp.float32),
                pltpu.VMEM((3 * capp_q, TILE), jnp.float32),
                pltpu.VMEM((3 * RING_COLS * capp_r, TILE), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((capp_q, ntiles_run * TILE), jnp.float32),
            jax.ShapeDtypeStruct((capp_q, ntiles_run * TILE), jnp.int32),
        ),
    )(t0, rplane, qplane)
    if full:
        return d2_t[:cap_q, :gyz].T, cid_t[:cap_q, :gyz].T
    return d2_t[:cap_q].T, cid_t[:cap_q].T
