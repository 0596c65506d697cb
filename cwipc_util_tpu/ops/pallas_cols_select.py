"""Pallas TPU kernel: fused column-grid exact k-NN selection.

Replaces the XLA formulation of ops/cols_knn.py phase 2 (ring-slice
distances + two-stage lax.top_k).  Why the XLA version is slow: every
selection step streams the [queries, candidates] distance matrix through
HBM (the matrix is ~20 GB at bench scale across chunks), and top_k's
emitter runs at ~3 M candidate-elements/ms.  Measured consequence
(BASELINE.md selection-wall table): exact selection costs 27-64 ms per
[465k, 343] no matter the formulation — *in XLA*.

This kernel removes the HBM wall: per 128 plane rows it DMAs one
transposed plane slab into VMEM, gathers the ring columns' channel
blocks ONCE per tile into a candidate scratch (the gathering is
slot-invariant — recomputing it per slot measured ~40 ms/run before the
hoist), then per query slot builds the [77*CAP, 128] squared-distance
matrix IN VMEM and selects the k-th smallest with a seeded
bisect-then-advance search on the f32 bit patterns (see the selection
comment in the kernel body).  HBM traffic is one read of the plane
slabs plus the [plane, cap] result write: ~300 MB total at bench scale
instead of tens of GB.  Round-4 history at bench scale: 234 ms (31-step
bisection, per-slot unaligned candidate reads) -> 80 ms (hoisted
candidates + tiers + advance tail + seeding).

Per-tile occupancy specialization: columns are rank-compacted, so
candidate slots at index >= the tile's max ring-column occupancy are
empty in EVERY ring column (+inf distances that lose every comparison).
Each tile therefore dispatches to one of three STATICALLY-sized variants
of the scan (candidate slots capped at 16, 24, or the full CAP) via
pl.when on the slab's max column occupancy — identical candidate set,
~25% less build+bisection work on the bench cloud (densest ring column
of a typical tile holds ~18 of CAP=28 slots; boundary tiles far less).
Static specialization matters: a dynamically-bounded chunk loop inside
the bisection was measured 22% SLOWER than the flat full scan (366 vs
300 ms at bench scale) — Mosaic's dynamic-trip-count loop overhead ate
the saving, so the bound must be a compile-time constant per branch.

Key layout decision: the planes are stored TRANSPOSED ([slot, plane-row]
— slots on sublanes, plane rows on lanes), so the candidates of ring
offset (dy, dz) for ALL 128 queries of a tile are one contiguous
lane-shifted slab read.  A [query, candidate] layout would need a
per-lane gather, which the ISA does not have.  (An earlier standalone
VMEM bisection kernel consumed a PRE-MATERIALIZED HBM distance matrix
and lost 7x to top_k — the fusion of distance construction is the point,
not the bisection alone.)

Exactness: identical candidate set to the XLA path (full 9x9 column
ring, self-pair excluded).  Ties at the k-th distance are handled
arithmetically — sum = sum(d < kth) + (k - count(d < kth)) * kth — so no
index packing is needed and duplicate distances contribute exactly as
PCL's ordered scan would (reference semantics:
/root/reference/src/cwipc_filters.cpp:181-278).  Empty slots carry
F32_MAX coordinates, so their squared distances overflow to +inf and
lose every comparison; a query with fewer than k in-ring neighbors gets
kth >= F32_MAX and is recomputed exactly by the caller's brute-force
fixup, exactly like the XLA path.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_MAX = float(jnp.finfo(jnp.float32).max)
_INF = float("inf")
_M = 4  # ring radius in cells (must match cols_knn._M)

TILE = 128  # plane rows (query columns) per grid step


def _out_index_map(i, t0):
    """Output block index map (named, module-level: a fresh lambda per
    pallas_call gave every trace a new function identity, defeating the
    jit and persistent-compile caches — flagged by
    jax_explain_cache_misses, round 4)."""
    return (0, i)

# Static occupancy tiers for the per-tile selection-pass specialization:
# a tile whose max ring-column occupancy is <= t dispatches to a pass
# statically sized at t candidate slots per column (the full CAP bucket
# is always appended as the final tier).  Shared with tests so dispatch
# expectations aren't re-derived by hand.
SLOT_TIERS = (12, 16, 20, 24)

# Ring columns actually scanned: the 9x9 Chebyshev ring minus its 4
# corner columns (geometrically outside the 4-cell coverage radius; see
# the `ring` construction in _select_kernel).
RING_COLS = (2 * _M + 1) ** 2 - 4


def slab_occupancy(xs_g, gz: int, cap: int, tile: int) -> int:
    """Max column occupancy over one tile's candidate reach — the exact
    quantity the kernel's tier dispatch uses (occ_b), computed from the
    un-transposed xs plane for tests/diagnostics.  ``xs_g`` is the padded
    [off + gyz + tail, cap] plane from cols_knn._cols_build."""
    import numpy as np

    off = _M * gz + _M
    off_al = TILE * (-(-off // TILE))
    occ_cols = (np.asarray(xs_g)[:, :cap] < _F32_MAX / 2).sum(axis=1)
    # slab lane L of tile t maps to xs_g row t*TILE + L - off_al + off;
    # the kernel's occupancy slice covers slab lanes [off_al - off,
    # off_al + off + TILE) = xs_g rows [t*TILE, t*TILE + 2*off + TILE)
    lo = tile * TILE
    hi = lo + 2 * off + TILE
    sl = occ_cols[max(0, lo):max(0, hi)]
    return int(sl.max()) if sl.size else 0


# Seeded-bisection window: when the caller certifies the voxel-unique
# d_k >= cell/2 volume bound (see cols_select_pallas), the k-th squared
# distance lies in [bits((0.499c)^2), bits((4.0001c)^2)] — a bit-space
# window of at most log2((4/0.499)^2) ~ 6.01 exponent steps.  W_SEED is
# that width with margin; it is cell-INDEPENDENT for normal f32 cells
# (multiplying a normal float by 2^e adds exactly e<<23 to its bits).
W_SEED = 6 * (1 << 23) + (1 << 21)
T_SEED = 13  # ceil(log2(W_SEED)) - 12: leaves a <= 2^13-bit window
T_FULL = 18  # unseeded: 2^31 initial width, same final window size
R_CONT = 13  # continuation steps to fully converge a 2^13-bit window


def _select_kernel(scalars_ref, plane_hbm, sums_ref, kth_ref, slab, cnd, d2,
                   sem, *, cap: int, capp: int, gz: int, k: int, off: int,
                   off_al: int, sw: int, nt_max: int, seeded: bool = False,
                   probe: str = "full", mxu_count: bool = False):
    # off_al is the lane offset of the queries inside the slab — a
    # multiple of 128 (Mosaic requires aligned lanes for dynamic-sublane
    # loads; the wrapper pads the plane front accordingly).  Ring reads
    # use static unaligned offsets, which are supported.
    # tile0 shifts the tile range: a sharded caller passes its shard's
    # first plane tile so each device selects only its own slab.  The
    # clamp keeps over-the-end ranges (per-device rounding) reading
    # in-bounds — they recompute the last tile, and the caller slices
    # the duplicate trailing rows off after its gather.
    t = jnp.minimum(scalars_ref[0] + pl.program_id(0), nt_max - 1)
    dma = pltpu.make_async_copy(
        plane_hbm.at[:, pl.ds(t * TILE, sw)], slab, sem
    )
    dma.start()
    dma.wait()

    # Ring column set: the 9x9 Chebyshev ring MINUS its 4 corner columns.
    # A corner column's nearest point to any query in the center cell is
    # >= sqrt(3^2+3^2) = 4.24 cells away — beyond the 4-cell coverage
    # radius — so corners can never contribute to a COVERED query's k
    # smallest, and uncovered queries go to the caller's fixup either
    # way.  (The XLA path keeps all 81; sums/kth agree wherever covered.)
    ring = [
        (dy, dz)
        for dy in range(-_M, _M + 1)
        for dz in range(-_M, _M + 1)
        if max(abs(dy) - 1, 0) ** 2 + max(abs(dz) - 1, 0) ** 2 < _M * _M
    ]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (capp, TILE), 0)

    # The query block, read ONCE per tile with static (aligned) indices —
    # Mosaic has no dynamic single-sublane load, so per_slot extracts its
    # row in-register with a masked reduce (three [capp, TILE] passes,
    # noise next to the bisection).
    q_all_x = slab[0:capp, pl.ds(off_al, TILE)]
    q_all_y = slab[capp : 2 * capp, pl.ds(off_al, TILE)]
    q_all_z = slab[2 * capp : 3 * capp, pl.ds(off_al, TILE)]

    # Occupancy bounds: slots are rank-compacted per column, so every real
    # query in this tile has slot index < the tile's max column occupancy
    # — the mean occupancy is a small fraction of CAP (3.3 of 28 on the
    # bench cloud), so bounding the slot loop by the tile's own maximum
    # skips the bulk of the empty-slot selection work on interior tiles.
    occ_q = jnp.max(
        jnp.sum((q_all_x < _F32_MAX / 2).astype(jnp.int32), axis=0)
    )
    # The same bound on the CANDIDATE side, over exactly the lanes the
    # ring reads can reach from this tile's queries ([off_al - off,
    # off_al + off + TILE)): every candidate with slot >= occ_b is empty
    # in every ring column, so the statically-specialized branch below
    # scans only enough slots to cover it — skipped slots would be +inf
    # and lose every comparison.  (Scanning the whole slab instead would
    # also count alignment-padding and past-reach lanes; a dense column
    # just outside the reach would then push the tile into a heavier
    # tier than its candidates require.)
    occ_b = jnp.max(
        jnp.sum(
            (slab[0:capp, pl.ds(off_al - off, 2 * off + TILE)] < _F32_MAX / 2)
            .astype(jnp.int32),
            axis=0,
        )
    )

    def run(capp_sel: int):
        """One statically-sized selection pass over slots [0, capp_sel).

        Exact for every tile whose max ring-column occupancy <= capp_sel;
        the pl.when dispatch below guarantees that precondition.
        """
        nrows = len(ring) * capp_sel
        cand_iota = jax.lax.broadcasted_iota(jnp.int32, (capp_sel, TILE), 0)

        # Candidate gathering is SLOT-INVARIANT: materialize the 77 ring
        # columns' channel blocks ONCE per tile into the cnd scratch, so
        # the per-slot build is three contiguous aligned loads + the
        # distance arithmetic.  The slicing itself is grouped by dy: the
        # dz offsets of one dy are consecutive lanes, so one lane-ALIGNED
        # widened load per (dy, channel) serves all of them via static
        # value slices.  (History: per-slot unaligned ref reads measured
        # 67 ms of a 189 ms kernel; per-slot value slices ~55 ms — both
        # replaced by this hoist, round 4.)
        j = 0
        for dy in range(-_M, _M + 1):
            dzs = [dz for (dy2, dz) in ring if dy2 == dy]
            base = off_al + dy * gz + dzs[0]
            base_al = (base // TILE) * TILE
            rel = base - base_al
            w = (dzs[-1] - dzs[0]) + TILE
            span = TILE * (-(-(rel + w) // TILE))
            bx = slab[0:capp_sel, pl.ds(base_al, span)]
            by = slab[capp : capp + capp_sel, pl.ds(base_al, span)]
            bz = slab[2 * capp : 2 * capp + capp_sel, pl.ds(base_al, span)]
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
        j_self = ring.index((0, 0))

        # Candidate counting: the bisection's per-step work is ONE
        # indicator compare + ONE sublane reduction over [nrows, 128].
        # ``mxu_count`` routes the reduction through the MXU as a
        # ones-row matmul — counts are small integers in f32, so the
        # matmul is EXACT — leaving only the compare on the VPU (the
        # round-4 NOTES pegged the VPU-reduce form at ~50% VPU peak;
        # this is the round-5 falsification attempt for that floor).
        if mxu_count:
            ones_row = jnp.ones((1, len(ring) * capp_sel), jnp.float32)

            def count_rows(ind):
                return jnp.dot(
                    ones_row, ind.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
        else:
            def count_rows(ind):
                return jnp.sum(ind.astype(jnp.int32), axis=0, keepdims=True)

        def per_slot(s_q, acc):
            hit = row_iota == s_q
            qx = jnp.sum(jnp.where(hit, q_all_x, 0.0), axis=0, keepdims=True)
            qy = jnp.sum(jnp.where(hit, q_all_y, 0.0), axis=0, keepdims=True)
            qz = jnp.sum(jnp.where(hit, q_all_z, 0.0), axis=0, keepdims=True)
            dx = cnd[0:nrows, :] - qx
            dy_ = cnd[nrows : 2 * nrows, :] - qy
            dz_ = cnd[2 * nrows : 3 * nrows, :] - qz
            d2[0:nrows, :] = dx * dx + dy_ * dy_ + dz_ * dz_
            # self-pair: the query's own slot in the center column only
            c0, c1 = j_self * capp_sel, (j_self + 1) * capp_sel
            d2[c0:c1, :] = jnp.where(
                cand_iota == s_q, _INF, d2[c0:c1, :]
            )

            if probe == "build":  # strip-down probe: build cost only
                acc_s, acc_k = acc
                touch = jnp.sum(d2[0:nrows, :], axis=0, keepdims=True)
                return jnp.where(hit, touch, acc_s), acc_k

            bits = jax.lax.bitcast_convert_type(d2[0:nrows, :], jnp.int32)

            # Count-bisection on the (non-negative, order-preserving) f32
            # bit patterns: smallest v with count(d2 <= v) >= k is the
            # k-th smallest squared distance.  +inf (empty slots) always
            # loses; a query with < k real candidates converges onto inf
            # and is flagged for the caller's exact fixup via kth.
            # The carried clo tracks count(d2 <= lo - 1) < k, which the
            # min-advance tail below needs.
            def bis(_i, state):
                lo, hi, clo = state
                mid = lo + ((hi - lo) >> 1)
                cnt = count_rows(bits <= mid)
                ge = cnt >= k
                return (
                    jnp.where(ge, lo, mid + 1),
                    jnp.where(ge, mid, hi),
                    jnp.where(ge, clo, cnt),
                )

            imax = jnp.iinfo(jnp.int32).max
            if seeded:
                # scalars_ref[1] = bits((0.499*cell)^2), a certified lower
                # bound on the k-th squared distance's bit pattern; values
                # beyond the window (kth > ~4c, or < k candidates) converge
                # onto the window top, which classifies as uncovered ->
                # caller fixup, exactly like the unseeded +inf contract.
                lo0 = jnp.full((1, TILE), scalars_ref[1], jnp.int32)
                hi0 = lo0 + W_SEED
                # candidates BELOW the seed exist (the nearest neighbors);
                # the advance tail needs clo == count(bits <= lo-1), so
                # seed it with one count scan
                c00 = count_rows(bits < lo0)
            else:
                lo0 = jnp.zeros((1, TILE), jnp.int32)
                hi0 = jnp.full((1, TILE), imax, jnp.int32)
                c00 = jnp.zeros((1, TILE), jnp.int32)

            if probe.startswith("bisect") or probe == "noadvance":
                # strip-down probes: a plain truncated/full bisection
                nsteps = 31 if probe == "noadvance" else int(probe[len("bisect"):])
                _lo, hi, _c = jax.lax.fori_loop(0, nsteps, bis, (lo0, hi0, c00))
            else:
                # Bisect-then-advance: T coarse steps bound d_k to a
                # 2^(31-T)-bit window, then each ADVANCE extracts the
                # smallest candidate value >= lo with one masked-min scan
                # and confirms it with one count scan — d_k is usually
                # the first or second distinct value in the window, so 2
                # advances replace the last 31-T bisection steps (each
                # advance costs ~2 steps; measured round 4).  Lanes whose
                # window holds >2 distinct values below d_k fall through
                # to a RARE per-tile continuation that finishes the plain
                # bisection — exactness is unconditional either way.
                T, R = (T_SEED if seeded else T_FULL), R_CONT
                lo, hi, clo = jax.lax.fori_loop(0, T, bis, (lo0, hi0, c00))
                kth_bits = hi
                resolved = jnp.zeros((1, TILE), jnp.bool_)
                for _adv in range(2):
                    # min candidate >= lo (NOT >: d_k may equal lo)
                    m = jnp.min(
                        jnp.where(bits >= lo, bits, imax), axis=0, keepdims=True
                    )
                    ceq = count_rows(bits == m)
                    c = clo + ceq  # == count(d2 <= m): no values in [lo, m)
                    newly = (c >= k) & jnp.logical_not(resolved)
                    kth_bits = jnp.where(newly, m, kth_bits)
                    adv = jnp.logical_not(resolved | (c >= k))
                    lo = jnp.where(adv, m + 1, lo)
                    clo = jnp.where(adv, c, clo)
                    resolved = resolved | (c >= k)
                unres_any = jnp.max(jnp.logical_not(resolved).astype(jnp.int32))
                lo_c = jnp.where(resolved, kth_bits, lo)
                hi_c = jnp.where(resolved, kth_bits, hi)

                def _cont(ops):
                    l0, h0, cl0 = ops
                    return jax.lax.fori_loop(0, R, bis, (l0, h0, cl0))[1]

                hi = jax.lax.cond(
                    unres_any > 0, _cont, lambda ops: ops[1], (lo_c, hi_c, clo)
                )

            if probe == "nofinal":  # strip-down: skip the sum pass
                acc_s, acc_k = acc
                kth_d = jnp.sqrt(jax.lax.bitcast_convert_type(hi, jnp.float32))
                return (jnp.where(hit, kth_d, acc_s),
                        jnp.where(hit, kth_d, acc_k))

            lt = bits < hi
            cnt_lt = count_rows(lt)
            dist = jnp.sqrt(jnp.maximum(d2[0:nrows, :], 0.0))
            ssum = jnp.sum(jnp.where(lt, dist, 0.0), axis=0, keepdims=True)
            kth_d = jnp.sqrt(jax.lax.bitcast_convert_type(hi, jnp.float32))
            extra = (k - cnt_lt).astype(jnp.float32)
            ssum = ssum + jnp.where(extra > 0.0, extra * kth_d, 0.0)

            # accumulate into the carried result blocks (dynamic single-
            # sublane stores are as unsupported as the loads)
            acc_s, acc_k = acc
            acc_s = jnp.where(hit, ssum, acc_s)
            acc_k = jnp.where(hit, jnp.minimum(kth_d, _F32_MAX), acc_k)
            return acc_s, acc_k

        zero = jnp.zeros((capp, TILE), jnp.float32)
        # Every real query slot s_q satisfies s_q < its column's occupancy
        # <= occ_q (columns are rank-compacted), so slots >= occ_q can be
        # skipped: their results are never read back by _cols_finish.
        acc_s, acc_k = jax.lax.fori_loop(
            0, jnp.minimum(occ_q, cap), per_slot, (zero, zero)
        )
        sums_ref[:, :] = acc_s
        kth_ref[:, :] = acc_k

    # Static occupancy tiers (SLOT_TIERS + the full bucket).  Most
    # bench-cloud tiles land in the middle tier (densest ring column
    # ~18-24 of CAP=28); near-empty boundary tiles take the cheapest
    # one.  Exactly one branch runs per tile.
    tiers = sorted({min(t, capp) for t in (*SLOT_TIERS, capp)})
    for n, t_cap in enumerate(tiers):
        cond = occ_b <= t_cap
        if n:
            cond = cond & (occ_b > tiers[n - 1])

        @pl.when(cond)
        def _tier(t_cap=t_cap):
            run(t_cap)


def cols_select_pallas(*args, mxu_count: bool | None = None, **kw):
    """Public entry: ``mxu_count=None`` resolves the default OUTSIDE jit
    (an env read inside the traced body would be frozen into the cached
    executable).  Default ON: measured 80.2 -> 50.1 ms at bench scale on
    the v5e with bit-identical results (benchmarks/ceiling.py claim 3,
    tests/test_pallas.py::test_mxu_count_matches_vpu_count);
    ``CWIPC_SEL_MXU_COUNT=0`` restores the VPU reduction."""
    if mxu_count is None:
        mxu_count = os.environ.get("CWIPC_SEL_MXU_COUNT", "1") != "0"
    return _cols_select_jit(*args, mxu_count=mxu_count, **kw)


@partial(jax.jit, static_argnames=(
    "k", "gy", "gz", "cap", "ntiles_run", "interpret", "seeded", "probe",
    "mxu_count"))
def _cols_select_jit(
    xs_g: jax.Array,
    ys_g: jax.Array,
    zs_g: jax.Array,
    k: int,
    gy: int,
    gz: int,
    cap: int,
    tile0: jax.Array | None = None,
    ntiles_run: int | None = None,
    interpret: bool = False,
    cell: jax.Array | None = None,
    seeded: bool = False,
    probe: str = "full",
    mxu_count: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact (sum of k smallest distances, k-th distance) for every slot
    of the column grid, as [gyz, cap] arrays.  Inputs are the padded
    channel planes produced by cols_knn._cols_build (halo ``off`` rows of
    F32_MAX on both sides of the [gyz, cap] plane).

    ``tile0``/``ntiles_run`` select a contiguous range of 128-row plane
    tiles (for mesh-sharded callers: every device passes the full
    replicated planes and its own tile range; results come back as
    [ntiles_run * 128, cap] plane rows starting at tile0 * 128).  The
    default covers the whole plane and returns [gyz, cap]."""
    gyz = gy * gz
    off = _M * gz + _M
    off_al = TILE * (-(-off // TILE))  # 128-aligned query-lane offset
    capp = -(-cap // 8) * 8
    # The smallest tier scans RING_COLS*min(min(SLOT_TIERS), capp)
    # candidate rows; the "no k-th found -> converge onto +inf -> caller
    # fixup" contract needs k to fit in that minimum scan.
    min_scan = RING_COLS * min(min(SLOT_TIERS), capp)
    assert k <= min_scan, f"k={k} exceeds the smallest tier scan {min_scan}"
    ntiles = -(-gyz // TILE)
    # one extra 128-lane block so the build's lane-ALIGNED widened reads
    # (aligned-down start + rounded-up span) never overrun the slab
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
    # ``seeded`` = the caller certifies (a) the cloud is voxel-unique at
    # ``cell`` with k >= 27, giving d_k >= cell/2 even with a one-cell fp
    # quantization slop (volume bound: (floor(2d/c)+3)^3 >= k+1), and
    # (b) cell is a normal f32 with 16*cell^2 finite (any sane physical
    # cellsize).  The bisection then starts from a 2^25.6-bit window
    # instead of 2^31 — 5 fewer count scans per slot.
    if seeded:
        assert cell is not None, "seeded selection needs the cell size"
        assert k >= 27, "the d_k >= cell/2 volume bound needs k >= 27"
        lo_seed = jax.lax.bitcast_convert_type(
            jnp.square(jnp.asarray(cell, jnp.float32) * 0.499), jnp.int32
        ).reshape(1)
        scalars = jnp.concatenate([t0, lo_seed])
    else:
        scalars = jnp.concatenate([t0, jnp.zeros((1,), jnp.int32)])

    def prep(a):
        at = a[:, :cap].T  # [cap, L0] with an `off`-lane front halo
        at = jnp.pad(
            at,
            ((0, capp - cap), (off_al - off, max(0, lp - at.shape[1] - (off_al - off)))),
            constant_values=_F32_MAX,
        )
        return at[:, :lp]

    plane = jnp.concatenate([prep(xs_g), prep(ys_g), prep(zs_g)], axis=0)

    # ``probe`` selects deliberately-incomplete kernel bodies for the
    # strip-down profiling method (BASELINE.md): "build" skips selection,
    # "bisectN" truncates the bisection to N steps, "nofinal" skips the
    # sum pass.  Anything but "full" returns WRONG results by design.
    kernel = partial(
        _select_kernel, cap=cap, capp=capp, gz=gz, k=k, off=off,
        off_al=off_al, sw=sw, nt_max=ntiles, seeded=seeded, probe=probe,
        mxu_count=mxu_count,
    )
    sums_t, kth_t = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles_run,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec((capp, TILE), _out_index_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((capp, TILE), _out_index_map, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((3 * capp, sw), jnp.float32),
                pltpu.VMEM((3 * RING_COLS * capp, TILE), jnp.float32),
                pltpu.VMEM((RING_COLS * capp, TILE), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((capp, ntiles_run * TILE), jnp.float32),
            jax.ShapeDtypeStruct((capp, ntiles_run * TILE), jnp.float32),
        ),
    )(scalars, plane)
    if full:
        return sums_t[:cap, :gyz].T, kth_t[:cap, :gyz].T
    return sums_t[:cap].T, kth_t[:cap].T
