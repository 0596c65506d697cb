"""Cross-cloud nearest-neighbor search on TPU (grid-bucketed, two-scale).

The registration toolkit's inner kernel: for every point of a source cloud,
the nearest point of a reference cloud within a maximum correspondence
distance.  The reference uses scipy KDTree / Open3D searches
(reference: python/cwipc/registration/analyze.py:116-123,
registration/fine.py ICP correspondence); here the reference cloud is
bucketed on a grid, sorted once per scale, and each source point scans the
3x3x3 cell ring.

A single grid scale with bounded per-cell candidates can miss the true
neighbor in pathologically dense cells (e.g. the synthetic body's apex,
where a whole ring of points collapses to one spot).  Two scales fix this:

* a FINE pass (cell = max_distance/8) resolves near matches exactly — and a
  dense region by definition has a near neighbor, so overflow there is
  harmless;
* a COARSE pass (cell = max_distance) guarantees ring coverage of the full
  correspondence radius for sparse regions, where cells cannot overflow.

The per-point minimum over both passes is returned.  Matches beyond the
radius report distance +inf / index -1 ("no correspondence"), exactly the
semantics ICP and the analyzers need.  All access patterns are sorts +
bounded gathers; no host KD-tree.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_SENTINEL = jnp.iinfo(jnp.int32).max
_F32_MAX = jnp.finfo(jnp.float32).max

_AXIS_BITS = 10
_AXIS_MAX = (1 << _AXIS_BITS) - 1

FINE_FACTOR = 8.0


def _nn_prepare(ref_xyz, rvalid, ridx, cell):
    """Reference-side preparation for one grid scale: cell keys, the key
    sort and the gathered coordinates.  Loop-invariant for iterative
    callers (ICP re-queries a MOVING source against a FIXED reference
    every iteration — re-sorting the reference per iteration would put
    two sorts and a large gather inside the loop body, which is what made
    the round-3 fused-ICP program impossible to compile remotely)."""
    rv = jnp.floor(ref_xyz / cell).astype(jnp.int32)
    vmin = jnp.min(jnp.where(rvalid[:, None], rv, _SENTINEL), axis=0)
    vmin = jnp.where(vmin == _SENTINEL, 0, vmin)
    vc = jnp.clip(rv - vmin[None, :], 0, _AXIS_MAX)
    rkey = (vc[:, 0] << (2 * _AXIS_BITS)) | (vc[:, 1] << _AXIS_BITS) | vc[:, 2]
    rkey = jnp.where(rvalid, rkey, _SENTINEL)
    srkey, sridx = jax.lax.sort((rkey, ridx), num_keys=1)
    srxyz = ref_xyz[sridx]
    return srkey, sridx, srxyz, vmin


def _nn_query(
    src_xyz: jax.Array,
    sv_valid: jax.Array,
    prep,
    cell: jax.Array,
    radius: jax.Array,
    cell_cap: int,
    block: int,
):
    """Query one prepared grid scale: NN within `radius`, candidates from
    the 3x3x3 cell ring (exact when radius <= cell and cells don't
    overflow)."""
    scap = src_xyz.shape[0]
    srkey, sridx, srxyz, vmin = prep
    rcap = srxyz.shape[0]

    sv = jnp.clip(
        jnp.floor(src_xyz / cell).astype(jnp.int32) - vmin[None, :],
        0, _AXIS_MAX,
    )

    off = jnp.arange(-1, 2, dtype=jnp.int32)
    ox, oy, oz = jnp.meshgrid(off, off, off, indexing="ij")
    offsets = jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)  # [27,3]

    nblocks = scap // block if scap % block == 0 else scap // block + 1
    pad = nblocks * block

    def row_block(start):
        bxyz = jax.lax.dynamic_slice(src_xyz, (start, 0), (block, 3))
        bv = jax.lax.dynamic_slice(sv, (start, 0), (block, 3))

        nb = bv[:, None, :] + offsets[None, :, :]
        in_grid = jnp.all((nb >= 0) & (nb <= _AXIS_MAX), axis=-1)
        nb_key = (nb[..., 0] << (2 * _AXIS_BITS)) | (nb[..., 1] << _AXIS_BITS) | nb[..., 2]
        lo = jnp.searchsorted(srkey, nb_key.ravel(), side="left").reshape(block, 27)
        hi = jnp.searchsorted(srkey, nb_key.ravel(), side="right").reshape(block, 27)
        hi = jnp.where(in_grid, hi, lo)

        cand = lo[:, :, None] + jnp.arange(cell_cap, dtype=jnp.int32)[None, None, :]
        cand_ok = cand < hi[:, :, None]
        cand = jnp.clip(cand, 0, rcap - 1).reshape(block, 27 * cell_cap)
        cand_ok = cand_ok.reshape(block, 27 * cell_cap)

        cxyz = srxyz[cand]
        diff = cxyz - bxyz[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(cand_ok, d2, _F32_MAX)
        best = jnp.argmin(d2, axis=-1)
        best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
        best_ridx = jnp.take_along_axis(sridx[cand], best[:, None], axis=-1)[:, 0]
        dist = jnp.sqrt(jnp.maximum(best_d2, 0.0))
        found = (best_d2 < _F32_MAX / 2) & (dist <= radius)
        return jnp.where(found, dist, jnp.inf), jnp.where(found, best_ridx, -1)

    starts = jnp.arange(nblocks, dtype=jnp.int32) * block
    dists, idxs = jax.lax.map(row_block, starts)
    return dists.reshape(pad)[:scap], idxs.reshape(pad)[:scap]


def _nn_pass(
    src_xyz: jax.Array,
    sv_valid: jax.Array,
    ref_xyz: jax.Array,
    rvalid: jax.Array,
    ridx: jax.Array,
    cell: jax.Array,
    radius: jax.Array,
    cell_cap: int,
    block: int,
):
    """One grid scale end-to-end: prepare the reference, then query."""
    prep = _nn_prepare(ref_xyz, rvalid, ridx, cell)
    return _nn_query(src_xyz, sv_valid, prep, cell, radius, cell_cap, block)


@partial(jax.jit, static_argnames=("cell_cap", "block"))
def nn_search(
    src_xyz: jax.Array,
    src_count: jax.Array,
    ref_xyz: jax.Array,
    ref_count: jax.Array,
    max_distance: jax.Array,
    cell_cap: int = 48,
    block: int = 4096,
):
    """For each source point: (distance, ref index) of the nearest reference
    point within max_distance; (+inf, -1) when there is none.

    Returns (dist f32[src_cap], idx i32[src_cap]); padding slots get
    (+inf, -1) as well.
    """
    scap = src_xyz.shape[0]
    block = min(block, scap)
    maxd = jnp.maximum(jnp.asarray(max_distance, jnp.float32), 1e-9)

    sidx = jnp.arange(scap, dtype=jnp.int32)
    ridx = jnp.arange(ref_xyz.shape[0], dtype=jnp.int32)
    svalid = sidx < src_count
    rvalid = ridx < ref_count

    # fine pass: exact for matches within maxd/FINE_FACTOR
    fine_cell = maxd / FINE_FACTOR
    d_f, i_f = _nn_pass(
        src_xyz, svalid, ref_xyz, rvalid, ridx, fine_cell, fine_cell, cell_cap, block
    )
    # coarse pass: full-radius coverage
    d_c, i_c = _nn_pass(
        src_xyz, svalid, ref_xyz, rvalid, ridx, maxd, maxd, cell_cap, block
    )

    take_fine = d_f <= d_c
    dist = jnp.where(take_fine, d_f, d_c)
    idx = jnp.where(take_fine, i_f, i_c)
    dist = jnp.where(svalid, dist, jnp.inf)
    idx = jnp.where(svalid, idx, -1)
    return dist, idx


# ---------------------------------------------------------------------------
# Column-grid NN (accelerator path): ops/pallas_nn.py wiring
# ---------------------------------------------------------------------------


def _ring_offsets(gz: int) -> jnp.ndarray:
    from .pallas_cols_select import _M

    return jnp.asarray(
        [
            dy * gz + dz
            for dy in range(-_M, _M + 1)
            for dz in range(-_M, _M + 1)
            if max(abs(dy) - 1, 0) ** 2 + max(abs(dz) - 1, 0) ** 2 < _M * _M
        ],
        jnp.int32,
    )


def nn_grid_prepare(ref_xyz, ref_count, cell, *, gy, gz, cap, vmin):
    """Reference-side grid build for the column-grid NN (loop-invariant
    for ICP).  Returns (channel planes, slot_orig, drop_ring)."""
    from .cols_knn import _cols_build

    xs, ys, zs, slot_orig, _valid, drop_ring, _ps = _cols_build(
        ref_xyz, ref_count, cell, gy=gy, gz=gz, cap=cap, chunk=256,
        vmin_override=vmin,
    )
    return xs, ys, zs, slot_orig, drop_ring


def nn_grid_query(
    src_xyz, src_count, prep, cell, maxd, *, gy, gz, cap_r, cap_q, vmin,
    interpret: bool = False,
):
    """Nearest reference point within ``maxd`` for every source point via
    the column-grid kernel (exact — see ops/pallas_nn.py), plus an exact
    brute-force fixup for the residual queries the grid cannot certify
    (out-of-grid / rank-dropped queries, and queries whose ring touches a
    dropped reference column).  Returns (dist [scap], idx [scap]):
    (+inf, -1) where there is no reference within maxd."""
    from .cols_knn import _cols_build
    from .pallas_nn import nn_select_pallas

    r_xs, r_ys, r_zs, r_orig, r_drop = prep
    q_xs, q_ys, q_zs, q_orig, _qv, _qd, q_point_slot = _cols_build(
        src_xyz, src_count, cell, gy=gy, gz=gz, cap=cap_q, chunk=256,
        vmin_override=vmin,
    )
    d2m, cid = nn_select_pallas(
        r_xs, r_ys, r_zs, q_xs, q_ys, q_zs,
        gy=gy, gz=gz, cap_r=cap_r, cap_q=cap_q, interpret=interpret,
    )

    gyz = gy * gz
    capp_r = -(-cap_r // 8) * 8
    scap = src_xyz.shape[0]
    slots_q = gyz * cap_q
    d2f = d2m.reshape(slots_q)
    cidf = cid.reshape(slots_q)
    plane_row = jnp.arange(slots_q, dtype=jnp.int32) // cap_q

    offs = _ring_offsets(gz)
    jblk = jnp.clip(cidf // capp_r, 0, offs.shape[0] - 1)
    row = cidf - (cidf // capp_r) * capp_r
    found = cidf != jnp.iinfo(jnp.int32).max
    ref_slot = (plane_row + offs[jblk]) * cap_r + jnp.clip(row, 0, cap_r - 1)
    ref_slot = jnp.clip(ref_slot, 0, gyz * cap_r - 1)
    ref_idx = jnp.where(found, r_orig[ref_slot], -1)
    dist_slot = jnp.sqrt(jnp.maximum(d2f, 0.0))
    ok = found & (dist_slot <= maxd) & (ref_idx >= 0)
    dist_slot = jnp.where(ok, dist_slot, jnp.inf)
    ref_idx = jnp.where(ok, ref_idx, -1)

    # queries whose ring saw a dropped reference column are untrustworthy
    tainted = jnp.repeat(r_drop, cap_q, total_repeat_length=slots_q)

    # scatter back to source order; queries without a slot stay unresolved
    q_of = q_orig  # [gyz*cap_q] -> source index or -1
    okq = q_of >= 0
    tgt = jnp.where(okq, q_of, scap)
    dist = jnp.full((scap + 1,), jnp.inf, jnp.float32).at[tgt].set(
        jnp.where(okq, dist_slot, jnp.inf)
    )[:scap]
    idx = jnp.full((scap + 1,), -1, jnp.int32).at[tgt].set(
        jnp.where(okq, ref_idx, -1)
    )[:scap]
    resolved = jnp.zeros((scap + 1,), bool).at[tgt].set(
        jnp.where(okq, jnp.logical_not(tainted), False)
    )[:scap]

    svalid = jnp.arange(scap, dtype=jnp.int32) < src_count
    need_fix = svalid & jnp.logical_not(resolved)
    return dist, idx, need_fix


@partial(jax.jit, static_argnames=("block",))
def bruteforce_nn_subset(
    src_xyz, src_count, sel, ref_xyz, ref_count, maxd, block: int = 256
):
    """Exact NN for the selected source rows only (compacted blocks, like
    cols_knn.bruteforce_md_subset).  Returns (dist, idx) with (+inf, -1)
    for non-selected rows and beyond-radius results."""
    scap = src_xyz.shape[0]
    rcap = ref_xyz.shape[0]
    block = min(block, scap)
    sidx = jnp.arange(scap, dtype=jnp.int32)
    svalid = sidx < src_count
    sel = sel & svalid
    rvalid = jnp.arange(rcap, dtype=jnp.int32) < ref_count
    col_mask = jnp.where(rvalid, 0.0, _F32_MAX)

    pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
    n_sel = jnp.maximum(pos[-1] + 1, 0)
    ilist = (
        jnp.full((scap + 1,), -1, jnp.int32)
        .at[jnp.where(sel, pos, scap)]
        .set(jnp.where(sel, sidx, -1))[:scap]
    )

    def row_block(b, acc):
        dacc, iacc = acc
        bidx = jax.lax.dynamic_slice(ilist, (b * block,), (block,))
        bval = bidx >= 0
        bidx_c = jnp.maximum(bidx, 0)
        rows = src_xyz[bidx_c]
        # direct subtraction, NOT the |a|^2+|b|^2-2ab matmul expansion:
        # the expansion's cancellation noise (~1e-6 relative) would make
        # fallback distances disagree with the kernel's direct form
        d = rows[:, None, :] - ref_xyz[None, :, :]
        diff2 = jnp.sum(d * d, axis=-1) + col_mask[None, :]
        best = jnp.argmin(diff2, axis=-1).astype(jnp.int32)
        bd = jnp.sqrt(jnp.take_along_axis(diff2, best[:, None], axis=-1)[:, 0])
        ok = (bd <= maxd) & bval
        tgt = jnp.where(bval, bidx, scap)
        dacc = dacc.at[tgt].set(jnp.where(ok, bd, jnp.inf))
        iacc = iacc.at[tgt].set(jnp.where(ok, best, -1))
        return dacc, iacc

    nblk = -(-n_sel // block)
    d0 = jnp.full((scap + 1,), jnp.inf, jnp.float32)
    i0 = jnp.full((scap + 1,), -1, jnp.int32)
    d, i = jax.lax.fori_loop(0, nblk, row_block, (d0, i0))
    return d[:scap], i[:scap]


def nn_grid_params(src_np, ref_np, maxd: float, budget: int = 8_000_000,
                   cap_max: int = 128,
                   fallback_budget: float = 2e9):
    """Host-side grid parameter choice for the column-grid NN: cell =
    maxd/3.5 (ring coverage of the full radius — ops/pallas_nn.py),
    percentile-clipped extents over BOTH clouds plus a motion margin (ICP
    moves the source; strays fall back exactly), bucketed dims/caps so
    repeat registrations reuse compiled programs.  The COLUMN axis is
    chosen per scene (min slot volume): a flat sheet seen along the wrong
    axis puts whole level-set curves into single columns.

    Column caps need NOT cover the densest column: capacity overflow is
    exact-by-construction (over-cap reference columns raise _cols_build's
    drop_ring and every query whose ring touches one goes through the
    caller's brute-force fixup), so dense scenes pick the smallest cap
    whose estimated fixup work — tainted-ring dilation by 2*_M, the same
    radius _cols_build uses — stays under ``fallback_budget`` query*ref
    element ops.  Round-5 motivation: `cwipc register`'s aligner runs at
    auto-correspondence ~0.14 m on human-scale scenes, whose 4 cm cells
    hold 250-350 points; the old max-occupancy rule rejected every axis
    and fell back to the two-scale path (18 s/run vs 0.3 s grid — the
    whole multicamera wall).

    Returns (perm, gy, gz, cap_r, cap_q, origin_cells int32[3]) —
    coordinates and origin in PERMUTED axis order (grid x = cloud axis
    perm[0]) — or None when no axis fits the budgets (caller keeps the
    two-scale path)."""
    import numpy as np

    from .cols_knn import _M

    if maxd <= 0 or len(src_np) == 0 or len(ref_np) == 0:
        return None
    cell = float(maxd) / 3.5
    pts = np.concatenate([src_np, ref_np], axis=0)
    lo_a = np.percentile(pts, 0.5, axis=0)
    hi_a = np.percentile(pts, 99.5, axis=0)
    margin = 8  # cells: source motion + clip slack

    def bucket(v, mults):
        for m in mults:
            if v <= m:
                return m
        return None

    # kernel VMEM: candidate scratch 3*77*cap_r*128 f32 dominates; keep
    # comfortably under the v5e's physical 128 MB with room for
    # double-buffered outputs (the kernel raises the scoped limit).  The
    # ladder tops out at 128 on COMPILE cost, not VMEM: the kernel's top
    # tier unrolls the 77-column ring over cap_r rows, and a cap-256 tier
    # (19712-row scratch) did not finish its remote compile in 9 minutes
    # — while cap 128 + brute-force fixup of the overflow is both
    # bounded-compile and FASTER per iteration (the fixup is a dense
    # [n_fb, rcap] subtract, the extra tier doubles every dense tile's
    # scan).
    cap_ladder = tuple(
        c for c in (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)
        if c <= cap_max and 3 * 77 * c * 128 * 4 <= 60 * (1 << 20)
    )

    best = None
    for perm in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        p = list(perm)
        lo = lo_a[p]
        hi = hi_a[p]
        origin = np.floor(lo / cell).astype(np.int64) - margin
        ext = np.floor(hi / cell).astype(np.int64) - origin + 1 + margin
        # coarse dim ladder: registration flows run MANY (src, ref) pairs
        # with slightly different extents, and every distinct (gy, gz)
        # compiles its own kernel — generous buckets trade a few empty
        # tiles for program-cache hits
        gy = bucket(int(ext[1]), (32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024))
        gz = bucket(int(ext[2]), (32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024))
        if gy is None or gz is None or gy * gz > 1_000_000:
            continue  # (the int32 sort-key limit in _cols_build)

        def col_occ(cloud):
            """(occupancy image [gy, gz], out-of-grid count)."""
            v = np.floor(cloud[:, p] / cell).astype(np.int64) - origin
            inb = (
                (v[:, 1] >= 0) & (v[:, 1] < gy)
                & (v[:, 2] >= 0) & (v[:, 2] < gz)
            )
            occ = np.zeros((gy, gz), np.int64)
            np.add.at(occ, (v[inb, 1], v[inb, 2]), 1)
            return occ, v, inb

        occ_r, vr, rin = col_occ(ref_np)
        occ_q, vq, qin = col_occ(src_np)
        max_r = int(occ_r.max()) if occ_r.size else 0
        max_q = int(occ_q.max()) if occ_q.size else 0
        cap_r = bucket(max(max_r, 1), cap_ladder) or cap_ladder[-1]
        cap_q = bucket(max(max_q, 1), cap_ladder) or cap_ladder[-1]

        # estimate the brute-force fixup volume this cap choice implies:
        # over-cap or out-of-extent reference columns taint their whole
        # dilated ring (exactly _cols_build._drop_ring's 2*_M box), plus
        # source points that are themselves out of grid or rank-dropped
        drop = occ_r > cap_r
        if (~rin).any():
            by = np.clip(vr[~rin, 1], 0, gy - 1)
            bz = np.clip(vr[~rin, 2], 0, gz - 1)
            drop[by, bz] = True
        if drop.any():
            f = drop
            for ax in (0, 1):
                base = f
                for j in range(1, 2 * _M + 1):
                    f = f | np.roll(base, j, ax) | np.roll(base, -j, ax)
            q_tainted = f[np.clip(vq[:, 1], 0, gy - 1),
                          np.clip(vq[:, 2], 0, gz - 1)] | ~qin
            n_fb = int(q_tainted.sum())
        else:
            n_fb = int((~qin).sum())
        if occ_q.max(initial=0) > cap_q:
            over_q = occ_q[np.clip(vq[:, 1], 0, gy - 1),
                           np.clip(vq[:, 2], 0, gz - 1)] > cap_q
            n_fb = min(len(src_np), n_fb + int(over_q.sum()))
        fb_work = float(n_fb) * len(ref_np)
        if fb_work > fallback_budget:
            continue

        vol = gy * gz * max(cap_r, cap_q)
        if vol > budget:
            continue
        # prefer axes that avoid fixups — n_fb outranks slot volume: the
        # fixup is O(n_fb * rcap) EVERY iteration while vol only sizes
        # the (cheap, tiered) kernel scan; bucket n_fb a little so near
        # -ties fall through to the volume comparison
        key = (n_fb // max(1, len(src_np) // 50), vol)
        if best is None or key < best[0]:
            best = (key, perm, gy, gz, cap_r, cap_q, origin.astype(np.int32))
    if best is None:
        return None
    return best[1:]


@partial(jax.jit, static_argnames=("perm", "gy", "gz", "cap_r", "cap_q"))
def _nn_grid_full(src_xyz, src_count, ref_xyz, ref_count, maxd, vmin,
                  *, perm, gy, gz, cap_r, cap_q):
    """One-shot grid NN (kernel + exact fallback), the jitted body behind
    nn_search_host_auto."""
    pidx = list(perm)
    cell = maxd * jnp.float32(1.0 / 3.5)
    prep = nn_grid_prepare(
        ref_xyz[:, pidx], ref_count, cell, gy=gy, gz=gz, cap=cap_r, vmin=vmin
    )
    d, i, fix = nn_grid_query(
        src_xyz[:, pidx], src_count, prep, cell, maxd,
        gy=gy, gz=gz, cap_r=cap_r, cap_q=cap_q, vmin=vmin,
    )
    fd, fi = bruteforce_nn_subset(src_xyz, src_count, fix, ref_xyz, ref_count, maxd)
    d = jnp.where(fix, fd, d)
    i = jnp.where(fix, fi, i)
    svalid = jnp.arange(src_xyz.shape[0], dtype=jnp.int32) < src_count
    return jnp.where(svalid, d, jnp.inf), jnp.where(svalid, i, -1)


def nn_search_host_auto(src_xyz, src_count, ref_xyz, ref_count, maxd):
    """Host-level NN dispatcher: the gather-free column-grid kernel when
    an accelerator is the default device and the scene fits a grid
    (ops/pallas_nn.py — measured ~100x the two-scale gather path for
    in-loop ICP queries), else the two-scale XLA path.  Host-level
    because the grid parameters are static shapes chosen from the
    concrete clouds.  CWIPC_GRID_NN=0 forces the two-scale path."""
    import os

    import numpy as np

    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    if platform != "cpu" and os.environ.get("CWIPC_GRID_NN", "") != "0":
        sn, rn = int(src_count), int(ref_count)
        # Size gate, default 0 (grid whenever the scene fits a grid):
        # the round-4 value of 32k existed only to dodge per-shape remote
        # kernel compiles, which the persistent compilation cache
        # (core/compile_cache.py) turned into a once-per-machine cost —
        # re-measured round 5 with warm caches, the grid kernel is 55x
        # faster than the two-scale path even at 10-20k points (fused
        # 30-iteration ICP: 0.32 s vs 17.9 s on the v5e, identical
        # poses).  CWIPC_GRID_NN_MIN restores a threshold if wanted.
        gate = int(os.environ.get("CWIPC_GRID_NN_MIN", "0"))
        if sn and rn and max(sn, rn) >= gate:
            params = nn_grid_params(
                np.asarray(src_xyz, np.float32)[:sn],
                np.asarray(ref_xyz, np.float32)[:rn], float(maxd),
            )
            if params is not None:
                perm, gy, gz, cap_r, cap_q, origin = params
                return _nn_grid_full(
                    src_xyz, jnp.int32(src_count), ref_xyz,
                    jnp.int32(ref_count), jnp.float32(maxd),
                    jnp.asarray(origin, jnp.int32),
                    perm=perm, gy=gy, gz=gz, cap_r=cap_r, cap_q=cap_q,
                )
    return nn_search(
        src_xyz, src_count, ref_xyz, ref_count, jnp.float32(maxd)
    )
