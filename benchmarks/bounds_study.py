"""Offline study: can cheap per-point kNN mean-distance BOUNDS certify
most keep decisions of the exact outlier stage?  (Round-4 item #1.)

The hybrid-chain idea: compute a cheap upper bound (Morton-window kNN)
and a cheap lower bound on every point's exact mean-kNN distance, derive
a conservative interval for the global threshold tau = mu + mult*sigma,
certify every point whose [lb, ub] interval clears the tau interval, and
route only the ambiguous residue through the expensive exact column-grid
selection.  Viability hinges on the residue fraction phi — this script
measures phi for several bound constructions against the f64 KD-tree
oracle on the exact bench-chain cloud (1M synthetic points downsampled
at the bench cellsize), entirely on CPU.

Bound constructions evaluated (cheapest first):
  ub_win    : Morton sliding-window kNN mean distance (the fast chain's
              stage; candidates are a subset of all points, so the mean
              of its k smallest is >= the true mean).  W=16 and W=32.
  lb_ring   : per-point merge of ring-level column-count profiles
              (counts per Chebyshev ring of the 9x9 column ring, each
              candidate bounded below by its ring's yz rectangle
              distance) — O(81) image ops shared across points.
  lb_rect   : per-column rectangle-distance lower bound (same counts,
              but each of the 81 columns keeps its own yz rect distance;
              per-point sort of 81 (lb, count) pairs).
  ring2     : exact distances to the 5x5 inner-ring candidates plus
              virtual candidates at the rect lb for the outer columns
              (both a tighter lb and a tighter ub in one structure).

Run: JAX_PLATFORMS=cpu python benchmarks/bounds_study.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 30
MULT = 1.0
CELL = 2.0 / 1000 * 2.0  # bench cellsize
GY, GZ, CAP = 504, 152, 28
M = 4  # ring radius


def bench_cloud():
    import jax.numpy as jnp

    from cwipc_util_tpu.models.synthetic import _generate
    from cwipc_util_tpu.ops import voxelize

    buf = _generate(1000, 1000, 1 << 20, jnp.float32(0.5))
    x, y, z, rgba, cnt = voxelize.downsample_cm(buf, jnp.float32(CELL), 229376)
    n = int(cnt)
    return (np.asarray(x[:n], np.float64), np.asarray(y[:n], np.float64),
            np.asarray(z[:n], np.float64))


def oracle_md(xyz):
    from scipy.spatial import cKDTree

    t = cKDTree(xyz)
    d, _ = t.query(xyz, k=K + 1, workers=-1)
    return d[:, 1:].mean(axis=1)


def window_bounds(xyz, w):
    """Morton-window kNN: mean of k smallest (ub on md) + k-th (ub on d_k).
    xyz must be in the chain's Morton order (it is: downsample_cm emits
    Morton-sorted voxels)."""
    n = xyz.shape[0]
    d2 = np.full((2 * w, n), np.inf, np.float64)
    r = 0
    for off in range(-w, w + 1):
        if off == 0:
            continue
        sl_q = slice(max(0, -off), n - max(0, off))
        sl_c = slice(max(0, off), n + min(0, off))
        d2[r, sl_q] = ((xyz[sl_q] - xyz[sl_c]) ** 2).sum(axis=1)
        r += 1
    d2.sort(axis=0)
    kk = min(K, 2 * w)
    dk = np.sqrt(d2[:kk])
    return dk.mean(axis=0), dk[-1]


def build_cols(y, z):
    cy = np.floor(y / CELL).astype(np.int64)
    cz = np.floor(z / CELL).astype(np.int64)
    cy -= cy.min()
    cz -= cz.min()
    counts = np.zeros((cy.max() + 1, cz.max() + 1), np.int64)
    np.add.at(counts, (cy, cz), 1)
    fy = y / CELL - np.floor(y / CELL)
    fz = z / CELL - np.floor(z / CELL)
    return cy, cz, fy, fz, counts


def rect_lb(fy, fz, dy, dz):
    """yz distance lower bound from query (fy, fz in [0,1)) to the unit
    cell at offset (dy, dz), in cells."""
    ly = np.where(dy > 0, dy - fy, np.where(dy < 0, fy - dy - 1, 0.0))
    lz = np.where(dz > 0, dz - fz, np.where(dz < 0, fz - dz - 1, 0.0))
    return np.sqrt(ly * ly + lz * lz)


def lb_from_profiles(lbs, cnts, self_col0):
    """md lower bound: merge (lb, count) candidate buckets, take k
    cheapest.  lbs/cnts: [n, ncols(+1 virtual)]; the first column must be
    the query's own (lb 0) with self excluded by the caller."""
    order = np.argsort(lbs, axis=1, kind="stable")
    lbs_s = np.take_along_axis(lbs, order, axis=1)
    cnts_s = np.take_along_axis(cnts, order, axis=1)
    cum = np.cumsum(cnts_s, axis=1)
    prev = np.concatenate([np.zeros((lbs.shape[0], 1), np.int64), cum[:, :-1]], axis=1)
    take = np.clip(K - prev, 0, cnts_s)
    return (lbs_s * take).sum(axis=1) / K


def interval_tau(lb, ub, mult):
    """Conservative [tau_lo, tau_hi] from per-point md intervals."""
    n = lb.shape[0]
    mu_lo, mu_hi = lb.mean(), ub.mean()
    # E[md^2] in [mean(lb^2), mean(ub^2)]; var = (sq - s^2/n)/(n-1)
    sq_lo, sq_hi = (lb * lb).sum(), (ub * ub).sum()
    s_lo, s_hi = lb.sum(), ub.sum()
    var_hi = (sq_hi - s_lo * s_lo / n) / (n - 1)
    var_lo = max(0.0, (sq_lo - s_hi * s_hi / n) / (n - 1))
    return mu_lo + mult * np.sqrt(var_lo), mu_hi + mult * np.sqrt(var_hi)


def evaluate(name, lb, ub, md_true, mult=MULT, iterate=True):
    lb = np.minimum(lb, ub)
    assert (lb <= md_true + 1e-12).all(), f"{name}: lb unsound"
    assert (ub >= md_true - 1e-12).all(), f"{name}: ub unsound"
    tau_lo, tau_hi = interval_tau(lb, ub, mult)
    certified = (ub <= tau_lo) | (lb > tau_hi)
    phi = 1.0 - certified.mean()
    gap = (ub - lb) / np.maximum(md_true, 1e-12)
    n = lb.shape[0]
    tau_true = md_true.mean() + mult * md_true.std(ddof=1)
    print(f"{name:18s} gap(med/mean/p95)={np.median(gap):.3f}/{gap.mean():.3f}/"
          f"{np.percentile(gap, 95):.3f}  tau=[{tau_lo:.6f},{tau_hi:.6f}] "
          f"(true {tau_true:.6f})  phi={phi*100:.2f}%")
    if iterate:
        # round 2: residue gets exact md; tau interval recomputed
        lb2, ub2 = lb.copy(), ub.copy()
        resid = ~certified
        lb2[resid] = md_true[resid]
        ub2[resid] = md_true[resid]
        t2lo, t2hi = interval_tau(lb2, ub2, mult)
        und2 = (~((ub2 <= t2lo) | (lb2 > t2hi))).sum()
        # round 3
        c2 = (ub2 <= t2lo) | (lb2 > t2hi)
        lb3, ub3 = lb2.copy(), ub2.copy()
        lb3[~c2] = md_true[~c2]
        ub3[~c2] = md_true[~c2]
        t3lo, t3hi = interval_tau(lb3, ub3, mult)
        und3 = (~((ub3 <= t3lo) | (lb3 > t3hi))).sum()
        print(f"{'':18s} after-exact round2: tau=[{t2lo:.6f},{t2hi:.6f}] "
              f"undecided={und2} ({und2/n*100:.3f}%); round3 undecided={und3}")
    return phi


def main():
    t0 = time.time()
    x, y, z = bench_cloud()
    xyz = np.stack([x, y, z], axis=1)
    n = xyz.shape[0]
    print(f"cloud: {n} voxels ({time.time()-t0:.1f}s)")

    md_true = oracle_md(xyz)
    tau_true = md_true.mean() + MULT * md_true.std(ddof=1)
    keep_rate = (md_true <= tau_true).mean()
    margins = np.abs(md_true - tau_true) / tau_true
    print(f"oracle: tau={tau_true:.6f} keep={keep_rate*100:.2f}% "
          f"min-margin={margins.min():.2e} "
          f"margins<1e-3: {(margins < 1e-3).mean()*100:.2f}% "
          f"<1e-2: {(margins < 1e-2).mean()*100:.2f}% "
          f"({time.time()-t0:.1f}s)")
    print(f"md_true: mean={md_true.mean():.6f} ({md_true.mean()/CELL:.2f}c) "
          f"sigma={md_true.std(ddof=1):.6f}")

    cy, cz, fy, fz, counts = build_cols(y, z)
    print(f"grid: {counts.shape} max-col={counts.max()} "
          f"mean-occupied={counts[counts > 0].mean():.2f}")

    # --- windows ---
    for w in (16, 32):
        ub, kth = window_bounds(xyz, w)
        over = (ub - md_true) / np.maximum(md_true, 1e-12)
        exact_f = (np.abs(ub - md_true) < 1e-9).mean()
        print(f"win W={w}: ub-overshoot med={np.median(over):.4f} "
              f"mean={over.mean():.4f} p95={np.percentile(over,95):.4f} "
              f"exact={exact_f*100:.1f}%")
        if w == 16:
            ub16 = ub
        else:
            ub32 = ub

    # --- lb constructions ---
    offs = [(dy, dz) for dy in range(-M, M + 1) for dz in range(-M, M + 1)]
    gpad = np.zeros((counts.shape[0] + 2 * M, counts.shape[1] + 2 * M), np.int64)
    gpad[M:-M, M:-M] = counts

    # per-point per-column counts + rect lbs
    col_cnt = np.empty((n, len(offs) + 1), np.int64)
    col_lb = np.empty((n, len(offs) + 1), np.float64)
    ring_of = {}
    for j, (dy, dz) in enumerate(offs):
        col_cnt[:, j] = gpad[cy + dy + M, cz + dz + M]
        col_lb[:, j] = rect_lb(fy, fz, dy, dz) * CELL
        ring_of[j] = max(abs(dy), abs(dz))
        if dy == 0 and dz == 0:
            col_cnt[:, j] -= 1  # self
    col_cnt[:, -1] = K  # virtual outside-ring bucket
    col_lb[:, -1] = M * CELL  # Chebyshev >= 5 columns: yz >= 4c

    lb_rect_v = lb_from_profiles(col_lb, col_cnt, 0)

    # ring-level variant: counts aggregated per ring, lb = (ring-1)*c
    rings = np.zeros((n, M + 2), np.int64)
    for j in range(len(offs)):
        rings[:, ring_of[j]] += col_cnt[:, j]
    rings[:, -1] = K
    ring_lbs = np.tile(
        np.array([0.0, 0.0, 1.0, 2.0, 3.0, 4.0]) * CELL, (n, 1)
    )
    lb_ring_v = lb_from_profiles(ring_lbs, rings, 0)

    print(f"lb_ring: lb/true med={np.median(lb_ring_v/md_true):.3f}")
    print(f"lb_rect: lb/true med={np.median(lb_rect_v/md_true):.3f}")

    evaluate("win16+lb_ring", lb_ring_v, ub16, md_true)
    evaluate("win16+lb_rect", lb_rect_v, ub16, md_true)
    evaluate("win32+lb_rect", lb_rect_v, ub32, md_true)

    # --- ring2: exact inner 5x5 distances + virtual outer ---
    # slot grid for gathering candidates
    order = np.lexsort((np.floor(x / CELL).astype(np.int64), cz, cy))
    scy, scz = cy[order], cz[order]
    colid = scy * (cz.max() + 1) + scz
    newc = np.ones(n, bool)
    newc[1:] = colid[1:] != colid[:-1]
    runstart = np.maximum.accumulate(np.where(newc, np.arange(n), 0))
    rank = np.arange(n) - runstart
    assert rank.max() < CAP
    ny, nz = counts.shape
    slotsx = np.full((ny + 2 * M, nz + 2 * M, CAP), np.inf)
    slotsy = np.full_like(slotsx, np.inf)
    slotsz = np.full_like(slotsx, np.inf)
    sx, sy_, sz_ = x[order], y[order], z[order]
    slotsx[scy + M, scz + M, rank] = sx
    slotsy[scy + M, scz + M, rank] = sy_
    slotsz[scy + M, scz + M, rank] = sz_
    slot_of = np.empty(n, np.int64)
    slot_of[order] = rank

    for RI in (1, 2):
        inner = [(dy, dz) for dy in range(-RI, RI + 1) for dz in range(-RI, RI + 1)]
        ub_r = np.empty(n)
        lb_r = np.empty(n)
        chunk = 32768
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            m = c1 - c0
            d2 = np.full((m, len(inner) * CAP), np.inf)
            for j, (dy, dz) in enumerate(inner):
                ddx = slotsx[cy[c0:c1] + dy + M, cz[c0:c1] + dz + M] - x[c0:c1, None]
                ddy = slotsy[cy[c0:c1] + dy + M, cz[c0:c1] + dz + M] - y[c0:c1, None]
                ddz = slotsz[cy[c0:c1] + dy + M, cz[c0:c1] + dz + M] - z[c0:c1, None]
                d2j = ddx * ddx + ddy * ddy + ddz * ddz
                if dy == 0 and dz == 0:
                    d2j[np.arange(m), slot_of[c0:c1]] = np.inf
                d2[:, j * CAP:(j + 1) * CAP] = d2j
            d2.sort(axis=1)
            dists = np.sqrt(d2[:, :K])
            # ub: outer candidates treated as absent (inf) — need >= K real
            ub_r[c0:c1] = np.where(
                np.isfinite(dists).all(axis=1), dists.mean(axis=1), np.inf
            )
            # lb: merge exact inner dists with virtual outer candidates
            outer = [j for j, (dy, dz) in enumerate(offs)
                     if max(abs(dy), abs(dz)) > RI]
            v_lb = np.concatenate(
                [np.where(np.isfinite(dists), dists, M * CELL),
                 col_lb[c0:c1][:, outer],
                 np.full((m, 1), M * CELL)], axis=1)
            v_ct = np.concatenate(
                [np.ones((m, K), np.int64),
                 col_cnt[c0:c1][:, outer],
                 np.full((m, 1), K, np.int64)], axis=1)
            lb_r[c0:c1] = lb_from_profiles(v_lb, v_ct, 0)
        ub_r = np.minimum(ub_r, ub16)
        evaluate(f"ring{RI}+virtual", lb_r, ub_r, md_true)

    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
