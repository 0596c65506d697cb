"""Host-side design loop for the EXACT outlier stage (round 3).

Question: can window-kNN + a per-point coverage certificate + a small
brute-force fallback reproduce the exact (brute-force) kNN mean distances
on the bench cloud, with a fallback set small enough to be cheap?

Certificate: the window of point i covers exactly the occupied voxels
whose Morton key lies in [key[i-W], key[i+W]].  Let d_out(i) be the
distance from point i to the nearest CELL (occupied or not) whose key is
outside that interval.  If the window found >= k candidates and the k-th
candidate distance d_k_win(i) < d_out(i), then no point outside the
window can be among the true k nearest, so the window result is exact.

d_out is computed from the octree-path decomposition of {key < klo} and
{key > khi}: each is a union of <= 7 aligned cubes per octree level, and
the distance from a point to an aligned cube is a clamp per axis.

Everything here is numpy/scipy on the host; the TPU kernel comes after
the numbers say the design works.
"""

import numpy as np
from scipy.spatial import cKDTree

K = 30
MULT = 1.0


def generate(hsteps=1000, asteps=1000):
    hi = np.arange(hsteps, dtype=np.float32)[:, None]
    ai = np.arange(asteps, dtype=np.float32)[None, :]
    height = np.broadcast_to(hi * (2.0 / hsteps), (hsteps, asteps))
    a = np.broadcast_to(ai * (2.0 * np.pi / asteps), (hsteps, asteps))
    radius = 0.3 * np.power(np.abs(np.cos(height * np.pi / 3 - np.pi / 6)), 0.71)
    x = radius * np.sin(a)
    y = radius * np.cos(a)
    xyz = np.stack([-x, height, y], axis=-1).reshape(-1, 3).astype(np.float32)
    return xyz


def part1by2(x):
    x = x.astype(np.int64) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton3(v):
    return (part1by2(v[:, 2]) << 2) | (part1by2(v[:, 1]) << 1) | part1by2(v[:, 0])


def downsample(xyz, cell):
    v = np.floor(xyz / cell).astype(np.int32)
    vmin = v.min(axis=0)
    vr = v - vmin
    key = morton3(vr)
    order = np.argsort(key, kind="stable")
    skey = key[order]
    uniq, first, inv, cnt = np.unique(skey, return_index=True, return_inverse=True, return_counts=True)
    sums = np.zeros((len(uniq), 3), np.float64)
    np.add.at(sums, inv, xyz[order])
    cent = (sums / cnt[:, None]).astype(np.float32)
    return cent, uniq, vmin  # centroids in morton order, their keys


def window_md(cent, W):
    """k-th-smallest + mean of K smallest among +/-W array neighbors."""
    n = len(cent)
    d2 = np.full((2 * W, n), np.inf, np.float32)
    row = 0
    for w in range(-W, W + 1):
        if w == 0:
            continue
        if w > 0:
            d = cent[w:] - cent[:-w]
            d2[row, : n - w] = (d * d).sum(-1)
        else:
            d = cent[:w] - cent[-w:]
            d2[row, -w:] = (d * d).sum(-1)
        row += 1
    part = np.partition(d2, K - 1, axis=0)[:K]
    found = np.isfinite(part)
    nfound = found.sum(axis=0)
    dk_win = np.sqrt(part.max(axis=0))  # K-th smallest (inf if <K found)
    md = np.where(nfound == K, np.sqrt(np.where(found, part, 0)).sum(axis=0) / K, np.inf)
    return md, dk_win, nfound


def cube_dists_below(p_cell, key, bound_key, above):
    """Distance from each point to region {key' < bound} (or > if above).

    p_cell: [N,3] float cell-space coords; key: [N] morton keys of own voxel
    (unused except sanity); bound_key: [N] int64 interval edge (inclusive).
    Returns [N] float distances in CELL units.
    """
    n = len(p_cell)
    best = np.full(n, np.inf, np.float32)
    for level in range(10):  # level 0 = coarsest digit
        shift = 3 * (9 - level)
        digit = (bound_key >> shift) & 7
        prefix = bound_key >> (shift + 3)
        side = 1 << (9 - level)
        # corner of the level-(level) cube containing the bound, per axis:
        # decode prefix digits accumulated so far
        for d in range(7):
            # cubes with same prefix, digit sib<digit (below) / sib>digit (above)
            if above:
                mask = (digit + (d + 1)) <= 7
                sibv = digit + (d + 1)
            else:
                mask = (digit - (d + 1)) >= 0
                sibv = digit - (d + 1)
            if not mask.any():
                continue
            child_key = (prefix << 3) | sibv
            # decode child_key's cell corner: it has (level+1) digits;
            # corner = deinterleave(child_key) << (9-level)
            cx = unpart1by2(child_key)
            cy = unpart1by2(child_key >> 1)
            cz = unpart1by2(child_key >> 2)
            lo = np.stack([cx, cy, cz], -1).astype(np.float32) * side
            hi = lo + side
            dpp = np.clip(lo - p_cell, 0, None) + np.clip(p_cell - hi, 0, None)
            dist = np.sqrt((dpp * dpp).sum(-1))
            best = np.where(mask, np.minimum(best, dist), best)
    return best


def unpart1by2(x):
    x = x & 0x09249249
    x = (x | (x >> 2)) & 0x030C30C3
    x = (x | (x >> 4)) & 0x0300F00F
    x = (x | (x >> 8)) & 0x030000FF
    x = (x | (x >> 16)) & 0x000003FF
    return x


def keep_mask(md, mult=MULT):
    ok = np.isfinite(md)
    m = md[ok]
    mu = m.mean()
    var = ((m * m).sum() - m.sum() ** 2 / len(m)) / (len(m) - 1)
    thr = mu + mult * np.sqrt(max(var, 0))
    return md <= thr, thr


def main():
    xyz = generate()
    cell = 2.0 / 1000 * 2.0
    cent, keys, vmin = downsample(xyz, cell)
    n = len(cent)
    print(f"downsampled: {n} voxels, extent {np.ptp(np.floor(cent.min(0)/cell))}")

    # consecutive-run compression ratio of the RAW stream (pre-agg viability)
    v = np.floor(xyz / cell).astype(np.int32)
    raw_key = morton3(v - v.min(0))
    runs = 1 + (raw_key[1:] != raw_key[:-1]).sum()
    print(f"raw stream: {len(xyz)} pts, {runs} consecutive-equal runs ({len(xyz)/runs:.2f}x)")

    # exact oracle
    tree = cKDTree(cent)
    dist, _ = tree.query(cent, k=K + 1, workers=-1)
    md_exact = dist[:, 1:].sum(axis=1).astype(np.float32) / K
    keep_exact, thr_exact = keep_mask(md_exact)
    print(f"exact: md mean {md_exact.mean():.6f} std {md_exact.std():.6f} thr {thr_exact:.6f} keep {keep_exact.mean():.4f}")
    margin = np.abs(md_exact - thr_exact)
    print(f"  threshold margins: min {margin.min():.3e}  #<1e-6 {(margin < 1e-6).sum()}  #<1e-5 {(margin<1e-5).sum()}")

    p_cell = cent / cell - vmin  # continuous coords in rebased cell units

    for W in (16, 32, 64):
        md_w, dk_win, nfound = window_md(cent, W)
        # window interval edges
        klo = np.empty(n, np.int64)
        khi = np.empty(n, np.int64)
        idx = np.arange(n)
        klo = keys[np.maximum(idx - W, 0)]
        khi = keys[np.minimum(idx + W, n - 1)]
        edge = (idx - W < 0) | (idx + W >= n)

        d_below = cube_dists_below(p_cell, keys, klo, above=False)
        d_above = cube_dists_below(p_cell, keys, khi, above=True)
        d_out = np.minimum(d_below, d_above) * cell

        certified = (~edge) & (nfound == K) & (dk_win < d_out)
        # validate: certified points' window md must equal exact md
        bad = certified & (np.abs(md_w - md_exact) > 1e-6 * np.maximum(md_exact, 1e-9))
        md_fix = np.where(certified, md_w, md_exact)  # fallback = oracle
        keep_fix, thr_fix = keep_mask(md_fix)
        agree_fix = (keep_fix == keep_exact).mean()
        keep_w, _ = keep_mask(np.where(np.isfinite(md_w), md_w, 0))
        agree_w = (keep_w == keep_exact).mean()
        md_ok = np.isclose(md_w, md_exact, rtol=1e-5).mean()
        print(
            f"W={W}: md exact-rate {md_ok:.4f}  keep-agree(window) {agree_w:.4f}  "
            f"certified {certified.mean():.4f}  cert-violations {bad.sum()}  "
            f"keep-agree(cert+oracle-fallback) {agree_fix:.6f}  fallback {1-certified.mean():.4f}"
        )


if __name__ == "__main__":
    main()
