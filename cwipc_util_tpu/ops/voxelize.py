"""Voxel-grid downsample: sort by voxel key + segment-reduce centroids.

TPU-native re-design of the reference's two downsamplers
(reference: src/cwipc_filters.cpp:30-172):

* The reference's plain path (`cwipc_downsample_voxelgrid`) is a PCL
  VoxelGrid: points are binned by ``floor(coord / cellsize)`` per axis, each
  occupied voxel emits one point whose x,y,z,r,g,b are the arithmetic mean
  of the contributors and whose tile is the bitwise OR of contributors'
  tiles.
* The reference's default path additionally splits the cloud through a
  64*cellsize octree first — purely a work-chunking device for PCL; the
  voxel semantics are the same, except voxels straddling an octree-leaf
  boundary can be emitted twice.  We implement the mathematically clean
  single-grid semantics for both paths (documented divergence: no duplicated
  straddle-voxels; parity is set-equality of centroids within fp tolerance).

TPU mapping: this is a sort + segment-reduction, which XLA compiles well:

1. quantize: ``v = floor(xyz / cellsize)`` (int32, clamped),
2. lexicographic sort of (vx, vy, vz, point-index) — invalid points get a
   sentinel key that sorts last,
3. segment boundaries -> segment ids via cumsum,
4. masked segment-sum of xyz/rgb/count and per-bit OR of tiles,
5. the segment id IS the output slot, so the result is born compacted.

Everything is static-shape; the output uses the input capacity and carries a
device count scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.buffers import PointBuffer, pack_rgba, unpack_rgba

# Quantized coordinates are clamped to +/-2^29 so the sentinel (INT32_MAX)
# stays strictly larger than any real voxel id.
_CLAMP = 1 << 29
_SENTINEL = jnp.iinfo(jnp.int32).max


@jax.jit
def downsample(buf: PointBuffer, cellsize: jax.Array) -> PointBuffer:
    """Voxel-grid downsample at the given cellsize (f32 scalar, > 0)."""
    cap = buf.capacity
    valid = buf.valid_mask()
    inv = 1.0 / jnp.asarray(cellsize, jnp.float32)

    v = jnp.floor(buf.xyz * inv).astype(jnp.int32)
    v = jnp.clip(v, -_CLAMP, _CLAMP)
    kx = jnp.where(valid, v[:, 0], _SENTINEL)
    ky = jnp.where(valid, v[:, 1], _SENTINEL)
    kz = jnp.where(valid, v[:, 2], _SENTINEL)

    idx = jnp.arange(cap, dtype=jnp.int32)
    skx, sky, skz, perm = jax.lax.sort((kx, ky, kz, idx), num_keys=3)

    # After sorting, all valid points occupy slots [0, count).
    sorted_valid = idx < buf.count
    sxyz = buf.xyz[perm]
    srgba = buf.rgba[perm]

    new_seg = jnp.logical_or(
        idx == 0,
        (skx != jnp.roll(skx, 1))
        | (sky != jnp.roll(sky, 1))
        | (skz != jnp.roll(skz, 1)),
    )
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1

    # Number of distinct voxels among the valid points.
    last = jnp.clip(buf.count - 1, 0, cap - 1)
    total = jnp.where(buf.count > 0, seg[last] + 1, 0)

    w = sorted_valid.astype(jnp.float32)
    r, g, b, tile = unpack_rgba(srgba)

    sums_xyz = jax.ops.segment_sum(sxyz * w[:, None], seg, num_segments=cap)
    cnt = jax.ops.segment_sum(w, seg, num_segments=cap)
    rgb = jnp.stack([r, g, b], axis=-1).astype(jnp.float32)
    sums_rgb = jax.ops.segment_sum(rgb * w[:, None], seg, num_segments=cap)

    # Tile OR across each voxel: per-bit any().  8 bits, so one [cap,8]
    # segment-sum does it.
    bits = (tile[:, None] >> jnp.arange(8, dtype=jnp.uint32)[None, :]) & 1
    bits = bits.astype(jnp.float32) * w[:, None]
    or_bits = jax.ops.segment_sum(bits, seg, num_segments=cap) > 0
    out_tile = (or_bits.astype(jnp.uint32) * (1 << jnp.arange(8, dtype=jnp.uint32))).sum(
        axis=-1, dtype=jnp.uint32
    )

    denom = jnp.maximum(cnt, 1.0)
    mean_xyz = sums_xyz / denom[:, None]
    # PCL averages color channels as floats and truncates on store
    # (VoxelGrid centroid accumulation); match that.
    mean_rgb = (sums_rgb / denom[:, None]).astype(jnp.uint32)

    out_valid = idx < total
    out_xyz = jnp.where(out_valid[:, None], mean_xyz, 0.0)
    out_rgba = jnp.where(
        out_valid,
        pack_rgba(mean_rgb[:, 0], mean_rgb[:, 1], mean_rgb[:, 2], out_tile),
        0,
    )
    return PointBuffer(xyz=out_xyz, rgba=out_rgba, count=total)
