"""Registration helper functions on wrapper point clouds.

Re-implementation of the reference's numpy/open3d helper layer
(reference: python/cwipc/registration/util.py) without the Open3D
dependency: transforms, masked tile selection, direction/floor filters,
per-tile downsample, tile census, radius percentiles.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from .. import (
    cwipc_downsample,
    cwipc_from_numpy_matrix,
    cwipc_join,
    cwipc_tilefilter,
)
from ..core.pointcloud import cwipc_pointcloud_wrapper

RegistrationTransformation = np.ndarray  # 4x4 float64
Vector3 = np.ndarray


def transformation_identity() -> RegistrationTransformation:
    return np.identity(4)


def transformation_invert(m: RegistrationTransformation) -> RegistrationTransformation:
    return np.linalg.inv(np.asarray(m, np.float64))


def transformation_frompython(m) -> RegistrationTransformation:
    return np.asarray(m, np.float64).reshape(4, 4)


def transformation_topython(m: RegistrationTransformation) -> List[List[float]]:
    return [list(map(float, row)) for row in np.asarray(m).reshape(4, 4)]


def transformation_is_identity(m: RegistrationTransformation, epsilon: float = 1e-6) -> bool:
    return bool(np.allclose(np.asarray(m), np.identity(4), atol=epsilon))


def transformation_compare(
    a: RegistrationTransformation, b: RegistrationTransformation
) -> Tuple[float, float]:
    """(translation distance, rotation angle in radians) between transforms."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    dt = float(np.linalg.norm(a[:3, 3] - b[:3, 3]))
    r = a[:3, :3] @ b[:3, :3].T
    cos_angle = (np.trace(r) - 1.0) / 2.0
    angle = float(np.arccos(np.clip(cos_angle, -1.0, 1.0)))
    return dt, angle


def cwipc_transform(
    pc: cwipc_pointcloud_wrapper, transform: RegistrationTransformation
) -> cwipc_pointcloud_wrapper:
    """Apply a 4x4 transform to a cloud (reference: registration/util.py:295-309)."""
    m = pc.get_numpy_matrix()
    t = np.asarray(transform, np.float64).reshape(4, 4)
    m[:, 0:3] = m[:, 0:3] @ t[:3, :3].T + t[:3, 3]
    new_pc = cwipc_from_numpy_matrix(m, pc.timestamp())
    new_pc._set_cellsize(pc.cellsize())
    return new_pc


def cwipc_tilefilter_masked(
    pc: cwipc_pointcloud_wrapper, mask: int
) -> cwipc_pointcloud_wrapper:
    """Select points whose tile has any of the mask bits set (AND-mask select,
    reference: registration/util.py:98-112) — unlike cwipc_tilefilter's exact
    match."""
    arr = pc.get_numpy_array()
    sel = (arr["tile"] & mask) != 0
    sub = arr[sel]
    m = np.zeros((sub.shape[0], 7), np.float32)
    for i, f in enumerate(("x", "y", "z", "r", "g", "b", "tile")):
        m[:, i] = sub[f]
    new_pc = cwipc_from_numpy_matrix(m, pc.timestamp())
    new_pc._set_cellsize(pc.cellsize())
    return new_pc


def cwipc_direction_filter(
    pc: cwipc_pointcloud_wrapper,
    direction: Union[Vector3, Tuple[float, float, float]],
    threshold: float,
) -> cwipc_pointcloud_wrapper:
    """Keep points whose estimated outward normal faces `direction`
    (reference: registration/util.py:114-144, o3d normals replaced by the
    framework's Morton-window estimator)."""
    import jax.numpy as jnp

    from .normals import estimate_normals

    d = np.asarray(direction, np.float64).reshape(3)
    norm = np.linalg.norm(d)
    if norm != 0:
        d = d / norm
    buf = pc._access_buffer()
    cellsize = pc.cellsize() if pc.cellsize() > 0 else 0.02
    normals = np.asarray(estimate_normals(buf, jnp.float32(max(cellsize * 4, 0.02))))
    n = pc.count()
    keep = (normals[:n] @ d) >= threshold

    m = pc.get_numpy_matrix()[keep]
    new_pc = cwipc_from_numpy_matrix(m, pc.timestamp())
    new_pc._set_cellsize(pc.cellsize())
    return new_pc


def cwipc_floor_filter(
    pc: cwipc_pointcloud_wrapper, level: float = 0.1, keep_floor: bool = False
) -> cwipc_pointcloud_wrapper:
    """Split off points near the floor (y < level); keep floor or the rest."""
    m = pc.get_numpy_matrix()
    is_floor = m[:, 1] < level
    sel = is_floor if keep_floor else ~is_floor
    new_pc = cwipc_from_numpy_matrix(m[sel], pc.timestamp())
    new_pc._set_cellsize(pc.cellsize())
    return new_pc


def cwipc_randomize_floor(
    pc: cwipc_pointcloud_wrapper, level: float = 0.1
) -> cwipc_pointcloud_wrapper:
    """Randomly shuffle the tile assignment of floor points (y < level)
    (reference: registration/util.py:146-168)."""
    m = pc.get_numpy_matrix()
    is_floor = m[:, 1] < level
    floor = m[is_floor]
    rest = m[~is_floor]
    tiles = floor[:, 6].copy()
    np.random.shuffle(tiles)
    floor[:, 6] = tiles
    new_pc = cwipc_from_numpy_matrix(np.concatenate([floor, rest], axis=0), pc.timestamp())
    new_pc._set_cellsize(pc.cellsize())
    return new_pc


def get_tiles_used(pc: cwipc_pointcloud_wrapper) -> List[int]:
    """Distinct tile values present, ascending (reference: util.py:285-293)."""
    arr = pc.get_numpy_array()
    return [int(t) for t in np.unique(arr["tile"])]


def cwipc_tile_occupancy(pc: cwipc_pointcloud_wrapper) -> dict:
    """Census: tile value -> point count (reference: util.py:184-200)."""
    arr = pc.get_numpy_array()
    values, counts = np.unique(arr["tile"], return_counts=True)
    return {int(v): int(c) for v, c in zip(values, counts)}


def cwipc_compute_tile_occupancy(
    pc: cwipc_pointcloud_wrapper, cellsize: float = 0, filterfloor: bool = False
):
    """(tilenum, pointcount) pairs sorted by count descending, optionally
    after a voxel downsample at `cellsize` and/or floor removal — the voxel
    pass is what makes multi-camera combination tiles (tile-OR of merged
    voxels) appear in the census (reference: util.py:184-200)."""
    work = pc
    if filterfloor:
        work = cwipc_floor_filter(work)
    if cellsize:
        work = cwipc_downsample(work, cellsize)
    census = cwipc_tile_occupancy(work)
    return sorted(census.items(), key=lambda tc: tc[1], reverse=True)


def cwipc_downsample_pertile(
    pc: cwipc_pointcloud_wrapper, cellsize: float
) -> cwipc_pointcloud_wrapper:
    """Downsample each tile independently so tiles never merge
    (reference: registration/util.py:170-182)."""
    result: Optional[cwipc_pointcloud_wrapper] = None
    for tilenum in get_tiles_used(pc):
        tile_pc = cwipc_tilefilter(pc, tilenum)
        tile_down = cwipc_downsample(tile_pc, cellsize)
        tile_pc.free()
        if result is None:
            result = tile_down
        else:
            joined = cwipc_join(result, tile_down)
            result.free()
            tile_down.free()
            result = joined
    if result is None:
        return pc.clone()
    return result


def cwipc_xz_radius_percentile(
    pc: cwipc_pointcloud_wrapper, percentile: float = 90.0
) -> float:
    """Percentile of point distance from the vertical axis through the
    centroid (reference: util.py:202-216) — used to size correspondence
    search regions."""
    m = pc.get_numpy_matrix(onlyGeometry=True)
    if m.shape[0] == 0:
        return 0.0
    center = m.mean(axis=0)
    dx = m[:, 0] - center[0]
    dz = m[:, 2] - center[2]
    return float(np.percentile(np.sqrt(dx * dx + dz * dz), percentile))


# ---------------------------------------------------------------------------
# Base classes for algorithms (reference: registration/util.py:311-449)
# ---------------------------------------------------------------------------

from .abstract import Algorithm, MulticamAlgorithm, PointCloudFilter  # noqa: E402


class BaseAlgorithm(Algorithm):
    """Common source/reference handling for analysis & alignment algorithms."""

    def __init__(self) -> None:
        self._source_pointcloud: Optional[cwipc_pointcloud_wrapper] = None
        self._filtered_source_pointcloud: Optional[cwipc_pointcloud_wrapper] = None
        self.source_tilemask: Optional[int] = None
        self._reference_pointcloud: Optional[cwipc_pointcloud_wrapper] = None
        self._filtered_reference_pointcloud: Optional[cwipc_pointcloud_wrapper] = None
        self.reference_tilemask: Optional[int] = None
        self.verbose = False
        self.debug = False

    def set_source_pointcloud(self, pc: cwipc_pointcloud_wrapper, tilemask: Optional[int] = None) -> None:
        if tilemask is not None and tilemask != 0:
            pc = cwipc_tilefilter_masked(pc, tilemask)
        self._source_pointcloud = pc
        self._filtered_source_pointcloud = None
        self.source_tilemask = tilemask

    def set_reference_pointcloud(self, pc: cwipc_pointcloud_wrapper, tilemask: Optional[int] = None) -> None:
        if tilemask is not None and tilemask != 0:
            pc = cwipc_tilefilter_masked(pc, tilemask)
        self._reference_pointcloud = pc
        self._filtered_reference_pointcloud = None
        self.reference_tilemask = tilemask

    def get_source_pointcloud(self) -> cwipc_pointcloud_wrapper:
        assert self._source_pointcloud is not None
        return self._source_pointcloud

    def get_filtered_source_pointcloud(self) -> cwipc_pointcloud_wrapper:
        return self._filtered_source_pointcloud or self.get_source_pointcloud()

    def get_reference_pointcloud(self) -> cwipc_pointcloud_wrapper:
        assert self._reference_pointcloud is not None
        return self._reference_pointcloud

    def get_filtered_reference_pointcloud(self) -> cwipc_pointcloud_wrapper:
        return self._filtered_reference_pointcloud or self.get_reference_pointcloud()

    def apply_source_filter(self, filter: PointCloudFilter) -> None:
        self._filtered_source_pointcloud = filter(self.get_filtered_source_pointcloud())

    def apply_reference_filter(self, filter: PointCloudFilter) -> None:
        self._filtered_reference_pointcloud = filter(self.get_filtered_reference_pointcloud())


class BaseMulticamAlgorithm(MulticamAlgorithm):
    """Common per-tile handling for multi-camera algorithms."""

    def __init__(self) -> None:
        self.per_camera_tilenum: List[int] = []
        self.original_pointcloud: Optional[cwipc_pointcloud_wrapper] = None
        self.verbose = False
        self.debug = False

    def set_tiled_pointcloud(self, pc: cwipc_pointcloud_wrapper) -> None:
        self.original_pointcloud = pc
        self.per_camera_tilenum = list(get_tiles_used(pc))

    def tilemask_for_camera_index(self, cam_index: int) -> int:
        return self.per_camera_tilenum[cam_index]

    def camera_index_for_tilemask(self, tilenum: int) -> int:
        return self.per_camera_tilenum.index(tilenum)

    def camera_count(self) -> int:
        return len(self.per_camera_tilenum)

    def get_pc_for_tilemask(self, tilemask: int) -> cwipc_pointcloud_wrapper:
        assert self.original_pointcloud is not None
        return cwipc_tilefilter(self.original_pointcloud, tilemask)

    def get_pc_for_camnum(self, camnum: int) -> cwipc_pointcloud_wrapper:
        return self.get_pc_for_tilemask(self.tilemask_for_camera_index(camnum))


def project_point_indices(
    xyz: np.ndarray, camera, width: int, height: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Project points with the software renderer's camera model: returns
    (u, v, depth) screen coordinates per point (NaN u/v for points behind
    the camera).  Factored out of the renderer so picking is testable
    without a window."""
    import math as _math

    view = camera.view_matrix()
    cam_pts = xyz @ view[:3, :3].T + view[:3, 3]
    z = -cam_pts[:, 2]
    f = 0.5 * height / _math.tan(_math.radians(camera.fov_deg) / 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.where(z > 1e-6, (cam_pts[:, 0] / z) * f + width / 2, np.nan)
        v = np.where(z > 1e-6, -(cam_pts[:, 1] / z) * f + height / 2, np.nan)
    return u, v, z


def pick_index_at(
    xyz: np.ndarray, camera, width: int, height: int, x: float, y: float,
    max_pixel_distance: float = 12.0,
) -> int:
    """The point index whose projection is nearest to screen (x, y), with
    nearer-in-depth winning among candidates inside the pixel radius;
    -1 when nothing is close enough.  (The deprojection core of the
    interactive picker, reference util.py:244-257 o3d pick window.)"""
    u, v, z = project_point_indices(xyz, camera, width, height)
    d2 = (u - x) ** 2 + (v - y) ** 2
    near = d2 <= max_pixel_distance**2
    cand = np.where(np.isfinite(d2) & near)[0]
    if cand.size == 0:
        return -1
    # among pixels within the radius prefer the closest to the camera
    # (front surface), then the closest to the click
    zc = z[cand]
    zmin = zc.min()
    front = cand[zc <= zmin * 1.02]
    return int(front[np.argmin(d2[front])])


def pick_points(
    title: str, pc: cwipc_pointcloud_wrapper, count: int = 4,
    timeout_ms: int = 120000,
) -> List[int]:
    """Interactive point picking: show the cloud in the software viewer
    and let the user shift-click `count` points; returns their indices
    (reference: registration/util.py:244-257, o3d VisualizerWithEditing).
    Headless runs (no GUI available) return [] immediately — callers fall
    back to the automated detector."""
    import time as _time

    from ..io.visualizer_sink import cwipc_window_sink

    window = cwipc_window_sink(title)
    try:
        # headless: skip the (full-cloud) render entirely — the caller
        # falls back to the automated detector anyway
        if not window._gui:
            return []
        window.feed(pc, True)
        import cv2

        m = pc.get_numpy_matrix(onlyGeometry=True).astype(np.float32)
        picked: List[int] = []

        def on_mouse(event, x, y, flags, _param):
            if event == cv2.EVENT_LBUTTONDOWN and (flags & cv2.EVENT_FLAG_SHIFTKEY):
                idx = pick_index_at(m, window.camera, window.width, window.height, x, y)
                if idx >= 0 and idx not in picked:
                    picked.append(idx)
                    print(f"pick_points: picked #{len(picked)}: index {idx} at {m[idx]}")
            else:
                window._on_mouse(event, x, y, flags, _param)

        cv2.setMouseCallback(window.title, on_mouse)
        print(f"pick_points: shift-click {count} points; q aborts")
        deadline = _time.time() + timeout_ms / 1000.0
        while len(picked) < count and _time.time() < deadline:
            key = cv2.waitKey(50)
            if key >= 0 and chr(key & 0xFF) == "q":
                break
        return picked
    finally:
        window.free(force=True)


def show_pointcloud(title: str, pc: cwipc_pointcloud_wrapper, timeout_ms: int = 5000) -> None:
    """Show a pointcloud in a viewer window until a key is pressed (or the
    timeout elapses in headless runs) — the interactive inspection helper
    used by registration flows (reference: registration/util.py:231-283,
    o3d show window; ours uses the software viewer sink)."""
    from ..io.visualizer_sink import cwipc_window_sink

    window = cwipc_window_sink(title)
    try:
        window.feed(pc, True)
        window.interact("Press any key to close", None, timeout_ms)
    finally:
        window.free(force=True)
