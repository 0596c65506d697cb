"""Software point renderer: cloud -> RGB image (numpy, vectorized).

The reference renders with immediate-mode OpenGL (reference:
src/cwipc_window.cpp:74-134, src/window_util.cpp:61-149).  This renderer
produces the same kind of orbit-camera view as a numpy z-buffered point
splat, usable headless (tests, PNG snapshots, cv2 windows) — no GL context
required.  It is also the camera model for the coarse-registration
render-to-image path (registration/coarse.py).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


class OrbitCamera:
    """Simple orbit camera: azimuth/elevation/distance around a center."""

    def __init__(
        self,
        center: Tuple[float, float, float] = (0.0, 1.0, 0.0),
        distance: float = 3.0,
        azimuth: float = 0.0,
        elevation: float = 0.0,
        fov_deg: float = 60.0,
    ):
        self.center = np.asarray(center, np.float64)
        self.distance = distance
        self.azimuth = azimuth
        self.elevation = elevation
        self.fov_deg = fov_deg

    def view_matrix(self) -> np.ndarray:
        ca, sa = math.cos(self.azimuth), math.sin(self.azimuth)
        ce, se = math.cos(self.elevation), math.sin(self.elevation)
        # camera position on the orbit sphere
        eye = self.center + self.distance * np.array([sa * ce, se, ca * ce])
        fwd = self.center - eye
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        nr = np.linalg.norm(right)
        if nr < 1e-9:
            right = np.array([1.0, 0.0, 0.0])
        else:
            right /= nr
        up = np.cross(right, fwd)
        m = np.eye(4)
        m[0, :3] = right
        m[1, :3] = up
        m[2, :3] = -fwd
        m[:3, 3] = -m[:3, :3] @ eye
        return m


def render_points(
    xyz: np.ndarray,
    rgb: np.ndarray,
    width: int = 640,
    height: int = 480,
    camera: Optional[OrbitCamera] = None,
    point_size: int = 1,
    background: Tuple[int, int, int] = (0, 0, 0),
    return_depth: bool = False,
):
    """Z-buffered point splat. xyz [N,3] float, rgb [N,3] uint8.

    Returns image [H,W,3] uint8 (and linear depth [H,W] float32 with
    return_depth, 0 where empty).
    """
    if camera is None:
        camera = OrbitCamera()
    img = np.empty((height, width, 3), np.uint8)
    img[:] = background
    depth_img = np.zeros((height, width), np.float32)
    if xyz.shape[0] == 0:
        return (img, depth_img) if return_depth else img

    view = camera.view_matrix()
    cam_pts = xyz @ view[:3, :3].T + view[:3, 3]
    z = -cam_pts[:, 2]  # positive depth in front of camera
    in_front = z > 1e-6
    cam_pts = cam_pts[in_front]
    z = z[in_front]
    rgb = rgb[in_front]

    f = 0.5 * height / math.tan(math.radians(camera.fov_deg) / 2)
    u = (cam_pts[:, 0] / z) * f + width / 2
    v = -(cam_pts[:, 1] / z) * f + height / 2
    ui = np.round(u).astype(np.int64)
    vi = np.round(v).astype(np.int64)
    ok = (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    ui, vi, z, rgb = ui[ok], vi[ok], z[ok], rgb[ok]
    if ui.size == 0:
        return (img, depth_img) if return_depth else img

    # z-buffer: sort far-to-near, later (nearer) writes win
    order = np.argsort(-z, kind="stable")
    ui, vi, z, rgb = ui[order], vi[order], z[order], rgb[order]
    r = max(0, point_size // 2)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            uu = np.clip(ui + dx, 0, width - 1)
            vv = np.clip(vi + dy, 0, height - 1)
            img[vv, uu] = rgb
            depth_img[vv, uu] = z
    return (img, depth_img) if return_depth else img
