"""Headless AR overlay: anchor a virtual cube to a detected map plane
and draw it into tracked frames.

Role of the reference's AR demo (src/AR/ros_mono_ar.cc + ViewerAR.cc:
detect a plane on the tracked map points, render virtual cubes on it
with the live camera pose). No OpenGL/Pangolin here: the cube's 12 edges
are projected with the pinhole model and rasterized into the grayscale
frame on the host — the same demo capability, headless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cameras, plane


def cube_vertices(anchor: np.ndarray, normal: np.ndarray, size: float):
    """8 world vertices of a cube of side ``size`` sitting ON the plane
    (one face on the plane, centered at the anchor)."""
    n = np.asarray(normal, np.float64)
    n = n / max(np.linalg.norm(n), 1e-12)
    # in-plane orthonormal basis
    a = np.array([1.0, 0.0, 0.0])
    if abs(n @ a) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    u = np.cross(n, a)
    u /= max(np.linalg.norm(u), 1e-12)
    v = np.cross(n, u)
    h = size / 2.0
    c = np.asarray(anchor, np.float64)
    verts = []
    for dz in (0.0, size):
        for du, dv in ((-h, -h), (h, -h), (h, h), (-h, h)):
            verts.append(c + du * u + dv * v + dz * n)
    return np.asarray(verts, np.float32)  # [8,3]


CUBE_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def _draw_line(img: np.ndarray, p0, p1, value: float):
    """Rasterize a segment into ``img`` in place (DDA)."""
    h, w = img.shape
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    steps = int(max(abs(x1 - x0), abs(y1 - y0), 1))
    ts = np.linspace(0.0, 1.0, steps + 1)
    xs = np.round(x0 + ts * (x1 - x0)).astype(int)
    ys = np.round(y0 + ts * (y1 - y0)).astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = value


def draw_cube(
    img: np.ndarray,
    verts_w: np.ndarray,
    R_cw: np.ndarray,
    t_cw: np.ndarray,
    cam_params,
    value: float = 255.0,
) -> np.ndarray:
    """Project the cube into the camera and draw its visible edges.
    Returns a drawn copy; edges with either endpoint behind the camera
    are skipped."""
    out = np.asarray(img, np.float32).copy()
    Xc = verts_w @ np.asarray(R_cw).T + np.asarray(t_cw)
    uv = np.asarray(cameras.pinhole_project_nodist(jnp.asarray(cam_params), jnp.asarray(Xc)))
    infront = Xc[:, 2] > 0.05
    for i, j in CUBE_EDGES:
        if infront[i] and infront[j]:
            _draw_line(out, uv[i], uv[j], value)
    return out


class ARDemo:
    """Attachable AR session: detect a plane on the current map once,
    then overlay a cube on every subsequent frame (the contract of the
    reference's ViewerAR thread)."""

    def __init__(self, slam, cube_size: float | None = None, seed: int = 3):
        self.slam = slam
        self.cube_size = cube_size
        self.key = jax.random.PRNGKey(seed)
        self.verts = None
        self.plane = None

    def try_detect_plane(self) -> bool:
        m = self.slam.map
        self.key, sub = jax.random.split(self.key)
        res = plane.detect_plane(m.pt_X, m.pt_valid, sub)
        res = jax.device_get(res)
        if not bool(res.ok):
            return False
        size = self.cube_size
        if size is None:
            # ~10% of the inlier cloud's extent
            X = np.asarray(res.inlier, bool)
            pts = np.asarray(jax.device_get(m.pt_X))[X]
            size = 0.1 * float(
                np.median(np.linalg.norm(pts - pts.mean(0), axis=-1)) * 2.0
            )
        # Anchor on the camera-facing side of the plane.
        n = np.asarray(res.normal)
        C_w = -np.asarray(self.slam.R_cur).T @ np.asarray(self.slam.t_cur)
        if (C_w @ n + float(res.d)) < 0:
            n = -n
        self.plane = (n, float(res.d), np.asarray(res.anchor))
        self.verts = cube_vertices(np.asarray(res.anchor), n, size)
        return True

    def render(self, img: np.ndarray) -> np.ndarray:
        """Overlay the cube using the tracker's current pose; returns the
        frame unchanged if no plane was detected yet."""
        if self.verts is None and not self.try_detect_plane():
            return np.asarray(img, np.float32)
        return draw_cube(
            img, self.verts, self.slam.R_cur, self.slam.t_cur,
            self.slam.cam_params,
        )
