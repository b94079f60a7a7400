"""Fisheye (Kannala-Brandt 8) input support via rectification to a
virtual pinhole view.

Role of the reference's rectification machinery
(``Settings::precomputeRectificationMaps``, orb_slam3/src/Settings.cc,
using cv::initUndistortRectifyMap + remap): precompute an inverse
sampling map once, then every frame is one bilinear gather. The
rectified stream feeds the standard pinhole pipeline, which is how the
reference handles the ``Rectified`` camera type; its alternative
native-KB8 path (two-camera fisheye frames) is a planned extension of
the solver residuals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import cameras


def kb8_rect_map(kb8_params, pin_params, height: int, width: int):
    """Precompute the sampling map: for each rectified (pinhole) pixel,
    the source fisheye pixel. Returns [H, W, 2] float32 (x, y)."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    uv = jnp.stack([xg, yg], axis=-1).reshape(-1, 2)
    rays = cameras.pinhole_unproject(pin_params, uv)  # z=1 rays
    src = cameras.kb8_project(kb8_params, rays)
    return src.reshape(height, width, 2)


@jax.jit
def remap_bilinear(img: jnp.ndarray, smap: jnp.ndarray) -> jnp.ndarray:
    """Bilinear remap (cv::remap role). Out-of-bounds samples -> 0."""
    h, w = img.shape
    x = smap[..., 0]
    y = smap[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    valid = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)
    v00 = img[y0c, x0c]
    v01 = img[y0c, x0c + 1]
    v10 = img[y0c + 1, x0c]
    v11 = img[y0c + 1, x0c + 1]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return jnp.where(valid, out, 0.0)


def virtual_pinhole_params(kb8_params, height: int, width: int,
                           fov_scale: float = 0.72):
    """A reasonable virtual pinhole for a KB8 camera: keep the principal
    point, pick f so the central ~2*atan(1/(2 fov_scale)) FoV fills the
    frame (smaller fov_scale = wider rectified FoV, more edge stretch)."""
    fx = float(kb8_params[0]) / fov_scale
    fy = float(kb8_params[1]) / fov_scale
    import numpy as np

    return np.asarray(
        [fx, fy, (width - 1) / 2.0, (height - 1) / 2.0, 0, 0, 0, 0, 0],
        np.float32,
    )
