"""Image pyramid + separable Gaussian blur, XLA-conv based.

Role of the reference's ``ORBextractor::ComputePyramid`` (reference
orb_slam3/src/ORBextractor.cc:1170-1196, cv::resize per level) and the
``GaussianBlur(..., 7, 7, 2, 2)`` applied before descriptor sampling
(ORBextractor.cc:1133). All shapes are static Python ints so one jitted
program serves the whole run.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, n_levels: int, scale: float):
    """Static per-level (H, W) list, mirroring 1/scale^l sizing."""
    shapes = []
    for l in range(n_levels):
        inv = 1.0 / (scale**l)
        shapes.append((max(16, int(round(height * inv))), max(16, int(round(width * inv)))))
    return shapes


def build_pyramid(img: jnp.ndarray, n_levels: int = 8, scale: float = 1.2):
    """[H, W] float32 -> list of n_levels arrays, level l of shape
    ``level_shapes[l]``, each resized from the previous level (matching
    the reference's chained cv::resize, ORBextractor.cc:1180)."""
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [img]
    cur = img
    for l in range(1, n_levels):
        cur = jax.image.resize(cur, shapes[l], method="bilinear")
        levels.append(cur)
    return levels


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    r = (ksize - 1) / 2.0
    x = np.arange(ksize) - r
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with replicate-edge padding, via two 1-D
    XLA convolutions (VPU/MXU friendly; the reference calls
    cv::GaussianBlur(7,7,2,2) with BORDER_REFLECT_101)."""
    k = jnp.asarray(_gaussian_kernel1d(ksize, sigma))
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


def gaussian_blur_batched(imgs: jnp.ndarray, ksize: int = 7, sigma: float = 2.0):
    """``gaussian_blur`` over a stack [L, H, W] in one conv pair (the
    level axis rides the convolution batch dimension)."""
    k = jnp.asarray(_gaussian_kernel1d(ksize, sigma))
    pad = ksize // 2
    x = jnp.pad(imgs, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[:, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[:, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    return x


def conv2d_same(img: jnp.ndarray, kernel: jnp.ndarray):
    """Single-channel 2-D convolution, zero-padded SAME. kernel [kh, kw]."""
    kh, kw = kernel.shape
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]
