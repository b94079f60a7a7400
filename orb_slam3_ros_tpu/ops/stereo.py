"""Stereo matching: row-constrained descriptor search + subpixel SAD
refinement, batched.

Role of the reference's ``Frame::ComputeStereoMatches``
(orb_slam3/src/Frame.cc:811-984): for each left keypoint, candidate right
keypoints within a row band (tolerance grows with octave), disparity
range gating, best Hamming descriptor match, then sub-pixel correction by
sliding an 11px intensity window (+-5 px) on the pyramid level and
fitting a parabola to the SAD minimum.

TPU-first: the candidate search is one dense [NL, NR] masked Hamming
matrix (MXU); the SAD refinement gathers one 11-px strip per matched
keypoint and evaluates all 11 shifts as a batched correlation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hamming
from .orb import Features

SAD_W = 5  # half window (11 px), reference w = 5
SAD_L = 5  # slide range +-5


class StereoMatch(NamedTuple):
    u_right: jnp.ndarray  # [N] subpixel right x-coordinate (level 0), -1 invalid
    depth: jnp.ndarray  # [N] metric depth, -1 invalid
    valid: jnp.ndarray  # [N]


def match_stereo(
    left: Features,
    right: Features,
    img_left: jnp.ndarray,
    img_right: jnp.ndarray,
    fx: float,
    baseline: float,
    scale: float = 1.2,
    min_z: float = 0.1,
    max_dist: int = hamming.TH_HIGH,
) -> StereoMatch:
    """Rectified stereo correspondence for every left feature.

    Args:
      left/right: per-image feature sets (level-0 coords).
      img_left/img_right: level-0 images (the reference refines on the
        keypoint's pyramid level; level-0 refinement changes subpixel
        behavior marginally and keeps one gather shape).
      fx, baseline: rectified intrinsics; depth = fx * b / disparity.
    """
    NL = left.xy.shape[0]
    dist = hamming.hamming_matrix(left.desc_sign, right.desc_sign)  # [NL,NR]
    dy = jnp.abs(left.xy[:, None, 1] - right.xy[None, :, 1])
    row_tol = 2.0 * scale ** jnp.maximum(
        left.level[:, None], right.level[None, :]
    ).astype(jnp.float32)
    disp = left.xy[:, None, 0] - right.xy[None, :, 0]
    max_disp = fx * baseline / min_z
    lvl_ok = jnp.abs(left.level[:, None] - right.level[None, :]) <= 1
    mask = (
        (dy <= row_tol)
        & (disp >= -1.0)
        & (disp <= max_disp)
        & lvl_ok
        & left.valid[:, None]
        & right.valid[None, :]
    )
    best_idx, best, second = hamming.masked_best2(dist, mask)
    # (TH_HIGH+TH_LOW)/2 acceptance like the reference's thOrbDist
    # (Frame.cc:850) plus mutual consistency between the images.
    matched = best <= (hamming.TH_HIGH + hamming.TH_LOW) // 2
    dT = jnp.where(mask, dist, hamming.INVALID_DIST).T
    col_best = jnp.argmin(dT, axis=1)
    matched = matched & (col_best[best_idx] == jnp.arange(NL))

    # Subpixel SAD refinement: true 11x11 block around the matched right
    # x at the left row, slid over +-SAD_L (the reference's IL window,
    # Frame.cc:900-960), via per-keypoint dynamic slices.
    h, w = img_left.shape
    W11 = 2 * SAD_W + 1
    WSTRIP = W11 + 2 * SAD_L
    xl = left.xy[:, 0]
    yl = jnp.clip(left.xy[:, 1].astype(jnp.int32), SAD_W, h - SAD_W - 1)
    xr0 = right.xy[best_idx, 0]
    xli = jnp.clip(xl.astype(jnp.int32), SAD_W, w - SAD_W - 1)
    xri = jnp.clip(xr0.astype(jnp.int32), SAD_W + SAD_L, w - SAD_W - SAD_L - 1)

    patch_l = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(
            img_left, (y - SAD_W, x - SAD_W), (W11, W11)
        )
    )(yl, xli)  # [N, 11, 11]
    strip_r = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(
            img_right, (y - SAD_W, x - SAD_W - SAD_L), (W11, WSTRIP)
        )
    )(yl, xri)  # [N, 11, 21]
    # center-intensity normalization like the reference (Frame.cc:905)
    patch_l = patch_l - patch_l[:, SAD_W : SAD_W + 1, SAD_W : SAD_W + 1]
    sad = jnp.stack(
        [
            jnp.sum(
                jnp.abs(
                    (
                        strip_r[:, :, k : k + W11]
                        - strip_r[:, SAD_W : SAD_W + 1, k + SAD_W : k + SAD_W + 1]
                    )
                    - patch_l
                ),
                axis=(-2, -1),
            )
            for k in range(2 * SAD_L + 1)
        ],
        axis=-1,
    )  # [N, 11]
    k = jnp.argmin(sad, axis=-1)
    # Reject minima at the slide-window edge (reference: bestincR == -L
    # or +L discards the match, Frame.cc:940).
    interior = (k > 0) & (k < 2 * SAD_L)
    matched = matched & interior
    k_c = jnp.clip(k, 1, 2 * SAD_L - 1)
    s_m = jnp.take_along_axis(sad, (k_c - 1)[:, None], 1)[:, 0]
    s_0 = jnp.take_along_axis(sad, k_c[:, None], 1)[:, 0]
    s_p = jnp.take_along_axis(sad, (k_c + 1)[:, None], 1)[:, 0]
    denom = jnp.maximum(s_m + s_p - 2.0 * s_0, 1e-6)
    delta = 0.5 * (s_m - s_p) / denom  # parabola vertex in [-1, 1]
    delta = jnp.clip(delta, -1.0, 1.0)
    # The SAD grid samples the left patch at the *integer* xli, so the
    # refined right position corresponds to xli; shift by the keypoint's
    # fractional part to express it at xl (higher-octave keypoints have
    # fractional level-0 coords).
    u_r = (
        xri.astype(xl.dtype)
        + (k_c - SAD_L).astype(xl.dtype)
        + delta
        + (xl - xli.astype(xl.dtype))
    )
    disp_final = xl - u_r
    ok = matched & (disp_final > 0.01) & (disp_final < max_disp)
    depth = jnp.where(ok, fx * baseline / jnp.maximum(disp_final, 1e-6), -1.0)
    return StereoMatch(
        u_right=jnp.where(ok, u_r, -1.0), depth=depth, valid=ok
    )


def backproject(cam_params, xy, depth):
    """Pixels + depth -> camera-frame 3D points [N,3]."""
    fx, fy, cx, cy = cam_params[0], cam_params[1], cam_params[2], cam_params[3]
    x = (xy[:, 0] - cx) / fx * depth
    y = (xy[:, 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)
