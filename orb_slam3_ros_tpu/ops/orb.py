"""Oriented binary descriptors + the full multi-level feature extractor.

Role of the reference's ``ORBextractor`` descriptor stage (reference
orb_slam3/src/ORBextractor.cc: ``IC_Angle`` :76-104, ``computeOrbDescriptor``
:107-144, pattern table :149-408, ``operator()`` :1086-1168). TPU-first
design decisions:

- **orientation by intensity centroid** is computed for *all pixels at
  once* as two 31x31 masked-moment convolutions (XLA conv -> MXU), then
  gathered at keypoint locations — instead of per-keypoint scalar loops.
- **descriptors** use a steered 256-pair binary test like rBRIEF. The
  reference ships ORB's learned pair table; we generate our own fixed
  Gaussian pattern (classic BRIEF recipe) — descriptors only need to be
  self-consistent within this system, and the matcher consumes them in two
  forms: bit-packed ``uint32 [N, 8]`` (storage) and sign-expanded
  ``int8 [N, 256]`` (MXU Hamming-as-matmul, see ``hamming.py``).
- fixed per-level capacities with validity masks; one compiled program per
  image geometry.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import fast as fast_mod
from . import pyramid as pyr_mod

PATCH_R = 15  # orientation patch radius (reference HALF_PATCH_SIZE = 15)
PAIR_CLIP = 13  # descriptor test offsets stay within +-13 (patch 31 - margin)
N_BITS = 256


def _make_pattern(seed: int = 42) -> np.ndarray:
    """[256, 2, 2] (pair, endpoint, xy) Gaussian BRIEF pattern, fixed."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PAIR_CLIP + 1) / 5.0
    pat = rng.normal(0.0, sigma, size=(N_BITS, 2, 2))
    return np.clip(np.round(pat), -PAIR_CLIP, PAIR_CLIP).astype(np.float32)


PATTERN = _make_pattern()


def _moment_kernels() -> tuple[np.ndarray, np.ndarray]:
    """31x31 cross-correlation kernels for (m10, m01) over the circular
    patch used by the reference's IC_Angle (ORBextractor.cc:76-104)."""
    size = 2 * PATCH_R + 1
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    mask = (xs**2 + ys**2) <= PATCH_R**2
    kx = (xs * mask).astype(np.float32)
    ky = (ys * mask).astype(np.float32)
    return kx, ky


_KX, _KY = _moment_kernels()


def orientation_maps(img: jnp.ndarray):
    """(m10 map, m01 map): per-pixel intensity-centroid moments."""
    m10 = pyr_mod.conv2d_same(img, jnp.asarray(_KX))
    m01 = pyr_mod.conv2d_same(img, jnp.asarray(_KY))
    return m10, m01


def angles_at_dense(img: jnp.ndarray, xy: jnp.ndarray):
    """Keypoint orientations [N] via whole-image moment maps (reference
    implementation; O(H*W*961) regardless of N — used for testing)."""
    m10, m01 = orientation_maps(img)
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, img.shape[1] - 1)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, img.shape[0] - 1)
    return jnp.arctan2(m01[yi, xi], m10[yi, xi])


def angles_at(img: jnp.ndarray, xy: jnp.ndarray):
    """Keypoint orientations [N] (radians) by gathering 31x31 patches at
    the keypoints and contracting with the masked-moment kernels.

    O(N*961) instead of O(H*W*961): profiling showed the whole-image
    31x31 single-input-channel convolution cannot feed the MXU (~270 ms
    per level on v5e) while N<=264 patch gathers + one [N,961]x[961,2]
    matmul are ~ms. Keypoints are detected with border >= 19 so patches
    never leave the image (clip is safety only).
    """
    h, w = img.shape
    n = xy.shape[0]
    x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - PATCH_R, 0, w - (2 * PATCH_R + 1))
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - PATCH_R, 0, h - (2 * PATCH_R + 1))
    patches = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(
            img, (yy, xx), (2 * PATCH_R + 1, 2 * PATCH_R + 1)
        )
    )(y0, x0)  # [N, 31, 31]
    flat = patches.reshape(n, -1)
    kern = jnp.stack(
        [jnp.asarray(_KX).reshape(-1), jnp.asarray(_KY).reshape(-1)], axis=-1
    )  # [961, 2]
    m = flat @ kern  # [N, 2] -> (m10, m01) on the MXU
    return jnp.arctan2(m[:, 1], m[:, 0])


def compute_descriptors(blurred: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray):
    """Steered 256-bit binary descriptors.

    Args:
      blurred: [H, W] Gaussian-blurred level image.
      xy: [N, 2] keypoint positions (level pixels).
      angle: [N] orientations (radians).

    Returns:
      bits [N, 256] bool.
    """
    h, w = blurred.shape
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], axis=-2
    )  # [N, 2, 2] row-major: p' = rot @ p
    pat = jnp.asarray(PATTERN)  # [P, 2, 2] xy
    # rotated offsets: [N, P, 2(endpoint), 2(xy)]
    off = jnp.einsum("nij,pkj->npki", rot, pat)
    coords = xy[:, None, None, :] + jnp.round(off)
    xi = jnp.clip(coords[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(coords[..., 1].astype(jnp.int32), 0, h - 1)
    vals = blurred[yi, xi]  # [N, P, 2]
    return vals[..., 0] < vals[..., 1]


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[N, 256] bool -> [N, 8] uint32 (bit i of word j = bit 32j+i)."""
    n = bits.shape[0]
    b = bits.reshape(n, 8, 32).astype(jnp.uint32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b * weights[None, None, :], axis=-1)


def sign_expand(bits: jnp.ndarray) -> jnp.ndarray:
    """[N, 256] bool -> [N, 256] int8 in {-1, +1} for MXU matching."""
    return (1 - 2 * bits.astype(jnp.int8)).astype(jnp.int8)


class ExtractorConfig(NamedTuple):
    """Static extractor configuration (role of the ORBextractor ctor args
    parsed from YAML: nFeatures/scaleFactor/nLevels/iniThFAST/minThFAST,
    reference Settings.cc ORB section)."""

    height: int
    width: int
    n_levels: int = 8
    scale: float = 1.2
    caps: Sequence[int] = (256, 192, 160, 128, 112, 96, 80, 64)
    ini_threshold: float = 20.0
    min_threshold: float = 7.0

    @property
    def total_cap(self) -> int:
        return int(sum(self.caps))

    def level_shape(self, l: int):
        return pyr_mod.level_shapes(self.height, self.width, self.n_levels, self.scale)[l]

    def cell_size(self, l: int) -> int:
        h, w = self.level_shape(l)
        return max(12, int(np.sqrt(h * w / (2.5 * self.caps[l]))))


def default_config(height: int, width: int, n_features: int = 1000, **kw) -> ExtractorConfig:
    """Distribute per-level capacities like the reference's geometric
    series (ORBextractor.cc:456-476: nfeatures * (1-q)/(1-q^L) * q^l),
    rounded up to multiples of 8."""
    n_levels = kw.pop("n_levels", 8)
    scale = kw.pop("scale", 1.2)
    q = 1.0 / scale
    f = n_features * (1 - q) / (1 - q**n_levels)
    caps = tuple(int(np.ceil(f * q**l / 8) * 8) for l in range(n_levels))
    return ExtractorConfig(
        height=height, width=width, n_levels=n_levels, scale=scale, caps=caps, **kw
    )


class Features(NamedTuple):
    """Fixed-capacity per-frame feature set (role of the keypoint/descriptor
    vectors inside ``Frame``, orb_slam3/include/Frame.h:263-280)."""

    xy: jnp.ndarray  # [N, 2] level-0 pixel coords
    level: jnp.ndarray  # [N] int32 pyramid level
    angle: jnp.ndarray  # [N] radians
    response: jnp.ndarray  # [N]
    desc_packed: jnp.ndarray  # [N, 8] uint32
    desc_sign: jnp.ndarray  # [N, 256] int8 (+-1)
    valid: jnp.ndarray  # [N] bool


PATCH_RAW = 21  # raw patch radius: 18 px max steered-pair reach + 3 blur
_BLUR_R = 18  # blurred patch radius after VALID 7-tap blur


def _blur_band_matrix(S: int, ksize: int, sigma: float) -> np.ndarray:
    """[S, S-ksize+1] banded Toeplitz of the 1-D Gaussian (VALID)."""
    k = np.asarray(pyr_mod._gaussian_kernel1d(ksize, sigma), np.float32)
    out = S - ksize + 1
    B = np.zeros((S, out), np.float32)
    for j in range(out):
        B[j : j + ksize, j] = k
    return B


def _patch_blur(patches: jnp.ndarray, ksize: int = 7, sigma: float = 2.0):
    """Blur [N, S, S] keypoint patches with the descriptor Gaussian, VALID
    (output [N, S-6, S-6]) — same values whole-image blur would produce at
    those positions, without touching H*W pixels.

    Separable blur as two banded-matrix contractions instead of convs:
    batched tiny-spatial convolutions lower poorly on TPU (measured ~4x
    slower than the equivalent MXU matmuls at [1232, 43, 43])."""
    S = patches.shape[-1]
    B = jnp.asarray(_blur_band_matrix(S, ksize, sigma))
    x = jnp.einsum("nij,ik->nkj", patches, B)  # rows (axis 1), VALID
    return jnp.einsum("nkj,jl->nkl", x, B)  # cols (axis 2), VALID


def _descriptors_from_patches(bpatch: jnp.ndarray, angle: jnp.ndarray):
    """Steered 256-pair tests sampled from blurred patches [N, D, D]
    (D = 2*_BLUR_R+1) via one take_along_axis — no image-space gathers."""
    n, D, _ = bpatch.shape
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], axis=-2
    )  # [N,2,2]
    pat = jnp.asarray(PATTERN)  # [P,2,2]
    off = jnp.round(jnp.einsum("nij,pkj->npki", rot, pat)).astype(jnp.int32)
    cx = jnp.clip(off[..., 0] + _BLUR_R, 0, D - 1)  # [N,P,2]
    cy = jnp.clip(off[..., 1] + _BLUR_R, 0, D - 1)
    flat_idx = (cy * D + cx).reshape(n, -1)  # [N, P*2]
    vals = jnp.take_along_axis(
        bpatch.reshape(n, D * D), flat_idx, axis=1
    ).reshape(n, -1, 2)
    return vals[..., 0] < vals[..., 1]


def extract(img: jnp.ndarray, config: ExtractorConfig) -> Features:
    """Full ORB-style extraction over the pyramid. ``img`` [H, W] f32 in
    [0, 255]. Equivalent of ``ORBextractor::operator()``
    (ORBextractor.cc:1086-1168) minus the stereo partitioning (done by
    the caller).

    TPU-first, patch-centric: FAST runs once over a horizontally
    STRIP-PACKED level canvas (levels side by side, each with an M-px
    edge-replicated margin) — a [L, H0, W0] batched canvas pays full-
    resolution FAST on every level (8x the level-0 area) where the true
    level content sums to ~3.3x, a measured ~2.4x waste in the hottest
    extraction stage. Per-level top-K selection keeps the exact per-level
    cell grids; then ONE 43x43 patch gather per keypoint feeds
    orientation (center 31x31 moments), a batched patch blur, and
    descriptor sampling by ``take_along_axis`` — the whole-image Gaussian
    blur and the scattered image-space descriptor gathers (the two
    measured hot spots of the per-level loop, ~16 ms of 46 ms on v5e)
    disappear entirely. Geometry notes: rolls reach 3 px and patches
    overshoot the 19-px keypoint border by at most 2+blur px, both < the
    2M = 8 px separating adjacent levels' content, so no cross-level
    contamination can reach a surviving keypoint or its descriptor.
    Detection matches ``extract_looped``; descriptors can differ only
    for keypoints whose blur window crosses the level boundary (margin
    edge-replication vs whole-image reflect).
    """
    L = config.n_levels
    H0, W0 = config.height, config.width
    M = PATCH_RAW - 19 + 2  # margin so patch slices never clamp
    levels = pyr_mod.build_pyramid(img, config.n_levels, config.scale)
    parts, offs = [], []
    x_cursor = 0
    for lv in levels:
        hl, wl = lv.shape
        parts.append(jnp.pad(
            lv, ((M, H0 + M - hl), (M, M)), mode="edge",
        ))
        offs.append(x_cursor + M)  # column of level content in the strip
        x_cursor += wl + 2 * M
    strip = jnp.concatenate(parts, axis=1)  # [H0+2M, sum(Wl+2M)]

    score = fast_mod.score_map_combined(
        strip, config.ini_threshold, config.min_threshold
    )

    out_xy, out_lvl, out_resp, out_valid = [], [], [], []
    border = 19
    for l in range(L):
        h, w = config.level_shape(l)
        sc = jax.lax.slice(score, (M, offs[l]), (M + h, offs[l] + w))
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        inb = (
            (ys >= border) & (ys < h - border)
            & (xs >= border) & (xs < w - border)
        )
        xy, resp, valid = fast_mod.select_grid(
            sc, inb, config.caps[l], config.cell_size(l)
        )
        out_xy.append(xy)
        out_lvl.append(jnp.full((config.caps[l],), l, jnp.int32))
        out_resp.append(resp)
        out_valid.append(valid)
    xy_lv = jnp.concatenate(out_xy)  # [N,2] level coords
    lvl = jnp.concatenate(out_lvl)
    resp = jnp.concatenate(out_resp)
    valid = jnp.concatenate(out_valid)

    # One raw patch per keypoint from the strip (level offset folded
    # into the column index — a 2-D gather, no level axis).
    S = 2 * PATCH_RAW + 1
    offs_arr = jnp.asarray(offs, jnp.int32)[lvl]
    y0 = xy_lv[:, 1].astype(jnp.int32) + M - PATCH_RAW
    x0 = xy_lv[:, 0].astype(jnp.int32) + offs_arr - PATCH_RAW
    patches = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(strip, (yy, xx), (S, S))
    )(y0, x0)  # [N, 43, 43]

    # Orientation from the center 31x31 (identical to angles_at).
    c0 = PATCH_RAW - PATCH_R
    center = patches[:, c0 : c0 + 2 * PATCH_R + 1, c0 : c0 + 2 * PATCH_R + 1]
    kern = jnp.stack(
        [jnp.asarray(_KX).reshape(-1), jnp.asarray(_KY).reshape(-1)], axis=-1
    )
    mom = center.reshape(center.shape[0], -1) @ kern  # [N,2] on the MXU
    ang = jnp.arctan2(mom[:, 1], mom[:, 0])

    bits = _descriptors_from_patches(_patch_blur(patches), ang)

    scale_l = jnp.asarray(
        [config.scale**l for l in range(L)], jnp.float32
    )[lvl][:, None]
    xy = xy_lv * scale_l
    return Features(
        xy=jnp.where(valid[:, None], xy, 0.0),
        level=lvl,
        angle=ang,
        response=resp,
        desc_packed=pack_bits(bits),
        desc_sign=jnp.where(valid[:, None], sign_expand(bits), 0),
        valid=valid,
    )


def extract_looped(img: jnp.ndarray, config: ExtractorConfig) -> Features:
    """Per-level (exact-size) extraction loop — the parity reference for
    ``extract``; identical math on each level's true-size image."""
    levels = pyr_mod.build_pyramid(img, config.n_levels, config.scale)
    out_xy, out_lvl, out_ang, out_resp = [], [], [], []
    out_bits, out_valid = [], []
    for l, lv in enumerate(levels):
        cap = config.caps[l]
        xy, resp, valid = fast_mod.detect_grid(
            lv,
            max_kp=cap,
            cell=config.cell_size(l),
            ini_threshold=config.ini_threshold,
            min_threshold=config.min_threshold,
        )
        ang = angles_at(lv, xy)
        blurred = pyr_mod.gaussian_blur(lv)
        bits = compute_descriptors(blurred, xy, ang)
        scale_l = config.scale**l
        out_xy.append(xy * scale_l)
        out_lvl.append(jnp.full((cap,), l, jnp.int32))
        out_ang.append(ang)
        out_resp.append(resp)
        out_bits.append(bits)
        out_valid.append(valid)
    xy = jnp.concatenate(out_xy)
    bits = jnp.concatenate(out_bits)
    valid = jnp.concatenate(out_valid)
    return Features(
        xy=jnp.where(valid[:, None], xy, 0.0),
        level=jnp.concatenate(out_lvl),
        angle=jnp.concatenate(out_ang),
        response=jnp.concatenate(out_resp),
        desc_packed=pack_bits(bits),
        desc_sign=jnp.where(valid[:, None], sign_expand(bits), 0),
        valid=valid,
    )
