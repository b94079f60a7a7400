"""Guided feature matching: the reference's ORBmatcher search modes as
dense masked distance problems.

The reference implements 9 scalar search loops over grid buckets
(orb_slam3/src/ORBmatcher.cc: SearchByProjection :43/:1676/:1889,
SearchByBoW :223/:765, SearchForInitialization :648,
SearchForTriangulation :907, Fuse :1148/:1340, SearchBySim3 :1457). On
TPU all of them collapse to one pattern:

    dist = hamming_matrix(desc_a, desc_b)          # MXU matmul
    mask = geometric compatibility (radius / level / epipolar / validity)
    matches = masked best(+ratio)(+mutual)(+rotation-histogram)

The 64x48 grid accelerator (``Frame::GetFeaturesInArea``, Frame.cc:385)
is unnecessary — the full mask IS the candidate set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hamming
from .orb import Features

HISTO_BINS = 30  # rotation-consistency bins (ORBmatcher.cc HISTO_LENGTH=30)


def rotation_consistency(
    angle_q: jnp.ndarray, angle_t: jnp.ndarray, match_idx: jnp.ndarray
):
    """Keep only matches whose orientation difference falls in the 3 most
    popular histogram bins (reference ``ComputeThreeMaxima`` +
    CheckOrientation pattern, ORBmatcher.cc:2012-2056).

    Args:
      angle_q: [N] query angles (radians).
      angle_t: [M] train angles.
      match_idx: [N] int32 matched train index or -1.

    Returns filtered match_idx [N].
    """
    matched = match_idx >= 0
    idx = jnp.maximum(match_idx, 0)
    rot = angle_q - angle_t[idx]
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(rot, two_pi)  # [0, 2pi)
    bins = jnp.clip((rot * (HISTO_BINS / two_pi)).astype(jnp.int32), 0, HISTO_BINS - 1)
    hist = jnp.zeros((HISTO_BINS,), jnp.int32).at[bins].add(matched.astype(jnp.int32))
    top3 = jax.lax.top_k(hist, 3)[1]
    counts = jax.lax.top_k(hist, 3)[0]
    # Reference drops bins 2/3 when much smaller than bin 1 (<10% / <10%).
    keep2 = counts[1] > 0.1 * counts[0]
    keep3 = counts[2] > 0.1 * counts[0]
    in_top = (
        (bins == top3[0])
        | ((bins == top3[1]) & keep2)
        | ((bins == top3[2]) & keep3)
    )
    return jnp.where(matched & in_top, match_idx, -1)


def search_by_projection(
    proj_uv: jnp.ndarray,
    proj_valid: jnp.ndarray,
    proj_level: jnp.ndarray,
    proj_sign: jnp.ndarray,
    feats: Features,
    radius: float,
    scale: float = 1.2,
    level_slack: int = 1,
    max_dist: int = hamming.TH_HIGH,
    ratio: float = 0.9,
):
    """Project-and-match (reference SearchByProjection for tracking,
    ORBmatcher.cc:43-222 and :1676-1888).

    Args:
      proj_uv: [P, 2] predicted pixel positions of source features/points.
      proj_valid: [P] bool (in front of camera, in image, etc.).
      proj_level: [P] predicted octave — the search window scales with it
        and candidate features must lie in [level-slack, level+slack].
      proj_sign: [P, 256] int8 descriptors of the projected entities.
      feats: target frame features.
      radius: base search radius in level-0 pixels.

    Returns (match_idx [P] into feats, match_dist [P]).

    With ORB_TPU_PALLAS_MATCH=1 on TPU backends this uses the fused Pallas streaming kernel
    (``pallas_match.project_match_best2``) — O(P+N) HBM traffic — with
    injectivity enforced by a column-winner scatter; elsewhere the dense
    XLA path below is the reference implementation.
    """
    r = radius * scale ** proj_level.astype(jnp.float32)  # [P]
    import os

    if jax.default_backend() == "tpu" and os.environ.get(
        "ORB_TPU_PALLAS_MATCH", "0"
    ) == "1":
        from . import pallas_match

        idx0, best, second = pallas_match.project_match_best2(
            proj_uv, proj_valid, proj_level, proj_sign, r,
            feats.xy, feats.level, feats.valid, feats.desc_sign,
            level_slack=level_slack,
        )
        ok = (best <= max_dist) & (
            best.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
        )
        # Injectivity: each feature keeps only its lowest-distance suitor
        # (the role of the mutual-NN check in the dense path).
        N = feats.xy.shape[0]
        col_best = jnp.full((N,), hamming.INVALID_DIST, jnp.int32).at[
            jnp.clip(idx0, 0, N - 1)
        ].min(jnp.where(ok, best, hamming.INVALID_DIST))
        mutual = ok & (col_best[jnp.clip(idx0, 0, N - 1)] == best)
        return (
            jnp.where(mutual, idx0, -1).astype(jnp.int32),
            jnp.where(mutual, best, hamming.INVALID_DIST).astype(jnp.int32),
        )
    dist = hamming.hamming_matrix(proj_sign, feats.desc_sign)  # [P, N]
    d2 = jnp.sum((proj_uv[:, None, :] - feats.xy[None, :, :]) ** 2, axis=-1)
    in_rad = d2 <= (r[:, None] ** 2)
    lvl_ok = (feats.level[None, :] >= proj_level[:, None] - level_slack) & (
        feats.level[None, :] <= proj_level[:, None] + level_slack
    )
    mask = in_rad & lvl_ok & proj_valid[:, None] & feats.valid[None, :]
    idx, d = hamming.mutual_nn(dist, mask, max_dist=max_dist, ratio=ratio)
    return idx, d


def search_for_initialization(
    f1: Features,
    f2: Features,
    window: float = 100.0,
    max_dist: int = hamming.TH_LOW,
    ratio: float = 0.9,
):
    """Windowed search between the two initialization frames (reference
    ORBmatcher::SearchForInitialization, ORBmatcher.cc:648-763: window
    100 px, TH_LOW, ratio 0.9, rotation check).

    Deviation from the reference: the reference matches level-0
    keypoints only (it compensates by extracting 2x features during
    initialization, Tracking.cc:mpIniORBextractor); here all pyramid
    levels participate with |Δlevel| <= 1 compatibility — on this
    extractor's grid top-K distribution level 0 holds only ~30% of the
    budget, and the level-tolerant search quadruples the match count at
    identical precision (the H/F RANSAC gates outliers anyway).

    Returns (match_idx [N1] into f2, match_dist [N1]).
    """
    dist = hamming.hamming_matrix(f1.desc_sign, f2.desc_sign)
    d2 = jnp.sum((f1.xy[:, None, :] - f2.xy[None, :, :]) ** 2, axis=-1)
    mask = (
        (d2 <= window * window)
        & (jnp.abs(f1.level[:, None] - f2.level[None, :]) <= 1)
        & f1.valid[:, None]
        & f2.valid[None, :]
    )
    idx, d = hamming.mutual_nn(dist, mask, max_dist=max_dist, ratio=ratio)
    idx = rotation_consistency(f1.angle, f2.angle, idx)
    return idx, jnp.where(idx >= 0, d, hamming.INVALID_DIST)


def search_frame_frame(
    f1: Features,
    f2: Features,
    max_dist: int = hamming.TH_LOW,
    ratio: float = 0.75,
    use_rotation: bool = True,
):
    """Unconstrained descriptor matching between two frames (plays the
    role of SearchByBoW KF<->KF, ORBmatcher.cc:765-905 — the BoW node
    constraint there only prunes candidates for speed; the MXU computes
    the full matrix faster than the pruning bookkeeping).
    """
    dist = hamming.hamming_matrix(f1.desc_sign, f2.desc_sign)
    mask = f1.valid[:, None] & f2.valid[None, :]
    idx, d = hamming.mutual_nn(dist, mask, max_dist=max_dist, ratio=ratio)
    if use_rotation:
        idx = rotation_consistency(f1.angle, f2.angle, idx)
    return idx, jnp.where(idx >= 0, d, hamming.INVALID_DIST)


def epipolar_mask(
    F12: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    level2: jnp.ndarray,
    scale: float = 1.2,
    base_tol: float = 3.84,
):
    """Point-to-epipolar-line compatibility (reference
    ``ORBmatcher::SearchForTriangulation`` epipolar check via
    ``CheckDistEpipolarLine``, ORBmatcher.cc:907-1147).

    F12 maps homogeneous points of image 1 to lines in image 2.
    Tolerance grows with the candidate's octave like the reference's
    3.84 * sigma2 chi-square bound.
    """
    ones = jnp.ones_like(xy1[:, :1])
    p1 = jnp.concatenate([xy1, ones], axis=-1)  # [N1, 3]
    lines = p1 @ F12.T  # [N1, 3]
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    # distance^2 from each xy2 to each line
    d = a * xy2[None, :, 0] + b * xy2[None, :, 1] + c  # [N1, N2]
    den = a * a + b * b
    dsq = (d * d) / jnp.maximum(den, 1e-12)
    sigma2 = scale ** (2.0 * level2.astype(jnp.float32))  # [N2]
    return dsq < base_tol * sigma2[None, :]


def search_for_triangulation(
    f1: Features,
    f2: Features,
    F12: jnp.ndarray,
    already_matched1: jnp.ndarray,
    already_matched2: jnp.ndarray,
    max_dist: int = hamming.TH_LOW,
    scale: float = 1.2,
    base_tol: float = 3.84,
):
    """Epipolar-constrained match of yet-unmatched features between two
    keyframes for new-landmark triangulation (ORBmatcher.cc:907-1147).

    ``already_matched*``: bool masks of features that already have a
    landmark (excluded, like the reference's vbMatched checks).
    """
    dist = hamming.hamming_matrix(f1.desc_sign, f2.desc_sign)
    epi = epipolar_mask(F12, f1.xy, f2.xy, f2.level, scale=scale, base_tol=base_tol)
    mask = (
        epi
        & f1.valid[:, None]
        & f2.valid[None, :]
        & (~already_matched1)[:, None]
        & (~already_matched2)[None, :]
    )
    idx, d = hamming.mutual_nn(dist, mask, max_dist=max_dist, ratio=1.0)
    idx = rotation_consistency(f1.angle, f2.angle, idx)
    return idx, jnp.where(idx >= 0, d, hamming.INVALID_DIST)
