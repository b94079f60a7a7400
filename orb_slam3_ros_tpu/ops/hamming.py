"""Binary-descriptor Hamming distance as an MXU matmul.

Role of the reference's ``ORBmatcher::DescriptorDistance`` (reference
orb_slam3/src/ORBmatcher.cc:2058-2075, the classic XOR+popcount) — but
TPU-first: with descriptors sign-expanded to s in {-1, +1}^256,

    dot(s_a, s_b) = 256 - 2 * hamming(a, b)
    =>  hamming = (256 - dot) / 2

so an [N, 256] x [256, M] int8 matmul on the MXU computes all N*M
distances at once. Every search mode in ``matching.py`` builds on this
dense distance matrix plus compatibility masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_BITS = 256

# Matching thresholds (reference ORBmatcher.cc:35-37).
TH_LOW = 50
TH_HIGH = 100
INVALID_DIST = 999  # sentinel > any real distance (max 256)


def hamming_matrix(sign_a: jnp.ndarray, sign_b: jnp.ndarray) -> jnp.ndarray:
    """[N, 256] int8 x [M, 256] int8 -> [N, M] int32 Hamming distances.

    Rows that are all-zero (invalid features) land at distance 128 —
    above both thresholds, so they never match.
    """
    s = jax.lax.dot_general(
        sign_a,
        sign_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (N_BITS - s) // 2


def popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-population count of uint32 lanes (SWAR; used for spot checks
    against the matmul path and for small one-off distances)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_packed(packed_a: jnp.ndarray, packed_b: jnp.ndarray) -> jnp.ndarray:
    """[..., 8] uint32 pairwise distance along the last axis (no
    broadcasting blow-up; use for already-paired descriptors)."""
    return jnp.sum(popcount32(packed_a ^ packed_b), axis=-1)


def masked_best2(dist: jnp.ndarray, mask: jnp.ndarray):
    """Per-row best and second-best over a masked distance matrix.

    Args:
      dist: [N, M] int distances.
      mask: [N, M] bool; False entries are excluded.

    Returns:
      (best_idx [N], best [N], second [N]) with INVALID_DIST fills.
    """
    d = jnp.where(mask, dist, INVALID_DIST)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(INVALID_DIST)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


def mutual_nn(
    dist: jnp.ndarray,
    mask: jnp.ndarray,
    max_dist: int = TH_LOW,
    ratio: float = 1.0,
):
    """Mutual nearest-neighbor matching with optional Lowe ratio test.

    Mirrors the contract of the reference's best/second-best checks
    (``mnratio`` logic e.g. ORBmatcher.cc:223-330) with mutual-NN standing
    in for its rotation-histogram global filter (that check is applied
    separately, see ``matching.rotation_consistency``).

    Returns:
      match_idx [N] int32: column index matched to each row, -1 if none.
      match_dist [N] int32.
    """
    best_idx, best, second = masked_best2(dist, mask)
    ok = (best <= max_dist) & (best.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    # Mutual check: the row must also be the best for its matched column.
    dT = jnp.where(mask, dist, INVALID_DIST).T
    col_best_row = jnp.argmin(dT, axis=1)  # [M]
    mutual = col_best_row[best_idx] == jnp.arange(dist.shape[0])
    ok = ok & mutual
    return jnp.where(ok, best_idx, -1).astype(jnp.int32), jnp.where(
        ok, best, INVALID_DIST
    ).astype(jnp.int32)
