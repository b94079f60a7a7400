"""DLT triangulation + fundamental-matrix composition, batched.

Role of the reference's ``GeometricTools::Triangulate`` (DLT via SVD of a
4x4 system, orb_slam3/src/GeometricTools.cc) and ``ComputeF12``
(F = K1^-T [t]_x R K2^-1 composition used to constrain triangulation
searches, GeometricTools.h:37-41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie


def triangulate_dlt(ray1: jnp.ndarray, ray2: jnp.ndarray, R21: jnp.ndarray, t21: jnp.ndarray):
    """Batched two-view DLT in normalized coordinates.

    Args:
      ray1: [..., 3] normalized coords in camera 1 (z = 1).
      ray2: [..., 3] normalized coords in camera 2.
      R21, t21: pose of camera 1 in camera 2 (x2 = R21 x1 + t21).

    Returns X1 [..., 3]: points in camera-1 frame.

    Solves the 4x4 DLT via the eigenvector of A^T A with smallest
    eigenvalue (self-adjoint eigendecomposition batches well on TPU and
    matches JacobiSVD behavior for this use).
    """
    # Projection matrices: P1 = [I | 0], P2 = [R21 | t21].
    x1, y1 = ray1[..., 0], ray1[..., 1]
    x2, y2 = ray2[..., 0], ray2[..., 1]
    P2 = jnp.concatenate([R21, t21[..., None]], axis=-1)  # [3,4]
    row0 = jnp.stack(
        [jnp.ones_like(x1), jnp.zeros_like(x1), -x1, jnp.zeros_like(x1)], -1
    )
    row1 = jnp.stack(
        [jnp.zeros_like(y1), jnp.ones_like(y1), -y1, jnp.zeros_like(y1)], -1
    )
    row2 = x2[..., None] * P2[2] - P2[0]
    row3 = y2[..., None] * P2[2] - P2[1]
    A = jnp.stack([row0, row1, row2, row3], axis=-2)  # [..., 4, 4]
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]  # smallest eigenvalue eigenvector
    w = h[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    return h[..., :3] / w_safe[..., None]


def fundamental_from_poses(K1: jnp.ndarray, K2: jnp.ndarray, R12: jnp.ndarray, t12: jnp.ndarray):
    """F12 such that x2^T F12 x1 = 0 ... using the convention of the
    reference (``GeometricTools::ComputeF12`` with T12 = T1w * Tw2):
    here (R12, t12) maps camera-2 coords into camera-1.

    Returns F mapping homogeneous pixels of image 1 to lines in image 2?
    No — following ``epipolar_mask`` in matching.py we need F21 that maps
    image-1 points to image-2 lines: l2 = F * p1 with
    F = K2^-T [t21]_x R21 K1^-1 where x2 = R21 x1 + t21.
    """
    R21 = R12.T
    t21 = -R12.T @ t12
    E = lie.hat(t21) @ R21
    K1inv = jnp.linalg.inv(K1)
    K2inv = jnp.linalg.inv(K2)
    return K2inv.T @ E @ K1inv


def K_matrix(params: jnp.ndarray) -> jnp.ndarray:
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], params.dtype)


def parallax_cos(X1: jnp.ndarray, C2_in_1: jnp.ndarray):
    """Cosine of the parallax angle at each point between camera centers
    (used for the reference's low-parallax rejection, e.g.
    LocalMapping::CreateNewMapPoints cosParallaxRays checks)."""
    d1 = X1
    d2 = X1 - C2_in_1
    n1 = jnp.linalg.norm(d1, axis=-1)
    n2 = jnp.linalg.norm(d2, axis=-1)
    return jnp.sum(d1 * d2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)
