"""SO(3) / SE(3) / Sim(3) Lie-group operations, pure JAX.

Plays the role of the vendored Sophus headers in the reference
(``orb_slam3/Thirdparty/Sophus/sophus/so3.hpp``, ``se3.hpp``, ``sim3.hpp``)
which back every pose in the system, and of g2o's ``se3quat.h`` / ``sim3.h``
used by the optimizer. Everything here is shape-polymorphic over leading
batch dimensions and differentiable, so the BA solver can ``vmap``/``grad``
through it.

Conventions
-----------
* Rotations are 3x3 matrices ``R``; poses are ``(R, t)`` pairs.
* se(3) tangent vectors are ``xi = [rho, phi]`` (translation part first,
  rotation part last) with ``exp(xi) = (exp(phi^), J_l(phi) rho)``.
* sim(3) tangent vectors are ``zeta = [rho, phi, sigma]`` (7,) with scale
  ``s = exp(sigma)``; a Sim3 element is ``(R, t, s)`` acting as
  ``x -> s R x + t`` (matches g2o's ``Sim3`` used by
  ``Optimizer::OptimizeEssentialGraph``, reference Optimizer.cc:1504).
* Small-angle branches use Taylor series selected with ``jnp.where`` on
  *sanitized* inputs so that both branches are NaN-free under ``grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8  # theta^2 threshold below which Taylor branches take over


def hat(w):
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of :func:`hat`: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sincos_coeffs(theta2):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3).

    NaN-safe: Taylor branch for small theta, exact elsewhere.
    """
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(safe_t2)
    a_exact = jnp.sin(t) / t
    b_exact = (1.0 - jnp.cos(t)) / safe_t2
    c_exact = (t - jnp.sin(t)) / (safe_t2 * t)
    a_taylor = 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0
    b_taylor = 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0
    c_taylor = 1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0
    return (
        jnp.where(small, a_taylor, a_exact),
        jnp.where(small, b_taylor, b_exact),
        jnp.where(small, c_taylor, c_exact),
    )


def so3_exp(phi):
    """Rodrigues formula: [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, _ = _sincos_coeffs(theta2)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R):
    """Matrix logarithm of a rotation: [..., 3, 3] -> [..., 3].

    Robust at both theta ~ 0 (Taylor) and theta ~ pi (diagonal/axis
    extraction), which matters for loop-closure relative rotations.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    vee_part = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    # Estimate sin(theta) from |vee| so that dividing vee by it is
    # self-consistent (arccos(trace) alone is catastrophically noisy near
    # pi: d(arccos)/d(cos) = 1/sin blows up the magnitude).
    #
    # AD-safety at the identity: ||vee|| has a NaN derivative at 0, and a
    # zero-residual pose-graph edge evaluates its Jacobian EXACTLY there
    # (measurements built from current poses), so the small-angle branch
    # must not reference theta at all. k -> 1/2 with O(theta^2) ~ 1e-9
    # relative error at the 5e-6 rad switch point — below float32 eps.
    n2 = jnp.sum(vee_part * vee_part, axis=-1)
    # ||vee|| is also ~0 at theta ~ pi; cos(theta) disambiguates.
    small = (n2 < 1e-10) & (cos_t > 0.0)  # 2 sin(theta) < 1e-5, theta ~ 0
    safe_n2 = jnp.where(small, 1.0, n2)
    sin_t = 0.5 * jnp.sqrt(safe_n2)  # dummy 0.5 in the small branch
    theta = jnp.where(
        small, 0.0, jnp.arctan2(sin_t, cos_t)
    )

    # Generic branch: phi = theta / (2 sin theta) * vee(R - R^T).
    near_pi = theta > 3.0  # axis direction of vee too noise-dominated beyond
    k = jnp.where(small, 0.5, theta / (2.0 * sin_t))
    phi_generic = k[..., None] * vee_part

    # Near-pi branch: axis from the largest diagonal of (R + I).
    # R = I cos + (1-cos) a a^T + sin [a]_x ; diag(R)_i = cos + (1-cos) a_i^2.
    one_minus_cos = jnp.maximum(1.0 - cos_t, 1e-12)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    a2 = jnp.maximum((diag - cos_t[..., None]) / one_minus_cos[..., None], 0.0)
    a_abs = jnp.sqrt(a2)
    # Pick dominant axis k, fix its sign positive, recover the others from
    # the symmetric part: (R + R^T)/2 = cos I + (1-cos) a a^T.
    sym = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    k_idx = jnp.argmax(a_abs, axis=-1)
    batch_shape = k_idx.shape

    def take_axis(i):
        # a with sign convention a[k] >= 0, others from sym[k, j].
        ak = jnp.maximum(a_abs[..., i], 1e-12)
        row = sym[..., i, :] / (one_minus_cos[..., None])  # ~ a_k * a_j / a_k...
        a = row / ak[..., None]
        a = a.at[..., i].set(ak)
        return a

    axes = jnp.stack([take_axis(i) for i in range(3)], axis=-2)  # [..., 3, 3]
    a_pi = jnp.take_along_axis(
        axes, k_idx.reshape(batch_shape + (1, 1)).astype(jnp.int32), axis=-2
    )[..., 0, :]
    a_pi = a_pi / jnp.maximum(jnp.linalg.norm(a_pi, axis=-1, keepdims=True), 1e-12)
    # Sign of axis from vee_part where it is informative (sin != 0 exactly at
    # pi gives vee = 0; then either sign is a valid log).
    sign = jnp.where(jnp.sum(a_pi * vee_part, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    phi_pi = theta[..., None] * a_pi * sign

    return jnp.where(near_pi[..., None], phi_pi, phi_generic)


def so3_left_jacobian(phi):
    """Left Jacobian J_l of SO(3): exp((phi + dphi)^) ~ exp((J_l dphi)^) exp(phi^)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    _, B, C = _sincos_coeffs(theta2)
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * (W @ W)


def so3_left_jacobian_inv(phi):
    """Inverse left Jacobian (closed form)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(safe_t2)
    half_t = 0.5 * t
    cot_exact = half_t / jnp.tan(half_t)
    k_exact = (1.0 - cot_exact) / safe_t2
    k_taylor = 1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0
    k = jnp.where(small, k_taylor, k_exact)
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye - 0.5 * W + k[..., None, None] * (W @ W)


def so3_right_jacobian(phi):
    """Right Jacobian J_r(phi) = J_l(-phi).

    This is the ``RightJacobianSO3`` of the reference IMU preintegration
    (reference orb_slam3/src/ImuTypes.cc:39-57).
    """
    return so3_left_jacobian(-phi)


def so3_right_jacobian_inv(phi):
    """Inverse right Jacobian (reference ImuTypes.cc:59-77)."""
    return so3_left_jacobian_inv(-phi)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def se3_exp(xi):
    """exp: [..., 6] (rho, phi) -> (R [...,3,3], t [...,3])."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), rho)
    return R, t


def se3_log(R, t):
    """log: (R, t) -> [..., 6] (rho, phi)."""
    phi = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_mul(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb)."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inv(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, x):
    """Apply pose to points: supports broadcasting over point batches."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------


def sim3_exp(zeta):
    """exp: [..., 7] (rho, phi, sigma) -> (R, t, s) with action x -> sRx + t.

    Uses the standard Sim(3) closed form (cf. g2o sim3.h used by the
    reference's essential-graph optimization, Optimizer.cc:1504).
    """
    rho, phi, sigma = zeta[..., :3], zeta[..., 3:6], zeta[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    small_t = theta2 < _EPS
    safe_t2 = jnp.where(small_t, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    small_s = jnp.abs(sigma) < 1e-5
    safe_sigma = jnp.where(small_s, 1.0, sigma)

    # W = A*I + B*hat(phi) + C*hat(phi)^2 such that t = W rho.
    # Coefficients from integrating exp(sigma u) exp(phi^ u) du over [0,1].
    sig2 = safe_sigma * safe_sigma
    es = jnp.exp(sigma)

    A_big = jnp.where(small_s, 1.0, (es - 1.0) / safe_sigma)
    A_taylor = 1.0 + sigma / 2.0 + sigma * sigma / 6.0
    A = jnp.where(small_s, A_taylor, A_big)

    # For the rotation-coupled terms use the full formula when theta finite.
    denom = sig2 + safe_t2
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    # B coefficient ((1 - cos)*like term):
    B_full = (
        (es * sin_t * safe_sigma + (1.0 - es * cos_t) * theta) / (theta * denom)
    )
    B_sigma0 = (1.0 - cos_t) / safe_t2
    B = jnp.where(small_s, B_sigma0, B_full)
    # theta -> 0 limit: ((sigma - 1) e^sigma + 1) / sigma^2.
    B_t0 = jnp.where(small_s, 0.5, (safe_sigma * es - es + 1.0) / sig2)
    B = jnp.where(small_t, B_t0, B)

    C_full = (
        A - ((es * cos_t - 1.0) * safe_sigma + es * sin_t * theta) / denom
    ) / safe_t2
    C_sigma0 = (theta - sin_t) / (safe_t2 * theta)
    C = jnp.where(small_s, C_sigma0, C_full)
    # theta -> 0 limit: ((0.5 sigma^2 - sigma + 1) e^sigma - 1) / sigma^3.
    C_t0 = jnp.where(
        small_s,
        1.0 / 6.0,
        ((0.5 * sig2 - safe_sigma + 1.0) * es - 1.0) / (sig2 * safe_sigma),
    )
    C = jnp.where(small_t, C_t0, C)

    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=zeta.dtype), R.shape)
    Wmat = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", Wmat, rho)
    return R, t, s


def sim3_log(R, t, s):
    """log: (R, t, s) -> [..., 7]. Inverse of :func:`sim3_exp` (via solve)."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    # Rebuild W from (phi, sigma) and solve W rho = t.
    zeta0 = jnp.concatenate(
        [jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1
    )
    # Reconstruct Wmat by calling sim3_exp on basis vectors is wasteful;
    # instead recompute coefficients by exp of zeros rho: use jacobian trick.
    eye3 = jnp.eye(3, dtype=t.dtype)

    def w_col(i):
        z = zeta0.at[..., i].set(1.0)
        _, ti, _ = sim3_exp(z)
        return ti

    Wmat = jnp.stack([w_col(0), w_col(1), w_col(2)], axis=-1)
    del eye3
    rho = jnp.linalg.solve(Wmat, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    """Composition of x -> sa Ra x + ta after x -> sb Rb x + tb."""
    return (
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
        sa * sb,
    )


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), s_inv


def sim3_apply(R, t, s, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


# ---------------------------------------------------------------------------
# Quaternion <-> matrix (for serialization / trajectory export, reference
# System::SaveTrajectoryEuRoC writes TUM-format qx qy qz qw, System.cc:646).
# ---------------------------------------------------------------------------


def quat_from_rotmat(R):
    """[..., 3, 3] -> unit quaternion [..., 4] as (qw, qx, qy, qz).

    Branch-free Shepperd method via the 4 candidate magnitudes.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    # Four candidate quaternions (unnormalized), one per dominant component.
    cand = jnp.stack(
        [
            jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1),
        ],
        axis=-2,
    )  # [..., 4(candidate), 4(component)]
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(
        cand, idx[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Canonical sign: qw >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rotmat_from_quat(q):
    """Unit quaternion (qw, qx, qy, qz) -> [..., 3, 3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def normalize_rotation(R):
    """Project a near-rotation onto SO(3) via SVD (used after additive
    drift, mirroring the reference's ``IMU::NormalizeRotation``,
    ImuTypes.cc:79-82)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones_like(det[..., None]), jnp.ones_like(det[..., None]), det[..., None]],
        axis=-1,
    )
    return (u * fix[..., None, :]) @ vt
