"""Camera models: Pinhole (+ radial-tangential distortion) and
Kannala-Brandt-8 fisheye — vmappable project/unproject/Jacobians.

Role of the reference's ``GeometricCamera`` hierarchy
(orb_slam3/include/CameraModels/GeometricCamera.h:43-106,
orb_slam3/src/CameraModels/Pinhole.cpp, KannalaBrandt8.cpp). The reference
dispatches virtually per point; here each model is a module of pure
functions over a parameter vector, batched over point arrays, and the
pipeline selects the model statically per camera.

Parameter layouts
-----------------
Pinhole: ``[fx, fy, cx, cy, k1, k2, p1, p2, k3]`` (distortion optional,
zeros = none; matches the reference's separate ``mDistCoef``).
KannalaBrandt8: ``[fx, fy, cx, cy, k0, k1, k2, k3]`` (theta-polynomial,
KannalaBrandt8.cpp projection: r = theta + k0 theta^3 + ... + k3 theta^9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Pinhole
# ---------------------------------------------------------------------------


def pinhole_project(params, X):
    """Project camera-frame points [..., 3] to pixels [..., 2].

    Applies radtan distortion if k-params are nonzero (the reference's
    Pinhole::project is distortion-free because it runs on pre-undistorted
    keypoints, Pinhole.cpp:31-38; we keep distortion here for generating
    synthetic data and for working on raw pixels).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, p1, p2, k3 = params[4], params[5], params[6], params[7], params[8]
    z = X[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = X[..., 0] * inv_z
    y = X[..., 1] * inv_z
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def pinhole_unproject(params, uv, iters: int = 8):
    """Pixels [..., 2] -> normalized camera ray [..., 3] with z = 1.

    Iterative undistortion (fixed ``iters`` Gauss-Newton-free fixpoint, the
    standard cv::undistortPoints scheme; the reference undistorts keypoints
    once per frame via OpenCV, Frame.cc:747-776).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, p1, p2, k3 = params[4], params[5], params[6], params[7], params[8]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return ((xd - dx) / radial, (yd - dy) / radial)

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def pinhole_project_jac(params, X):
    """d(uv)/dX for undistorted pinhole: [..., 2, 3].

    Matches the reference's ``Pinhole::projectJac`` (Pinhole.cpp:94-106)
    used by all reprojection-edge Jacobians (distortion-free: the
    optimizer always works on undistorted observations).
    """
    fx, fy = params[0], params[1]
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1)
    row1 = jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def pinhole_project_nodist(params, X):
    """Distortion-free projection (the optimizer's model)."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = X[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return jnp.stack(
        [fx * X[..., 0] * inv_z + cx, fy * X[..., 1] * inv_z + cy], axis=-1
    )


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 (fisheye)
# ---------------------------------------------------------------------------


def kb8_project(params, X):
    """KB8 fisheye projection (KannalaBrandt8.cpp:34-60):
    r(theta) = theta + k0 th^3 + k1 th^5 + k2 th^7 + k3 th^9.
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k0, k1, k2, k3 = params[4], params[5], params[6], params[7]
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    R2d = jnp.sqrt(x * x + y * y)
    R2d_safe = jnp.where(R2d < 1e-9, 1e-9, R2d)
    theta = jnp.arctan2(R2d, z)
    th2 = theta * theta
    r = theta * (1.0 + th2 * (k0 + th2 * (k1 + th2 * (k2 + th2 * k3))))
    return jnp.stack(
        [fx * r * x / R2d_safe + cx, fy * r * y / R2d_safe + cy], axis=-1
    )


def kb8_unproject(params, uv, iters: int = 10):
    """KB8 unprojection: Newton on the theta polynomial
    (KannalaBrandt8.cpp:110-145 runs Gauss-Newton likewise).
    Returns a ray with unit z-plane normalization [..., 3], z = 1.
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k0, k1, k2, k3 = params[4], params[5], params[6], params[7]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    r = jnp.sqrt(mx * mx + my * my)
    r = jnp.minimum(r, jnp.pi)  # clamp like the reference's theta_d bound

    def body(_, theta):
        th2 = theta * theta
        f = theta * (1.0 + th2 * (k0 + th2 * (k1 + th2 * (k2 + th2 * k3)))) - r
        fp = 1.0 + th2 * (3 * k0 + th2 * (5 * k1 + th2 * (7 * k2 + th2 * 9 * k3)))
        return theta - f / jnp.where(jnp.abs(fp) < 1e-9, 1e-9, fp)

    theta = jax.lax.fori_loop(0, iters, body, r)
    scale = jnp.where(r < 1e-9, 1.0, jnp.tan(theta) / jnp.where(r < 1e-9, 1.0, r))
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jac(params, X):
    """d(uv)/dX for KB8: [..., 2, 3] (analytic, KannalaBrandt8.cpp:171-214)."""
    jac = jax.jacfwd(lambda p: kb8_project(params, p))
    # vmap-friendly: use jacfwd on the last axis via reshape.
    flatX = X.reshape(-1, 3)
    J = jax.vmap(lambda p: jax.jacfwd(lambda q: kb8_project(params, q))(p))(flatX)
    return J.reshape(X.shape[:-1] + (2, 3))


# ---------------------------------------------------------------------------
# Static model dispatch (the GeometricCamera virtual interface,
# GeometricCamera.h:43-106, resolved at trace time: each jitted pipeline
# program is specialized to its camera model).
# ---------------------------------------------------------------------------


def project_model(params, X, model: str = "pinhole"):
    """Distortion-free projection under ``model`` (the optimizer's
    forward model: pinhole works on pre-undistorted observations like the
    reference, KB8 observations are raw fisheye pixels)."""
    if model == "kb8":
        return kb8_project(params, X)
    return pinhole_project_nodist(params, X)


def project_jac_model(params, X, model: str = "pinhole"):
    if model == "kb8":
        flatX = X.reshape(-1, 3)
        J = jax.vmap(jax.jacfwd(lambda q: kb8_project(params, q)))(flatX)
        return J.reshape(X.shape[:-1] + (2, 3))
    return pinhole_project_jac(params, X)


def unproject_model(params, uv, model: str = "pinhole"):
    if model == "kb8":
        return kb8_unproject(params, uv)
    return pinhole_unproject(params, uv)


def in_image(uv, width: int, height: int, margin: float = 0.0):
    """Frustum bounds check (role of ``Frame::isInFrustum`` image-bounds
    part, Frame.cc:512)."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < height - margin)
    )
