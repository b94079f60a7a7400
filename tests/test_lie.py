"""Unit tests for the Lie-group substrate (role of vendored Sophus tests,
reference orb_slam3/Thirdparty/Sophus/test/core/test_se3.cpp etc., which the
reference never builds — we do)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.ops import lie


def random_rotvecs(rng, n, scale=2.0):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return (v * scale / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
            * rng.uniform(0, 1, size=(n, 1))).astype(np.float32)


class TestSO3:
    def test_exp_is_rotation(self, rng):
        phi = random_rotvecs(rng, 64)
        R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        phi = random_rotvecs(rng, 128, scale=3.0)
        out = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(phi))))
        np.testing.assert_allclose(out, phi, atol=2e-4)

    def test_log_small_angle(self):
        phi = jnp.asarray([[1e-6, -2e-6, 1e-7], [0.0, 0.0, 0.0]], jnp.float32)
        out = np.asarray(lie.so3_log(lie.so3_exp(phi)))
        np.testing.assert_allclose(out, np.asarray(phi), atol=1e-8)

    def test_log_near_pi(self, rng):
        # Rotations within 1e-4 of pi about random axes.
        axis = rng.normal(size=(32, 3)).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        theta = (np.pi - 10 ** rng.uniform(-6, -1, size=(32, 1))).astype(np.float32)
        phi = axis * theta
        out = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(phi))))
        # log may return the antipodal representative; compare rotations.
        R1 = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        R2 = np.asarray(lie.so3_exp(jnp.asarray(out)))
        np.testing.assert_allclose(R1, R2, atol=5e-3)

    def test_left_jacobian_fd(self, rng):
        phi = random_rotvecs(rng, 8, scale=1.5).astype(np.float32)
        eps = 1e-3  # f32: keep the perturbation well above rounding noise
        J = np.asarray(lie.so3_left_jacobian(jnp.asarray(phi)))
        for k in range(3):
            d = np.zeros(3, np.float32); d[k] = eps
            Rp = np.asarray(lie.so3_exp(jnp.asarray(phi + d)))
            R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
            dR = np.einsum("nij,nkj->nik", Rp, R)  # Rp R^T ~ exp(J_l d)
            dphi = np.asarray(lie.so3_log(jnp.asarray(dR))) / eps
            np.testing.assert_allclose(dphi, J[:, :, k], atol=2e-2)

    def test_jacobian_inverse(self, rng):
        phi = jnp.asarray(random_rotvecs(rng, 32, scale=2.5))
        J = lie.so3_left_jacobian(phi)
        Jinv = lie.so3_left_jacobian_inv(phi)
        prod = np.asarray(J @ Jinv)
        np.testing.assert_allclose(prod, np.tile(np.eye(3), (32, 1, 1)), atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 6)).astype(np.float32)
        # Tangent roundtrip only holds on the principal domain |phi| < pi.
        nrm = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= np.minimum(1.0, 2.8 / np.maximum(nrm, 1e-9))
        xi = jnp.asarray(xi)
        R, t = lie.se3_exp(xi)
        out = np.asarray(lie.se3_log(R, t))
        np.testing.assert_allclose(out, np.asarray(xi), atol=1e-3)

    def test_mul_inv(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inv(R, t)
        Re, te = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Re), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)

    def test_apply(self, rng):
        xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
        R, t = lie.se3_exp(xi)
        x = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        y = lie.se3_apply(R, t, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x) @ np.asarray(R).T + np.asarray(t), atol=1e-5
        )


class TestSim3:
    def test_exp_matches_numerical_integration(self, rng):
        """t = (integral_0^1 e^{sigma u} exp(u phi^) du) rho — check against
        a fine Riemann sum, covering generic/small-theta/small-sigma cells."""
        cases = []
        for sig in [0.0, 1e-7, 0.3, -0.8]:
            for th in [0.0, 1e-7, 0.5, 2.5]:
                axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
                rho = rng.normal(size=3)
                cases.append(np.concatenate([rho, axis * th, [sig]]))
        cases = np.asarray(cases)
        zeta = jnp.asarray(cases.astype(np.float32))
        R, t, s = lie.sim3_exp(zeta)
        # Vectorized midpoint-rule integration (batched over cases x steps).
        n_steps = 4096
        u = (np.arange(n_steps) + 0.5) / n_steps  # [S]
        phi_all = cases[:, 3:6]  # [C, 3]
        sig_all = cases[:, 6]  # [C]
        u_phi = u[None, :, None] * phi_all[:, None, :]  # [C, S, 3]
        R_all = np.asarray(lie.so3_exp(jnp.asarray(u_phi, jnp.float32)))  # [C,S,3,3]
        w_all = np.exp(sig_all[:, None] * u[None, :]) / n_steps  # [C, S]
        W = np.einsum("cs,csij->cij", w_all, R_all)
        t_ref = np.einsum("cij,cj->ci", W, cases[:, :3])
        np.testing.assert_allclose(np.asarray(t), t_ref, atol=5e-3)
        np.testing.assert_allclose(np.asarray(s), np.exp(sig_all), rtol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        zeta = rng.normal(size=(32, 7)).astype(np.float32) * 0.8
        R, t, s = lie.sim3_exp(jnp.asarray(zeta))
        out = np.asarray(lie.sim3_log(R, t, s))
        np.testing.assert_allclose(out, zeta, atol=2e-3)

    def test_mul_inv(self, rng):
        zeta = jnp.asarray(rng.normal(size=(8, 7)).astype(np.float32) * 0.5)
        R, t, s = lie.sim3_exp(zeta)
        Ri, ti, si = lie.sim3_inv(R, t, s)
        Re, te, se = lie.sim3_mul(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(np.asarray(Re), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(se), 1.0, atol=1e-5)

    def test_action_composition(self, rng):
        za = jnp.asarray(rng.normal(size=(7,)).astype(np.float32) * 0.5)
        zb = jnp.asarray(rng.normal(size=(7,)).astype(np.float32) * 0.5)
        Ra, ta, sa = lie.sim3_exp(za)
        Rb, tb, sb = lie.sim3_exp(zb)
        x = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        y1 = lie.sim3_apply(*lie.sim3_mul(Ra, ta, sa, Rb, tb, sb), x)
        y2 = lie.sim3_apply(Ra, ta, sa, lie.sim3_apply(Rb, tb, sb, x))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


class TestQuat:
    def test_roundtrip(self, rng):
        phi = jnp.asarray(random_rotvecs(rng, 64, scale=3.1))
        R = lie.so3_exp(phi)
        q = lie.quat_from_rotmat(R)
        R2 = lie.rotmat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_normalize_rotation(self, rng):
        phi = jnp.asarray(random_rotvecs(rng, 8))
        R = np.asarray(lie.so3_exp(phi)) + rng.normal(size=(8, 3, 3)).astype(np.float32) * 1e-3
        Rn = np.asarray(lie.normalize_rotation(jnp.asarray(R)))
        eye = np.einsum("nij,nkj->nik", Rn, Rn)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)


def test_jit_and_vmap_compose(rng):
    """Everything must be jit/vmap-friendly (no data-dependent control flow)."""
    xi = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    f = jax.jit(jax.vmap(lambda v: lie.se3_log(*lie.se3_exp(v))))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-3)
