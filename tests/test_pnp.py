"""Tests for the PnP RANSAC solver (MLPnPsolver role)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import cameras, lie, pnp

CAM = np.asarray([400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0, 0], np.float32)


def pnp_scene(rng, n=200, outlier_frac=0.3, noise=0.4):
    X = rng.uniform([-3, -2, 4], [3, 2, 12], size=(n, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.15, -0.3, 0.4])), np.float32)
    t = np.asarray([0.5, -0.2, 1.0], np.float32)
    Xc = X @ R.T + t
    uv = np.array(cameras.pinhole_project_nodist(jnp.asarray(CAM), jnp.asarray(Xc)))
    uv += rng.normal(size=uv.shape).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    out = rng.choice(n, n_out, replace=False)
    uv[out] += rng.uniform(15, 120, size=(n_out, 2)).astype(np.float32) * np.sign(
        rng.normal(size=(n_out, 2))
    ).astype(np.float32)
    return X, uv, R, t, out


class TestPnP:
    def test_recovers_pose_with_outliers(self, rng):
        X, uv, R, t, out = pnp_scene(rng)
        res = pnp.solve_pnp(
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X), bool),
            jnp.asarray(CAM), jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-2)
        inl = np.asarray(res.inlier)
        assert inl[out].mean() < 0.1
        assert inl[np.setdiff1d(np.arange(len(X)), out)].mean() > 0.9

    def test_rejects_when_too_few_valid(self, rng):
        X, uv, R, t, out = pnp_scene(rng, n=40)
        valid = np.zeros(40, bool)
        valid[:8] = True
        uv[:8] = rng.uniform(0, 640, size=(8, 2)).astype(np.float32)  # garbage
        res = pnp.solve_pnp(
            jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
            jnp.asarray(CAM), jax.random.PRNGKey(1),
        )
        assert not bool(res.ok)

    def test_respects_valid_mask(self, rng):
        X, uv, R, t, _ = pnp_scene(rng, outlier_frac=0.0)
        valid = np.ones(len(X), bool)
        # poison the masked-out half with garbage; solver must ignore it
        valid[::2] = False
        uv[::2] = rng.uniform(0, 640, size=(len(X) // 2, 2)).astype(np.float32)
        res = pnp.solve_pnp(
            jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
            jnp.asarray(CAM), jax.random.PRNGKey(2),
        )
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-3)
        assert not np.asarray(res.inlier)[::2].any()
