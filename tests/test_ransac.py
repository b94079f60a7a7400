"""Tests for two-view RANSAC initialization."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import cameras, lie, ransac

CAM = np.asarray([400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0, 0], np.float32)


def two_view_scene(rng, n=300, outlier_frac=0.2, planar=False):
    if planar:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 6.0)],
            axis=-1,
        ).astype(np.float32)
    else:
        X = rng.uniform([-2, -1.5, 4], [2, 1.5, 9], size=(n, 3)).astype(np.float32)
    R21 = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.08, 0.01])), np.float32)
    t21 = np.asarray([0.35, 0.05, -0.02], np.float32)
    X2 = X @ R21.T + t21
    p1 = np.array(cameras.pinhole_project_nodist(jnp.asarray(CAM), jnp.asarray(X)))
    p2 = np.array(cameras.pinhole_project_nodist(jnp.asarray(CAM), jnp.asarray(X2)))
    p1 += rng.normal(size=p1.shape).astype(np.float32) * 0.4
    p2 += rng.normal(size=p2.shape).astype(np.float32) * 0.4
    n_out = int(n * outlier_frac)
    out = rng.choice(n, n_out, replace=False)
    # Realistic mismatches: wrong correspondences still inside the
    # matcher's 100 px search window (arbitrary-teleport outliers can be
    # epipolar-consistent by chance, which no two-view geometry can
    # reject — the pipeline's matching window is what excludes those).
    p2[out] += rng.uniform(-80, 80, size=(n_out, 2)).astype(np.float32)
    return X, R21, t21, p1, p2, out


class TestTwoViewInit:
    def test_recovers_motion(self, rng):
        X, R21, t21, p1, p2, out = two_view_scene(rng)
        res = ransac.two_view_init(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
            jnp.asarray(CAM), jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R21), R21, atol=3e-2)
        # translation up to scale
        t_est = np.asarray(res.t21)
        t_gt = t21 / np.linalg.norm(t21)
        assert min(np.linalg.norm(t_est - t_gt), np.linalg.norm(t_est + t_gt)) < 1e-1
        # scale-corrected points
        good = np.asarray(res.good)
        assert good.sum() > 150
        s = np.median(X[good][:, 2] / np.asarray(res.X1)[good][:, 2])
        err = np.linalg.norm(np.asarray(res.X1)[good] * s - X[good], axis=-1)
        # Pre-BA init accuracy: coherent structure, not metric precision
        # (the pipeline refines with full BA right after, and stray
        # epipolar-consistent mismatches are culled later).
        assert np.median(err) < 0.2, np.median(err)
        assert (err < 1.0).mean() > 0.9, (err < 1.0).mean()

    def test_outliers_excluded(self, rng):
        X, R21, t21, p1, p2, out = two_view_scene(rng, outlier_frac=0.3)
        res = ransac.two_view_init(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
            jnp.asarray(CAM), jax.random.PRNGKey(1),
        )
        assert bool(res.ok)
        good = np.asarray(res.good)
        assert good[out].mean() < 0.05

    def test_planar_scene_prefers_H(self, rng):
        X, R21, t21, p1, p2, out = two_view_scene(rng, outlier_frac=0.0, planar=True)
        res = ransac.two_view_init(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
            jnp.asarray(CAM), jax.random.PRNGKey(2),
        )
        assert float(res.score_H) > float(res.score_F) * 0.8

    def test_insufficient_matches_fails_gracefully(self, rng):
        p1 = rng.uniform(0, 640, size=(50, 2)).astype(np.float32)
        p2 = rng.uniform(0, 640, size=(50, 2)).astype(np.float32)  # random junk
        res = ransac.two_view_init(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(50, bool),
            jnp.asarray(CAM), jax.random.PRNGKey(3),
        )
        assert not bool(res.ok)

    def test_fit_fundamental_epipolar(self, rng):
        X, R21, t21, p1, p2, _ = two_view_scene(rng, outlier_frac=0.0)
        F = ransac.fit_fundamental(jnp.asarray(p1[:8]), jnp.asarray(p2[:8]))
        # all 8 points satisfy x2' F x1 ~ 0
        ph1 = np.concatenate([p1[:8], np.ones((8, 1), np.float32)], -1)
        ph2 = np.concatenate([p2[:8], np.ones((8, 1), np.float32)], -1)
        resid = np.einsum("ni,ij,nj->n", ph2, np.asarray(F), ph1)
        lines = ph1 @ np.asarray(F).T
        d = np.abs(resid) / np.linalg.norm(lines[:, :2], axis=-1)
        assert d.max() < 2.0


class TestHomographyReconstruction:
    def test_planar_scene_recovers_motion(self, rng):
        X, R21, t21, p1, p2, out = two_view_scene(rng, outlier_frac=0.05, planar=True)
        res = ransac.two_view_init(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
            jnp.asarray(CAM), jax.random.PRNGKey(4),
        )
        assert bool(res.used_H)
        assert bool(res.ok), (float(res.score_H), float(res.score_F))
        np.testing.assert_allclose(np.asarray(res.R21), R21, atol=3e-2)
        t_est = np.asarray(res.t21)
        t_gt = t21 / np.linalg.norm(t21)
        assert min(np.linalg.norm(t_est - t_gt), np.linalg.norm(t_est + t_gt)) < 0.1
        good = np.asarray(res.good)
        assert good.sum() > 150
