"""Tests for pose optimization and bundle adjustment against synthetic
ground truth (the role the fork's offline regression harness plays for the
reference: dump problem -> solve -> compare, test_op_data.cpp pattern)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import ba, cameras, lie, pose_opt, triangulate

CAM = np.asarray([400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0, 0], np.float32)


def make_scene(rng, n_pts=200, n_cams=4, noise_px=0.5):
    """Random points in front of a ring of cameras; returns GT + obs."""
    X = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], size=(n_pts, 3)).astype(np.float32)
    Rs, ts, uvs = [], [], []
    for k in range(n_cams):
        phi = 0.06 * rng.normal(size=3).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        t = np.asarray([0.3 * k - 0.5, 0.1 * rng.normal(), 0.2 * rng.normal()], np.float32)
        Xc = X @ R.T + t
        uv = np.array(cameras.pinhole_project_nodist(jnp.asarray(CAM), jnp.asarray(Xc)))
        uv += rng.normal(size=uv.shape).astype(np.float32) * noise_px
        Rs.append(R); ts.append(t); uvs.append(uv)
    return X, np.stack(Rs), np.stack(ts), np.stack(uvs)


class TestPoseOptimization:
    def test_recovers_pose(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=300, n_cams=1, noise_px=0.3)
        R_gt, t_gt, uv = Rs[0], ts[0], uvs[0]
        # Perturb the initial pose.
        dxi = rng.normal(size=6).astype(np.float32) * np.asarray([0.1] * 3 + [0.05] * 3, np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(dxi))
        R0 = np.asarray(dR) @ R_gt
        t0 = np.asarray(dR) @ t_gt + np.asarray(dt)
        res = pose_opt.pose_optimization(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(len(X)), jnp.ones(len(X), bool), jnp.asarray(CAM),
        )
        assert int(res.n_inliers) > 280
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1e-2)

    def test_rejects_outliers(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=300, n_cams=1, noise_px=0.3)
        uv = uvs[0].copy()
        out = rng.choice(300, 60, replace=False)
        uv[out] += rng.uniform(20, 80, size=(60, 2)).astype(np.float32)
        dxi = rng.normal(size=6).astype(np.float32) * 0.03
        dR, dt = lie.se3_exp(jnp.asarray(dxi))
        R0 = np.asarray(dR) @ Rs[0]
        t0 = np.asarray(dR) @ ts[0] + np.asarray(dt)
        res = pose_opt.pose_optimization(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(300), jnp.ones(300, bool), jnp.asarray(CAM),
        )
        inl = np.asarray(res.inlier)
        assert inl[out].mean() < 0.15, "outliers kept"
        assert inl[np.setdiff1d(np.arange(300), out)].mean() > 0.9
        np.testing.assert_allclose(np.asarray(res.R), Rs[0], atol=3e-3)

    def test_invalid_edges_ignored(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=100, n_cams=1)
        valid = np.ones(100, bool); valid[50:] = False
        # Corrupt invalid observations wildly; result must be unaffected.
        uv = uvs[0].copy(); uv[50:] = 1e5
        res = pose_opt.pose_optimization(
            jnp.asarray(Rs[0]), jnp.asarray(ts[0]), jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(100), jnp.asarray(valid), jnp.asarray(CAM),
        )
        np.testing.assert_allclose(np.asarray(res.R), Rs[0], atol=1e-3)


def build_problem(rng, X, Rs, ts, uvs, K_cap, P_cap, E_cap, perturb_scale=0.0,
                  pt_noise=0.0, n_fixed=2):
    n_cams, n_pts = len(Rs), len(X)
    cam_idx = np.repeat(np.arange(n_cams), n_pts)
    pt_idx = np.tile(np.arange(n_pts), n_cams)
    uv = uvs.reshape(-1, 2)
    E = len(cam_idx)
    R0 = Rs.copy(); t0 = ts.copy()
    for k in range(n_fixed, n_cams):
        dxi = rng.normal(size=6).astype(np.float32) * perturb_scale
        dR, dt = lie.se3_exp(jnp.asarray(dxi))
        t0[k] = np.asarray(dR) @ ts[k] + np.asarray(dt)
        R0[k] = np.asarray(dR) @ Rs[k]
    X0 = X + rng.normal(size=X.shape).astype(np.float32) * pt_noise

    pad_cam = K_cap - n_cams
    pad_pt = P_cap - n_pts
    pad_e = E_cap - E
    prob = ba.BAProblem(
        R=jnp.asarray(np.concatenate([R0, np.tile(np.eye(3, dtype=np.float32), (pad_cam, 1, 1))])),
        t=jnp.asarray(np.concatenate([t0, np.zeros((pad_cam, 3), np.float32)])),
        cam_fixed=jnp.asarray(np.concatenate([np.arange(n_cams) < n_fixed, np.ones(pad_cam, bool)])),
        cam_valid=jnp.asarray(np.concatenate([np.ones(n_cams, bool), np.zeros(pad_cam, bool)])),
        X=jnp.asarray(np.concatenate([X0, np.zeros((pad_pt, 3), np.float32)])),
        pt_valid=jnp.asarray(np.concatenate([np.ones(n_pts, bool), np.zeros(pad_pt, bool)])),
        cam_idx=jnp.asarray(np.concatenate([cam_idx, np.zeros(pad_e, np.int32)]).astype(np.int32)),
        pt_idx=jnp.asarray(np.concatenate([pt_idx, np.zeros(pad_e, np.int32)]).astype(np.int32)),
        uv=jnp.asarray(np.concatenate([uv, np.zeros((pad_e, 2), np.float32)])),
        inv_sigma2=jnp.ones(E_cap, jnp.float32),
        edge_valid=jnp.asarray(np.concatenate([np.ones(E, bool), np.zeros(pad_e, bool)])),
        cam_params=jnp.asarray(CAM),
        ur=jnp.full((E_cap,), -1.0, jnp.float32),
        bf=jnp.zeros(()),
    )
    return prob


class TestBundleAdjustment:
    def test_converges_from_perturbation(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=150, n_cams=5, noise_px=0.0)
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=8, P_cap=256, E_cap=1024,
                             perturb_scale=0.02, pt_noise=0.05)
        res = ba.bundle_adjust(prob, n_iters=15)
        # Noise-free observations: cost should collapse to ~0.
        assert float(res.cost) < 1e-1, float(res.cost)
        for k in range(5):
            np.testing.assert_allclose(np.asarray(res.R)[k], Rs[k], atol=5e-3)
            np.testing.assert_allclose(np.asarray(res.t)[k], ts[k], atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.X)[:150], X, atol=5e-2)

    def test_fixed_cameras_stay_fixed(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=100, n_cams=4)
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=8, P_cap=128, E_cap=512,
                             perturb_scale=0.05, pt_noise=0.02)
        res = ba.bundle_adjust(prob, n_iters=8)
        np.testing.assert_array_equal(np.asarray(res.R)[0], np.asarray(prob.R)[0])
        np.testing.assert_array_equal(np.asarray(res.t)[1], np.asarray(prob.t)[1])

    def test_robust_downweights_outliers(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=120, n_cams=4, noise_px=0.3)
        uvs = uvs.copy()
        uvs[2, :20] += 50.0  # 20 gross outlier observations in cam 2
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=8, P_cap=128, E_cap=512,
                             perturb_scale=0.01, pt_noise=0.02)
        res = ba.bundle_adjust(prob, n_iters=12)
        inl = np.asarray(res.inlier)
        e_out = 2 * 120 + np.arange(20)
        assert inl[e_out].mean() < 0.3
        for k in range(2, 4):
            np.testing.assert_allclose(np.asarray(res.R)[k], Rs[k], atol=1e-2)

    def test_cost_monotone_under_accept(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=100, n_cams=3, noise_px=0.5)
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=4, P_cap=128, E_cap=512,
                             perturb_scale=0.03, pt_noise=0.05)
        r1 = ba.bundle_adjust(prob, n_iters=3)
        r2 = ba.bundle_adjust(prob, n_iters=12)
        assert float(r2.cost) <= float(r1.cost) + 1e-3


class TestTriangulate:
    def test_dlt_recovers_points(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=100, n_cams=2, noise_px=0.0)
        # rays in each camera
        r1 = cameras.pinhole_unproject(jnp.asarray(CAM), jnp.asarray(uvs[0]))
        r2 = cameras.pinhole_unproject(jnp.asarray(CAM), jnp.asarray(uvs[1]))
        # camera1 frame: X1 = R1 X + t1; camera2: X2 = R2 X + t2
        # => X2 = R2 R1^T (X1 - t1) + t2 = R21 X1 + t21
        R21 = Rs[1] @ Rs[0].T
        t21 = ts[1] - R21 @ ts[0]
        X1 = triangulate.triangulate_dlt(
            r1, r2, jnp.asarray(R21.astype(np.float32)), jnp.asarray(t21.astype(np.float32))
        )
        X1_gt = X @ Rs[0].T + ts[0]
        np.testing.assert_allclose(np.asarray(X1), X1_gt, atol=2e-2, rtol=1e-3)

    def test_fundamental_epipolar_constraint(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=50, n_cams=2, noise_px=0.0)
        K = triangulate.K_matrix(jnp.asarray(CAM))
        # F maps image-1 points to image-2 lines; (R12,t12): cam2 -> cam1.
        R21 = Rs[1] @ Rs[0].T
        t21 = (ts[1] - R21 @ ts[0]).astype(np.float32)
        R12 = R21.T
        t12 = (-R21.T @ t21).astype(np.float32)
        F = triangulate.fundamental_from_poses(K, K, jnp.asarray(R12), jnp.asarray(t12))
        p1 = np.concatenate([uvs[0], np.ones((50, 1), np.float32)], -1)
        p2 = np.concatenate([uvs[1], np.ones((50, 1), np.float32)], -1)
        resid = np.abs(np.einsum("ni,ij,nj->n", p2, np.asarray(F), p1))
        # normalize by line norm -> pixel distance
        lines = p1 @ np.asarray(F).T
        d = resid / np.linalg.norm(lines[:, :2], axis=-1)
        assert d.max() < 0.1, d.max()


class TestRowStructuredBA:
    def test_row_path_matches_scatter_path(self, rng):
        """row_n (one-hot MXU accumulation) must reproduce the scatter
        path exactly: same blocks, same LM trajectory."""
        X, Rs, ts, uvs = make_scene(rng, n_pts=128, n_cams=4, noise_px=0.3)
        # no padding: E = 4 rows x 128 edges, cam-major -> row_n = 128
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=4, P_cap=128,
                             E_cap=512, perturb_scale=0.03, pt_noise=0.05)
        r_scatter = ba.bundle_adjust(prob, n_iters=6)
        r_rows = ba.bundle_adjust(prob, n_iters=6, row_n=128)
        # fp-identical math up to summation order; divergence grows with
        # LM iterations (measured ~6e-7 in R at iter 1, ~1.5e-5 at 6).
        np.testing.assert_allclose(
            np.asarray(r_rows.R), np.asarray(r_scatter.R), rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(r_rows.t), np.asarray(r_scatter.t), rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(r_rows.X), np.asarray(r_scatter.X), rtol=0, atol=2e-3
        )
        assert abs(float(r_rows.cost) - float(r_scatter.cost)) < 1e-2

    def test_row_path_invalid_edges_ignored(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=128, n_cams=4, noise_px=0.0)
        uvs = uvs.copy()
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=4, P_cap=128,
                             E_cap=512, perturb_scale=0.02, pt_noise=0.03)
        # corrupt half of camera 3's observations and mark them invalid
        ev = np.asarray(prob.edge_valid).copy()
        uv = np.asarray(prob.uv).copy()
        ev[3 * 128 + 64 :] = False
        uv[3 * 128 + 64 :] = 1e6
        prob = prob._replace(edge_valid=jnp.asarray(ev), uv=jnp.asarray(uv))
        res = ba.bundle_adjust(prob, n_iters=10, row_n=128)
        assert float(res.cost) < 1e-1
        for k in range(2, 4):
            np.testing.assert_allclose(np.asarray(res.R)[k], Rs[k], atol=5e-3)
