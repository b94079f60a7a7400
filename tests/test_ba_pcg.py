"""Matrix-free Schur-PCG bundle adjustment tests: agreement with the dense
Schur solver on small problems, convergence at global-BA scale (K ~ 100),
and native KannalaBrandt8 residuals (no rectification)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import ba, ba_pcg, cameras, lie

from test_solvers import CAM, build_problem, make_scene

KB8 = np.asarray([285.0, 286.0, 320.0, 240.0, -0.007, 0.045, -0.043, 0.008, 0.0],
                 np.float32)


class TestPCGMatchesDense:
    def test_same_solution_small(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=150, n_cams=5, noise_px=0.0)
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=8, P_cap=256, E_cap=1024,
                             perturb_scale=0.02, pt_noise=0.05)
        rd = ba.bundle_adjust(prob, n_iters=12)
        rp = ba_pcg.bundle_adjust_pcg(prob, n_iters=12, n_cg=40)
        assert float(rp.cost) < 1e-1, float(rp.cost)
        # Both land on the ground truth, so they agree with each other.
        np.testing.assert_allclose(np.asarray(rp.R)[:5], np.asarray(rd.R)[:5], atol=5e-3)
        np.testing.assert_allclose(np.asarray(rp.t)[:5], np.asarray(rd.t)[:5], atol=2e-2)

    def test_fixed_cameras_stay_fixed(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=100, n_cams=4)
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=8, P_cap=128, E_cap=512,
                             perturb_scale=0.05, pt_noise=0.02)
        res = ba_pcg.bundle_adjust_pcg(prob, n_iters=8)
        np.testing.assert_array_equal(np.asarray(res.R)[0], np.asarray(prob.R)[0])
        np.testing.assert_array_equal(np.asarray(res.t)[1], np.asarray(prob.t)[1])

    def test_robust_downweights_outliers(self, rng):
        X, Rs, ts, uvs = make_scene(rng, n_pts=120, n_cams=4, noise_px=0.3)
        uvs = uvs.copy()
        uvs[2, :20] += 50.0
        prob = build_problem(rng, X, Rs, ts, uvs, K_cap=8, P_cap=128, E_cap=512,
                             perturb_scale=0.01, pt_noise=0.02)
        res = ba_pcg.bundle_adjust_pcg(prob, n_iters=12)
        inl = np.asarray(res.inlier)
        e_out = 2 * 120 + np.arange(20)
        assert inl[e_out].mean() < 0.3
        for k in range(2, 4):
            np.testing.assert_allclose(np.asarray(res.R)[k], Rs[k], atol=1e-2)


class TestPCGGlobalScale:
    def test_large_k_converges(self, rng):
        """K = 96 keyframes — far beyond the dense [K,K,6,6] regime the
        local-BA solver is sized for."""
        n_cams, n_pts = 96, 600
        X = rng.uniform([-4, -3, 4], [4, 3, 14], size=(n_pts, 3)).astype(np.float32)
        Rs, ts, uvs = [], [], []
        for k in range(n_cams):
            phi = 0.04 * rng.normal(size=3).astype(np.float32)
            R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
            t = np.asarray([0.05 * k - 2.4, 0.05 * rng.normal(), 0.05 * rng.normal()],
                           np.float32)
            Xc = X @ R.T + t
            uv = np.array(cameras.pinhole_project_nodist(jnp.asarray(CAM), jnp.asarray(Xc)))
            Rs.append(R); ts.append(t); uvs.append(uv)
        X_gt, Rs, ts, uvs = X, np.stack(Rs), np.stack(ts), np.stack(uvs)
        prob = build_problem(rng, X_gt, Rs, ts, uvs, K_cap=96, P_cap=640,
                             E_cap=n_cams * n_pts, perturb_scale=0.02, pt_noise=0.05)
        res = ba_pcg.bundle_adjust_pcg(prob, n_iters=10, n_cg=60)
        assert float(res.cost) < 1.0, float(res.cost)
        err_R = np.abs(np.asarray(res.R)[:n_cams] - Rs).max()
        assert err_R < 1e-2, err_R


class TestPCGFisheye:
    def test_kb8_residuals_converge(self, rng):
        """Native KB8 BA (reference: KannalaBrandt8 projectJac feeding
        EdgeSE3ProjectXYZ — here the fisheye model is differentiated
        directly, no rectification)."""
        n_pts, n_cams = 150, 4
        X = rng.uniform([-2, -1.5, 3], [2, 1.5, 8], size=(n_pts, 3)).astype(np.float32)
        Rs, ts, uvs = [], [], []
        for k in range(n_cams):
            phi = 0.05 * rng.normal(size=3).astype(np.float32)
            R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
            t = np.asarray([0.25 * k - 0.4, 0.05, 0.0], np.float32)
            Xc = X @ R.T + t
            uv = np.array(cameras.kb8_project(jnp.asarray(KB8), jnp.asarray(Xc)))
            Rs.append(R); ts.append(t); uvs.append(uv)
        prob = build_problem(rng, X, np.stack(Rs), np.stack(ts), np.stack(uvs),
                             K_cap=4, P_cap=256, E_cap=1024,
                             perturb_scale=0.02, pt_noise=0.05)
        prob = prob._replace(cam_params=jnp.asarray(KB8))
        res = ba_pcg.bundle_adjust_pcg(prob, n_iters=12, n_cg=30, cam_model="kb8")
        assert float(res.cost) < 1e-1, float(res.cost)
        for k in range(2, 4):
            np.testing.assert_allclose(np.asarray(res.R)[k], Rs[k], atol=5e-3)
            np.testing.assert_allclose(np.asarray(res.t)[k], ts[k], atol=2e-2)
