"""Tests for visual-inertial BA and IMU initialization solvers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import cameras, imu, lie, viba
from vi_sim import make_calib, preintegrate_windows, simulate_vi

CAM = np.asarray([400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0, 0], np.float32)


def build_vi_problem(rng, sim, n_pts=150, perturb=0.0, vel_perturb=0.0,
                     bias_perturb=0.0, pt_noise=0.0, px_noise=0.3, n_fixed=1):
    n_kf = len(sim["R_wb"])
    pre = preintegrate_windows(sim)
    # world points in front of the trajectory (z up to 8m around origin)
    X = rng.uniform([-4, -4, 1.5], [4, 4, 6], size=(n_pts, 3)).astype(np.float32)
    # visual observations: camera = body (R_bc = I)
    cam_idx = np.repeat(np.arange(n_kf), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_kf).astype(np.int32)
    Xb = np.einsum(
        "eji,ej->ei",
        sim["R_wb"][cam_idx],
        X[pt_idx] - sim["p_wb"][cam_idx],
        # X_b = R_wb^T (X_w - p_wb)
    )
    uv = np.array(cameras.pinhole_project_nodist(jnp.asarray(CAM), jnp.asarray(Xb)))
    uv += rng.normal(size=uv.shape).astype(np.float32) * px_noise
    edge_valid = Xb[:, 2] > 0.3

    R0 = sim["R_wb"].copy()
    p0 = sim["p_wb"].copy()
    v0 = sim["v_w"].copy() + rng.normal(size=(n_kf, 3)).astype(np.float32) * vel_perturb
    for k in range(n_fixed, n_kf):
        dxi = rng.normal(size=3).astype(np.float32) * perturb
        R0[k] = R0[k] @ np.asarray(lie.so3_exp(jnp.asarray(dxi)))
        p0[k] = p0[k] + rng.normal(size=3).astype(np.float32) * perturb
    bg0 = np.tile(sim["bg"], (n_kf, 1)) + rng.normal(size=(n_kf, 3)).astype(np.float32) * bias_perturb
    ba0 = np.tile(sim["ba"], (n_kf, 1)) + rng.normal(size=(n_kf, 3)).astype(np.float32) * bias_perturb

    states = viba.VIStates(
        R_wb=jnp.asarray(R0), p_wb=jnp.asarray(p0), v_w=jnp.asarray(v0),
        bg=jnp.asarray(bg0.astype(np.float32)), ba=jnp.asarray(ba0.astype(np.float32)),
    )
    # simulate_vi returns n_kf+1 keyframe states and exactly n_kf
    # windows; window q integrates KF q -> KF q+1.
    ie_i = jnp.arange(n_kf - 1, dtype=jnp.int32)
    ie_j = ie_i + 1
    pre_edges = pre
    return viba.VIBAProblem(
        states=states,
        kf_fixed=jnp.asarray(np.arange(n_kf) < n_fixed),
        kf_valid=jnp.ones(n_kf, bool),
        X=jnp.asarray(X + rng.normal(size=X.shape).astype(np.float32) * pt_noise),
        pt_valid=jnp.ones(n_pts, bool),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones(len(cam_idx), jnp.float32),
        edge_valid=jnp.asarray(edge_valid),
        ie_i=ie_i,
        ie_j=ie_j,
        ie_preint=pre_edges,
        ie_valid=jnp.ones(n_kf - 1, bool),
        cam_params=jnp.asarray(CAM),
        R_bc=jnp.eye(3),
        t_bc=jnp.zeros(3),
    ), X


class TestVIBA:
    def test_perfect_data_zero_residual(self, rng):
        sim = simulate_vi(rng, n_kf=6)
        prob, X_gt = build_vi_problem(rng, sim, px_noise=0.0)
        res = viba.vi_bundle_adjust(prob, n_iters=3)
        assert float(res.cost) < 50.0, float(res.cost)

    def test_converges_from_perturbation(self, rng):
        sim = simulate_vi(rng, n_kf=6)
        prob, X_gt = build_vi_problem(
            rng, sim, perturb=0.03, vel_perturb=0.1, pt_noise=0.03, px_noise=0.2,
        )
        res = viba.vi_bundle_adjust(prob, n_iters=10)
        st = res.states
        for k in range(1, 6):
            np.testing.assert_allclose(np.asarray(st.R_wb)[k], sim["R_wb"][k], atol=8e-3)
            np.testing.assert_allclose(np.asarray(st.p_wb)[k], sim["p_wb"][k], atol=3e-2)
            np.testing.assert_allclose(np.asarray(st.v_w)[k], sim["v_w"][k], atol=8e-2)

    @pytest.mark.slow
    def test_bias_recovery(self, rng):
        bg = np.array([0.01, -0.02, 0.015])
        ba = np.array([0.05, 0.08, -0.04])
        sim = simulate_vi(rng, n_kf=8, bg=bg, ba=ba)
        # preintegration at zero linearization bias; BA must estimate them
        prob, _ = build_vi_problem(rng, sim, perturb=0.01, vel_perturb=0.05,
                                   px_noise=0.2)
        # start biases at zero
        prob = prob._replace(
            states=prob.states._replace(
                bg=jnp.zeros_like(prob.states.bg), ba=jnp.zeros_like(prob.states.ba)
            )
        )
        res = viba.vi_bundle_adjust(prob, n_iters=15)
        bg_est = np.asarray(res.states.bg).mean(0)
        ba_est = np.asarray(res.states.ba).mean(0)
        np.testing.assert_allclose(bg_est, bg, atol=5e-3)
        np.testing.assert_allclose(ba_est, ba, atol=5e-2)


class TestVIBAGravityScale:
    def _to_visual(self, sim, prob, X, s_true, Rwg_true):
        """Re-express a metric gravity-aligned problem in a 'visual' world
        frame that is scaled by 1/s_true and rotated so gravity points
        along Rwg_true @ (0,0,-G) — the state a mono map is in before IMU
        init finishes."""
        Rv = np.asarray(Rwg_true, np.float32)
        st = prob.states
        return prob._replace(
            states=st._replace(
                R_wb=jnp.einsum("ij,kjl->kil", jnp.asarray(Rv), st.R_wb),
                p_wb=(st.p_wb @ jnp.asarray(Rv.T)) / s_true,
                v_w=(st.v_w @ jnp.asarray(Rv.T)) / s_true,
            ),
            X=(prob.X @ jnp.asarray(Rv.T)) / s_true,
        )

    def test_recovers_scale_and_gravity(self, rng):
        s_true = 2.4
        Rwg_true = np.asarray(lie.so3_exp(jnp.asarray([0.06, -0.09, 0.0])))
        sim = simulate_vi(rng, n_kf=8)
        prob, X = build_vi_problem(rng, sim, perturb=0.0, px_noise=0.2)
        prob = self._to_visual(sim, prob, X, s_true, Rwg_true)
        res = viba.vi_bundle_adjust_gs(
            prob, jnp.eye(3, dtype=jnp.float32), n_iters=20,
            bias_prior_g=1e2, bias_prior_a=1e6,
        )
        s_est = float(res.scale)
        assert abs(s_est - s_true) / s_true < 0.03, s_est
        g_est = np.asarray(res.Rwg) @ np.asarray([0.0, 0.0, -1.0])
        g_true = Rwg_true @ np.asarray([0.0, 0.0, -1.0])
        cosang = float(np.dot(g_est, g_true))
        assert cosang > np.cos(np.deg2rad(1.0)), cosang

    @pytest.mark.slow
    def test_fix_scale_keeps_scale_one(self, rng):
        sim = simulate_vi(rng, n_kf=6)
        prob, _ = build_vi_problem(rng, sim, px_noise=0.2)
        res = viba.vi_bundle_adjust_gs(
            prob, jnp.eye(3, dtype=jnp.float32), n_iters=6, fix_scale=True,
        )
        assert abs(float(res.scale) - 1.0) < 1e-6

    @pytest.mark.slow
    def test_metric_input_scale_near_one(self, rng):
        # Already-metric, gravity-aligned input: GS must not disturb it.
        sim = simulate_vi(rng, n_kf=8)
        prob, _ = build_vi_problem(rng, sim, perturb=0.01, vel_perturb=0.05,
                                   px_noise=0.2)
        res = viba.vi_bundle_adjust_gs(
            prob, jnp.eye(3, dtype=jnp.float32), n_iters=12,
            bias_prior_g=1e2, bias_prior_a=1e6,
        )
        assert abs(float(res.scale) - 1.0) < 0.03, float(res.scale)
        for k in range(1, 6):
            np.testing.assert_allclose(
                np.asarray(res.states.p_wb)[k], sim["p_wb"][k], atol=4e-2
            )


class TestInertialInit:
    def test_recovers_gravity_scale_bias(self, rng):
        bg = np.array([0.012, -0.018, 0.02])
        tilt = np.asarray(lie.so3_exp(jnp.asarray([0.15, -0.1, 0.0])))
        g_vis = tilt @ np.array([0.0, 0.0, -imu.GRAVITY])
        s_true = 3.7
        sim = simulate_vi(rng, n_kf=10, gravity=g_vis, bg=bg)
        pre = preintegrate_windows(sim)
        pre_edges = pre
        n_kf = len(sim["R_wb"])
        res = viba.inertial_init(
            jnp.asarray(sim["R_wb"]),
            jnp.asarray(sim["p_wb"] / s_true),  # visual positions: wrong scale
            jnp.ones(n_kf, bool),
            jnp.arange(n_kf - 1, dtype=jnp.int32),
            jnp.arange(1, n_kf, dtype=jnp.int32),
            pre_edges,
            jnp.ones(n_kf - 1, bool),
            n_iters=40,
        )
        assert abs(float(res.scale) - s_true) / s_true < 0.05, float(res.scale)
        g_est = np.asarray(res.Rwg) @ np.array([0, 0, -imu.GRAVITY])
        cos = g_est @ g_vis / (np.linalg.norm(g_est) * np.linalg.norm(g_vis))
        assert cos > 0.999, (g_est, g_vis)
        np.testing.assert_allclose(np.asarray(res.bg), bg, atol=3e-3)
        # velocities scale-consistent
        np.testing.assert_allclose(
            np.asarray(res.v_w), sim["v_w"], atol=0.15
        )

    def test_fix_scale_mode(self, rng):
        sim = simulate_vi(rng, n_kf=6)
        pre = preintegrate_windows(sim)
        pre_edges = pre
        n_kf = len(sim["R_wb"])
        res = viba.inertial_init(
            jnp.asarray(sim["R_wb"]), jnp.asarray(sim["p_wb"]),
            jnp.ones(n_kf, bool),
            jnp.arange(n_kf - 1, dtype=jnp.int32),
            jnp.arange(1, n_kf, dtype=jnp.int32),
            pre_edges, jnp.ones(n_kf - 1, bool),
            n_iters=25, fix_scale=True,
        )
        assert float(res.scale) == 1.0
        g_est = np.asarray(res.Rwg) @ np.array([0, 0, -imu.GRAVITY])
        cos = g_est @ sim["gravity"] / (np.linalg.norm(g_est) * imu.GRAVITY)
        assert cos > 0.999


class TestPoseInertialOpt:
    """VI motion-only pose optimization (PoseInertialOptimizationLast*,
    Optimizer.cc:4636/5020)."""

    def _setup(self, rng, n_pts=120, px_noise=0.2):
        sim = simulate_vi(rng, n_kf=6)
        calib = make_calib()
        k = 3  # anchor = KF3, frame = KF4, window 3 integrates 3 -> 4
        pre = imu.preintegrate(
            jnp.asarray(sim["acc"][k]), jnp.asarray(sim["gyro"][k]),
            jnp.asarray(sim["dts"][k]), jnp.zeros(6), calib,
        )
        X = rng.uniform([-4, -4, 1.5], [4, 4, 6], size=(n_pts, 3)).astype(np.float32)
        R_f, p_f = sim["R_wb"][k + 1], sim["p_wb"][k + 1]
        Xb = np.einsum("ji,nj->ni", R_f, X - p_f)
        uv = np.asarray(
            cameras.pinhole_project_nodist(jnp.asarray(CAM), jnp.asarray(Xb))
        ) + rng.normal(size=(n_pts, 2)).astype(np.float32) * px_noise
        valid = Xb[:, 2] > 0.3
        anchor = dict(
            R=jnp.asarray(sim["R_wb"][k]), p=jnp.asarray(sim["p_wb"][k]),
            v=jnp.asarray(sim["v_w"][k]), bg=jnp.zeros(3), ba=jnp.zeros(3),
        )
        return sim, k, pre, X, uv, valid, anchor

    def _no_prior(self):
        # Exact anchor (zero posterior covariance).
        return dict(anc_Sigma=jnp.zeros((15, 15)))

    def test_converges_to_gt_from_imu_seed(self, rng):
        sim, k, pre, X, uv, valid, anc = self._setup(rng)
        # init = IMU prediction from the anchor (the tracking seed)
        R0, p0, v0 = imu.predict_state(
            anc["R"], anc["p"], anc["v"], jnp.zeros(6), pre
        )
        res = viba.pose_inertial_optimization(
            R0, p0, v0, jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X)),
            jnp.asarray(valid),
            anc["R"], anc["p"], anc["v"], anc["bg"], anc["ba"], pre,
            **self._no_prior(),
            cam_params=jnp.asarray(CAM), R_bc=jnp.eye(3), t_bc=jnp.zeros(3),
        )
        np.testing.assert_allclose(
            np.asarray(res.R_wb), sim["R_wb"][k + 1], atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(res.p_wb), sim["p_wb"][k + 1], atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(res.v_w), sim["v_w"][k + 1], atol=0.1
        )
        assert int(res.n_inliers) > 0.8 * valid.sum()
        H = np.asarray(res.H)
        np.testing.assert_allclose(H, H.T, rtol=1e-4, atol=2.0)
        assert np.all(np.linalg.eigvalsh(H) > -1e-3)

    def test_feature_starved_follows_imu(self, rng):
        """With zero visual edges the optimum is the IMU dead-reckoned
        state — the behavior that carries RECENTLY_LOST frames."""
        sim, k, pre, X, uv, valid, anc = self._setup(rng)
        R0, p0, v0 = imu.predict_state(
            anc["R"], anc["p"], anc["v"], jnp.zeros(6), pre
        )
        # start AWAY from the prediction; no visual support at all
        R_bad = jnp.asarray(sim["R_wb"][k])
        res = viba.pose_inertial_optimization(
            R_bad, anc["p"], anc["v"], jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X)),
            jnp.zeros(len(X), bool),
            anc["R"], anc["p"], anc["v"], anc["bg"], anc["ba"], pre,
            **self._no_prior(),
            cam_params=jnp.asarray(CAM), R_bc=jnp.eye(3), t_bc=jnp.zeros(3),
        )
        np.testing.assert_allclose(np.asarray(res.R_wb), np.asarray(R0), atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.p_wb), np.asarray(p0), atol=2e-2)

    def test_anchor_uncertainty_downweights_imu(self, rng):
        """When the anchor state is WRONG but declared uncertain (large
        anc_Sigma), the visual edges must win; with an exact anchor
        (Sigma=0) the corrupted inertial edge drags the pose away from
        the visual optimum. This balance is what the round-3 carried
        prior got backwards (information compounded, visual support
        decayed ~220 -> ~40 between keyframes)."""
        sim, k, pre, X, uv, valid, anc = self._setup(rng)
        R_gt = sim["R_wb"][k + 1]
        p_gt = sim["p_wb"][k + 1]
        # Corrupt the anchor by 0.3 m — the inertial edge now pulls the
        # frame toward a wrong prediction.
        p_anc_bad = anc["p"] + jnp.asarray([0.3, 0.0, 0.0])

        def solve(Sigma):
            return viba.pose_inertial_optimization(
                jnp.asarray(R_gt), jnp.asarray(p_gt),
                jnp.asarray(sim["v_w"][k + 1]), jnp.zeros(3), jnp.zeros(3),
                jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X)),
                jnp.asarray(valid),
                anc["R"], p_anc_bad, anc["v"], anc["bg"], anc["ba"], pre,
                anc_Sigma=Sigma,
                cam_params=jnp.asarray(CAM), R_bc=jnp.eye(3),
                t_bc=jnp.zeros(3),
            )

        res_exact = solve(jnp.zeros((15, 15)))
        res_unc = solve(jnp.eye(15) * 1.0)
        err_exact = float(jnp.linalg.norm(res_exact.p_wb - jnp.asarray(p_gt)))
        err_unc = float(jnp.linalg.norm(res_unc.p_wb - jnp.asarray(p_gt)))
        # Uncertain anchor -> visual evidence dominates -> stays at GT.
        assert err_unc < 0.02, err_unc
        # Exact (but wrong) anchor -> inertial edge pulls the pose off.
        assert err_exact > 2.0 * max(err_unc, 5e-3), (err_exact, err_unc)
        # Posterior covariance reported and PSD.
        S = np.asarray(res_unc.Sigma)
        np.testing.assert_allclose(S, S.T, rtol=1e-3, atol=1e-4)
        assert np.all(np.linalg.eigvalsh(S) > -1e-4)
