"""Tests for Sim3 solving and essential-graph (pose-graph) optimization."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import lie, pgo, sim3solver

CAM = np.asarray([400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0, 0], np.float32)


class TestUmeyama:
    def test_exact_recovery(self, rng):
        X = rng.normal(size=(50, 3)).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
        s, t = 1.7, np.array([0.4, -1.0, 2.0], np.float32)
        Y = s * X @ R.T + t
        s_e, R_e, t_e = sim3solver.umeyama(
            jnp.asarray(X), jnp.asarray(Y), jnp.ones(50)
        )
        np.testing.assert_allclose(float(s_e), s, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-3)

    def test_fix_scale(self, rng):
        X = rng.normal(size=(30, 3)).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1])))
        Y = X @ R.T + 0.5
        s_e, R_e, t_e = sim3solver.umeyama(
            jnp.asarray(X), jnp.asarray(Y), jnp.ones(30), fix_scale=True
        )
        assert float(s_e) == 1.0
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)


class TestSim3Solver:
    def test_recovers_with_outliers(self, rng):
        n = 120
        X1 = rng.uniform([-2, -2, 2], [2, 2, 8], size=(n, 3)).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.3, 0.1])))
        s, t = 1.4, np.array([0.5, -0.2, 0.3], np.float32)
        X2 = s * X1 @ R.T + t
        out = rng.choice(n, 30, replace=False)
        X2[out] += rng.normal(size=(30, 3)).astype(np.float32) * 2.0
        res = sim3solver.solve_sim3(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones(n, bool),
            jnp.asarray(CAM), jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        np.testing.assert_allclose(float(res.s), s, rtol=0.02)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=5e-3)
        inl = np.asarray(res.inlier)
        assert inl[out].mean() < 0.15
        assert inl[np.setdiff1d(np.arange(n), out)].mean() > 0.9

    def test_fix_scale_stereo_mode(self, rng):
        n = 80
        X1 = rng.uniform([-2, -2, 2], [2, 2, 8], size=(n, 3)).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.2, -0.1])))
        X2 = X1 @ R.T + np.array([0.3, 0.1, -0.2], np.float32)
        res = sim3solver.solve_sim3(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones(n, bool),
            jnp.asarray(CAM), jax.random.PRNGKey(1), fix_scale=True,
        )
        assert bool(res.ok) and float(res.s) == 1.0


def make_loop_problem(rng, K=12, drift_rot=0.01, drift_trans=0.05, drift_scale=1.02,
                      yaw_only=False):
    """Circular trajectory with accumulated odometry drift + 1 loop edge."""
    # GT: KFs on a circle, S_iw = (R_i, t_i, 1)
    R_gt, t_gt = [], []
    for k in range(K):
        th = 2 * np.pi * k / K
        Rwk = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, th], jnp.float32)))
        pw = np.array([2 * np.cos(th), 2 * np.sin(th), 0], np.float32)
        R_gt.append(Rwk.T)
        t_gt.append(-Rwk.T @ pw)
    R_gt, t_gt = np.stack(R_gt), np.stack(t_gt)
    s_gt = np.ones(K, np.float32)

    # odometry measurements S_{k+1, k} from GT
    def sim3_rel(Ri, ti, si, Rj, tj, sj):
        # S_ji = S_jw * S_iw^-1
        Rinv, tinv, sinv = (
            np.asarray(x)
            for x in lie.sim3_inv(jnp.asarray(Ri), jnp.asarray(ti), jnp.asarray(si))
        )
        return (
            np.asarray(x)
            for x in lie.sim3_mul(
                jnp.asarray(Rj), jnp.asarray(tj), jnp.asarray(sj),
                jnp.asarray(Rinv), jnp.asarray(tinv), jnp.asarray(sinv),
            )
        )

    # drifted estimates: integrate noisy odometry
    R_est = [R_gt[0]]; t_est = [t_gt[0]]; s_est = [1.0]
    e_i, e_j, e_R, e_t, e_s = [], [], [], [], []
    for k in range(K - 1):
        Rm, tm, sm = sim3_rel(R_gt[k], t_gt[k], 1.0, R_gt[k + 1], t_gt[k + 1], 1.0)
        e_i.append(k); e_j.append(k + 1)
        e_R.append(Rm); e_t.append(tm); e_s.append(sm)
        # corrupt odometry for the estimate integration
        noise = rng.normal(size=3).astype(np.float32) * drift_rot
        if yaw_only:
            noise[:2] = 0.0  # rotation drift only about world z
        dR = np.asarray(lie.so3_exp(jnp.asarray(noise)))
        Rm_n = dR @ Rm
        tm_n = tm + rng.normal(size=3).astype(np.float32) * drift_trans
        sm_n = sm * drift_scale
        Rk, tk, sk = (
            np.asarray(x)
            for x in lie.sim3_mul(
                jnp.asarray(Rm_n), jnp.asarray(tm_n), jnp.asarray(np.float32(sm_n)),
                jnp.asarray(R_est[k]), jnp.asarray(t_est[k]), jnp.asarray(np.float32(s_est[k])),
            )
        )
        R_est.append(Rk); t_est.append(tk); s_est.append(float(sk))
    # loop edge: accurate relative Sim3 between last and first
    Rm, tm, sm = sim3_rel(R_gt[K - 1], t_gt[K - 1], 1.0, R_gt[0], t_gt[0], 1.0)
    e_i.append(K - 1); e_j.append(0)
    e_R.append(Rm); e_t.append(tm); e_s.append(sm)

    E = len(e_i)
    prob = pgo.PGOProblem(
        R=jnp.asarray(np.stack(R_est)),
        t=jnp.asarray(np.stack(t_est)),
        s=jnp.asarray(np.asarray(s_est, np.float32)),
        kf_fixed=jnp.asarray(np.arange(K) == 0),
        kf_valid=jnp.ones(K, bool),
        e_i=jnp.asarray(np.asarray(e_i, np.int32)),
        e_j=jnp.asarray(np.asarray(e_j, np.int32)),
        e_R=jnp.asarray(np.stack(e_R).astype(np.float32)),
        e_t=jnp.asarray(np.stack(e_t).astype(np.float32)),
        e_s=jnp.asarray(np.asarray(e_s, np.float32)),
        e_valid=jnp.ones(E, bool),
        e_weight=jnp.ones(E, jnp.float32),
    )
    return prob, R_gt, t_gt, s_gt


class TestPoseGraph:
    @pytest.mark.slow
    def test_loop_closure_removes_drift(self, rng):
        prob, R_gt, t_gt, s_gt = make_loop_problem(rng)
        drift_before = np.linalg.norm(np.asarray(prob.t) - t_gt, axis=-1).max()
        res = pgo.optimize_pose_graph(prob, n_iters=25)
        drift_after = np.linalg.norm(np.asarray(res.t) - t_gt, axis=-1).max()
        assert drift_before > 0.2, drift_before  # setup sanity
        assert drift_after < 0.12, (drift_before, drift_after)
        np.testing.assert_allclose(np.asarray(res.s), 1.0, atol=0.05)
        assert float(res.cost) < 1e-2 * prob.e_i.shape[0]

    @pytest.mark.slow
    def test_fixed_vertex_unchanged(self, rng):
        prob, *_ = make_loop_problem(rng)
        res = pgo.optimize_pose_graph(prob, n_iters=10)
        np.testing.assert_array_equal(np.asarray(res.R)[0], np.asarray(prob.R)[0])
        np.testing.assert_array_equal(np.asarray(res.t)[0], np.asarray(prob.t)[0])

    def test_4dof_removes_drift(self, rng):
        # Inertial-style problem: metric scale (no scale drift), rotation
        # drift about the gravity axis only -- exactly the regime the
        # reference's OptimizeEssentialGraph4DoF covers.
        prob, R_gt, t_gt, s_gt = make_loop_problem(
            rng, drift_rot=0.03, drift_scale=1.0, yaw_only=True
        )
        drift_before = np.linalg.norm(np.asarray(prob.t) - t_gt, axis=-1).max()
        res = pgo.optimize_pose_graph_4dof(prob, n_iters=25)
        drift_after = np.linalg.norm(np.asarray(res.t) - t_gt, axis=-1).max()
        assert drift_before > 0.2, drift_before
        assert drift_after < 0.12, (drift_before, drift_after)
        np.testing.assert_array_equal(np.asarray(res.s), 1.0)

    def test_4dof_preserves_roll_pitch(self, rng):
        prob, *_ = make_loop_problem(
            rng, drift_rot=0.03, drift_scale=1.0, yaw_only=True
        )
        res = pgo.optimize_pose_graph_4dof(prob, n_iters=25)
        # Each update must be a pure world-yaw: R_wi_new R_wi_old^T is a
        # rotation about world z.
        D = np.einsum("kji,kjl->kil", np.asarray(res.R), np.asarray(prob.R))
        ax = np.asarray(jax.vmap(lie.so3_log)(jnp.asarray(D)))
        np.testing.assert_allclose(ax[:, :2], 0.0, atol=1e-4)

    def test_4dof_fixed_vertex_unchanged(self, rng):
        prob, *_ = make_loop_problem(rng, drift_scale=1.0, yaw_only=True)
        res = pgo.optimize_pose_graph_4dof(prob, n_iters=10)
        np.testing.assert_array_equal(np.asarray(res.R)[0], np.asarray(prob.R)[0])
        np.testing.assert_array_equal(np.asarray(res.t)[0], np.asarray(prob.t)[0])

    def test_correct_points_follow_kfs(self, rng):
        prob, R_gt, t_gt, s_gt = make_loop_problem(rng)
        res = pgo.optimize_pose_graph(prob, n_iters=25)
        K = 12
        # points rigidly attached 1m in front of each GT camera
        pt_ref = np.arange(K, dtype=np.int32)
        # world point under the DRIFTED estimate: X = S_est^-1 [0,0,1]
        Xc = np.tile(np.array([0, 0, 1.0], np.float32), (K, 1))
        Ri = np.swapaxes(np.asarray(prob.R), 1, 2)
        X_est = np.einsum("kij,kj->ki", Ri, Xc - np.asarray(prob.t)) / np.asarray(prob.s)[:, None]
        X_new = pgo.correct_points(
            jnp.asarray(X_est), jnp.asarray(pt_ref),
            prob.R, prob.t, prob.s, res.R, res.t, res.s,
        )
        # after correction, each point should sit 1m in front of GT cam
        X_gt = np.einsum("kji,kj->ki", R_gt, Xc - t_gt)
        np.testing.assert_allclose(np.asarray(X_new), X_gt, atol=0.15)


class TestLoopEdgeStore:
    def test_loop_edges_never_evicted(self):
        """Accumulating many closures must keep EVERY constraint (the
        reference keeps all loop/merge edges forever, KeyFrame.h:466-482;
        round-2's fixed ring silently evicted the oldest past 16)."""
        from orb_slam3_ros_tpu.models.loop_closing import LoopCloser

        lc = LoopCloser()
        for i in range(40):
            lc._record_loop_edge(i, i + 100, np.eye(3), np.zeros(3), 1.0)
        assert int((lc._edge_i >= 0).sum()) == 40
        assert lc.max_loop_edges >= 40
        # Slots freed by compaction are reused before growing again.
        lc._edge_i[5] = -1
        cap = lc.max_loop_edges
        lc._record_loop_edge(999, 1000, np.eye(3), np.zeros(3), 1.0)
        assert lc.max_loop_edges == cap
        assert 999 in lc._edge_i
