"""Tests for the loop-closure optimization-data dump/replay workflow
(the fork's SaveOptimizationData + 3DCERES offline re-solve pattern)."""

import os

import numpy as np
import jax.numpy as jnp

from orb_slam3_ros_tpu.models import map_state as ms
from orb_slam3_ros_tpu.utils import optdump, trajectory
from orb_slam3_ros_tpu.ops import lie

from test_loop_math import make_loop_problem


def problem_to_dump_args(prob, K=12):
    e_kind = np.zeros(prob.e_i.shape[0], np.int32)
    e_kind[-1] = 1  # the loop edge
    return dict(
        kf_id=np.arange(K),
        kf_ts=np.arange(K, dtype=np.float64) * 0.5,
        kf_R=np.asarray(prob.R),
        kf_t=np.asarray(prob.t),
        cov=None,
        e_i=np.asarray(prob.e_i),
        e_j=np.asarray(prob.e_j),
        e_R=np.asarray(prob.e_R),
        e_t=np.asarray(prob.e_t),
        e_s=np.asarray(prob.e_s),
        e_kind=e_kind,
    )


class TestOptDump:
    def test_roundtrip(self, rng, tmp_path):
        prob, R_gt, t_gt, _ = make_loop_problem(rng)
        args = problem_to_dump_args(prob)
        d = str(tmp_path / "dump")
        optdump.save_optimization_data(d, **args)
        dump = optdump.load_optimization_data(d)
        np.testing.assert_allclose(dump.kf_R, np.asarray(prob.R), atol=1e-5)
        np.testing.assert_allclose(dump.kf_t, np.asarray(prob.t), atol=1e-6)
        np.testing.assert_array_equal(dump.e_i, np.asarray(prob.e_i))
        np.testing.assert_allclose(dump.e_s, np.asarray(prob.e_s), atol=1e-6)
        np.testing.assert_array_equal(dump.e_kind[-1], 1)

    def test_reoptimize_removes_drift(self, rng, tmp_path):
        prob, R_gt, t_gt, _ = make_loop_problem(rng)
        d = str(tmp_path / "dump")
        optdump.save_optimization_data(d, **problem_to_dump_args(prob))
        dump = optdump.load_optimization_data(d)
        drift_before = np.linalg.norm(dump.kf_t - t_gt, axis=-1).max()
        R_new, t_new, s_new, cost = optdump.reoptimize(dump, n_iters=25)
        drift_after = np.linalg.norm(t_new * s_new[:, None] - t_gt, axis=-1).max()
        assert drift_before > 0.2
        assert drift_after < 0.15, (drift_before, drift_after)

    def test_cli_writes_before_after(self, rng, tmp_path):
        from orb_slam3_ros_tpu import reoptimize as cli

        prob, *_ = make_loop_problem(rng)
        d = str(tmp_path / "dump")
        optdump.save_optimization_data(d, **problem_to_dump_args(prob))
        rc = cli.main([d, "--iters", "15"])
        assert rc == 0
        ts_b, p_b, _ = trajectory.load_tum(os.path.join(d, "trajectory_before.txt"))
        ts_a, p_a, _ = trajectory.load_tum(os.path.join(d, "trajectory_after.txt"))
        assert len(ts_b) == len(ts_a) == 12
        assert not np.allclose(p_b, p_a)  # optimization moved the poses

    def test_loop_closer_dump_hook(self, rng, tmp_path):
        """LoopCloser._dump_problem writes a loadable problem dir."""
        from types import SimpleNamespace

        from orb_slam3_ros_tpu.models.loop_closing import LoopCloser

        m = ms.empty_map(K=8, N=16, P=32)
        n_kf = 5
        m = m._replace(
            kf_valid=m.kf_valid.at[:n_kf].set(True),
            kf_t=m.kf_t.at[:n_kf].set(
                jnp.asarray(rng.normal(size=(n_kf, 3)).astype(np.float32))
            ),
        )
        lc = LoopCloser(dump_dir=str(tmp_path))
        slam = SimpleNamespace(n_kf=n_kf)
        res = SimpleNamespace(
            R=jnp.eye(3), t=jnp.zeros(3), s=jnp.asarray(1.1)
        )
        lc._dump_problem(slam, m, 4, 0, res, "pre")
        dump = optdump.load_optimization_data(str(tmp_path / "closure_4_pre"))
        assert len(dump.kf_id) == n_kf
        assert dump.e_kind[-1] == 1 and dump.e_s[-1] == np.float32(1.1)

    def test_dump_from_map(self, rng, tmp_path):
        m = ms.empty_map(K=8, N=16, P=32)
        n_kf = 4
        R = np.stack([
            np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.1 * k]))) for k in range(n_kf)
        ]).astype(np.float32)
        t = rng.normal(size=(n_kf, 3)).astype(np.float32)
        m = m._replace(
            kf_valid=m.kf_valid.at[:n_kf].set(True),
            kf_R=m.kf_R.at[:n_kf].set(jnp.asarray(R)),
            kf_t=m.kf_t.at[:n_kf].set(jnp.asarray(t)),
            pt_valid=m.pt_valid.at[:5].set(True),
            pt_X=m.pt_X.at[:5].set(jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))),
        )
        args = optdump.dump_from_map(m, n_kf, loop_edges=[
            (3, 0, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1.0)
        ])
        d = str(tmp_path / "dump")
        optdump.save_optimization_data(d, **args)
        dump = optdump.load_optimization_data(d)
        assert len(dump.kf_id) == n_kf
        assert len(dump.e_i) == n_kf - 1 + 1
        assert dump.pt_X.shape == (5, 3)
        # sequential measurement consistency: S_ji composed with state i
        # must reproduce state j
        for n in range(n_kf - 1):
            Rj = dump.e_R[n] @ dump.kf_R[n]
            np.testing.assert_allclose(Rj, dump.kf_R[n + 1], atol=1e-5)
