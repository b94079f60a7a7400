"""End-to-end monocular SLAM on the synthetic sequence, scored by ATE —
the round-1 acceptance test (SURVEY §7 phase 6)."""

import numpy as np
import jax
import pytest

from orb_slam3_ros_tpu.models.system import MonoSlam, OK
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse


@pytest.fixture(scope="module")
def seq():
    return synth.make_sequence(n_frames=40, height=240, width=376, dt=0.1, seed=3)


@pytest.fixture(scope="module")
def slam_run(seq):
    slam = MonoSlam(
        height=240, width=376, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=32, max_points=4096,
    )
    poses = []
    for i in range(len(seq.images)):
        T = slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        poses.append(T)
    return slam, poses


class TestEndToEndMono:
    def test_initializes(self, slam_run):
        slam, poses = slam_run
        assert slam.state == OK
        assert slam.n_kf >= 4
        assert slam.n_pts > 100

    def test_tracks_most_frames(self, slam_run):
        slam, poses = slam_run
        tracked = sum(p is not None for p in poses)
        assert tracked >= 30, f"tracked {tracked}/40"

    def test_ate_within_bound(self, slam_run, seq):
        slam, poses = slam_run
        ts = np.asarray([t for t, _ in slam.trajectory])
        est = np.stack([T[:3, 3] for _, T in slam.trajectory])
        rmse, n, s = ate_rmse(ts, est, seq.timestamps.astype(np.float64),
                              seq.t_wc, with_scale=True)
        # Room is ~8x6x5 m, trajectory spans ~3 m; a few cm ATE is the
        # target regime (reference gets cm-level on EuRoC).
        assert n >= 30
        assert rmse < 0.10, f"ATE RMSE {rmse:.3f} m (scale {s:.3f})"

    def test_map_consistency(self, slam_run):
        slam, _ = slam_run
        m = slam.map
        obs = np.asarray(jax.device_get(m.kf_obs))
        ptv = np.asarray(jax.device_get(m.pt_valid))
        kfv = np.asarray(jax.device_get(m.kf_valid))
        # every bound observation points to a live point slot id < n_pts
        bound = obs[kfv][obs[kfv] >= 0]
        assert (bound < slam.n_pts).all()
