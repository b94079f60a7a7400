"""End-to-end monocular-inertial SLAM: IMU init recovers metric scale and
gravity; tracking uses IMU prediction (SURVEY §7 phase 7 acceptance)."""

import numpy as np
import jax
import pytest

from orb_slam3_ros_tpu.models.inertial_system import InertialSlam
from orb_slam3_ros_tpu.models.system import OK
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse
from vi_sim import make_calib


@pytest.fixture(scope="module")
def vi_seq():
    return synth.make_vi_sequence(
        n_frames=45, height=240, width=376, frame_dt=0.1, imu_per_frame=10,
        seed=0, bg=np.array([0.01, -0.015, 0.02]),
        noise_g=1e-4, noise_a=1e-3,
    )


@pytest.fixture(scope="module")
def slam_run(vi_seq):
    seq, imu = vi_seq
    slam = InertialSlam(
        height=240, width=376, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=32, max_points=4096, kf_every=3,
        calib=make_calib(freq=100.0), init_after_kf=6,
    )
    for i in range(len(seq.images)):
        slam.process_frame(
            seq.images[i], float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
    return slam, seq, imu


class TestInertialE2E:
    def test_tracks_and_initializes_imu(self, slam_run):
        slam, seq, imu = slam_run
        assert slam.state == OK
        assert slam.imu_initialized, "IMU never initialized"
        assert slam.n_kf >= 8

    def test_metric_scale_recovered(self, slam_run):
        """After IMU init the map is metric: ATE *without* scale
        alignment must be small, and the free-scale alignment factor ~1
        (the reference's mono-inertial headline property)."""
        slam, seq, imu = slam_run
        traj = slam.get_trajectory()
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        # only evaluate frames after IMU init (first KFs are pre-metric)
        n_skip = 12
        rmse, n, s = ate_rmse(
            ts[n_skip:], est[n_skip:], seq.timestamps.astype(np.float64),
            seq.t_wc, with_scale=True,
        )
        assert n >= 20
        # Round-4 bound: with the anchor-uncertainty-propagated per-frame
        # VI solve (viba.pose_inertial_optimization — the round-3 carried
        # prior compounded information and biased the whole chain, scale
        # error 5-6%) the three-stage VIBA ladder (priors 1e2 -> 1 ->
        # free, LocalMapping.cc:184-227) reaches ~4% on this very short
        # (4.5 s) weakly-excited sequence and sub-percent with a few
        # more seconds of motion (70-frame probe: 0.05%), matching the
        # reference's few-percent VIBA2 convergence.
        assert abs(s - 1.0) < 0.05, f"scale after IMU init: {s}"
        rmse_m, _, _ = ate_rmse(
            ts[n_skip:], est[n_skip:], seq.timestamps.astype(np.float64),
            seq.t_wc, with_scale=False,
        )
        assert rmse_m < 0.1, f"metric ATE {rmse_m:.3f}"

    def test_gravity_aligned(self, slam_run):
        """After alignment, the world z-axis is gravity: GT and estimated
        trajectories agree without any rotation fix beyond yaw+translation
        (checked via the full Umeyama rotation being near z-rotation)."""
        slam, seq, imu = slam_run
        from orb_slam3_ros_tpu.utils.evaluate_ate import align_umeyama

        traj = slam.get_trajectory()
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])[12:]
        j = np.searchsorted(seq.timestamps, ts[12:])
        j = np.clip(j, 0, len(seq.timestamps) - 1)
        gt = seq.t_wc[j]
        s, R, t = align_umeyama(est, gt, with_scale=True)
        # alignment rotation should keep z-axis ~fixed (pure yaw)
        assert abs(R[2, 2]) > 0.98, f"gravity misaligned: R=\n{R}"

    def test_bias_estimated(self, slam_run):
        slam, seq, imu = slam_run
        np.testing.assert_allclose(slam.bg_cur, imu["bg"], atol=1.5e-2)
