"""RGB-D-inertial pipeline e2e — the reference's 6th sensor mode
(src/ros_rgbd_inertial.cc:1-195): instant metric init from depth, IMU
init with fixed scale, VI keyframe BA, virtual-right stereo residuals."""

import numpy as np
import pytest

from orb_slam3_ros_tpu.models.stereo_system import RgbdInertialSlam
from orb_slam3_ros_tpu.models.system import OK
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse
from vi_sim import make_calib


@pytest.fixture(scope="module")
def rgbd_vi_run():
    seq, imu = synth.make_vi_sequence(
        n_frames=40, height=240, width=376, frame_dt=0.1, imu_per_frame=10,
        seed=0, bg=np.array([0.01, -0.015, 0.02]),
        noise_g=1e-4, noise_a=1e-3, with_depth=True,
    )
    slam = RgbdInertialSlam(
        height=240, width=376, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=32, max_points=4096, kf_every=3,
        calib=make_calib(freq=100.0), init_after_kf=6,
    )
    for i in range(len(seq.images)):
        slam.process_frame(
            seq.images[i], seq.depths[i], float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
    return slam, seq


class TestRgbdInertial:
    def test_tracks_and_initializes(self, rgbd_vi_run):
        slam, seq = rgbd_vi_run
        assert slam.state == OK
        assert slam.imu_initialized
        assert slam.imu_fix_scale  # depth observes metric scale
        assert slam.n_kf >= 8

    def test_metric_ate(self, rgbd_vi_run):
        """Depth gives metric scale from frame 1: ATE without scale
        alignment must be small and the free scale ~1."""
        slam, seq = rgbd_vi_run
        traj = slam.get_trajectory()
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, n, s = ate_rmse(
            ts, est, seq.timestamps.astype(np.float64), seq.t_wc,
            with_scale=True,
        )
        assert n >= 30
        assert rmse < 0.1, f"ATE {rmse:.3f}"
        assert abs(s - 1.0) < 0.08, f"scale {s:.3f}"

    def test_bias_estimated(self, rgbd_vi_run):
        slam, _ = rgbd_vi_run
        bg = np.asarray(slam.bg_cur)
        assert np.linalg.norm(bg - np.array([0.01, -0.015, 0.02])) < 0.01
