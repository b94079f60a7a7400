"""End-to-end stereo-inertial pipeline (the reference's IMU_STEREO mode)."""

import numpy as np
import jax
import pytest

from orb_slam3_ros_tpu.models.stereo_system import StereoInertialSlam
from orb_slam3_ros_tpu.models.system import OK
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse
from vi_sim import make_calib

BASELINE = 0.12


@pytest.fixture(scope="module")
def run():
    seq, imu = synth.make_vi_sequence(
        n_frames=35, height=240, width=376, frame_dt=0.1, imu_per_frame=10,
        seed=0, bg=np.array([0.01, -0.015, 0.02]),
        noise_g=1e-4, noise_a=1e-3, stereo_baseline=BASELINE,
    )
    slam = StereoInertialSlam(
        height=240, width=376, cam_params=seq.cam_params, n_features=800,
        max_keyframes=32, max_points=4096, kf_every=3,
        baseline=BASELINE, calib=make_calib(freq=100.0), init_after_kf=6,
    )
    for i in range(len(seq.images)):
        slam.process_frame(
            seq.images[i], seq.images_right[i], float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
    return slam, seq, imu


class TestStereoInertial:
    def test_tracks_and_initializes(self, run):
        slam, seq, imu = run
        assert slam.state == OK
        assert slam.imu_initialized
        assert slam.imu_fix_scale  # stereo: scale was held fixed

    def test_metric_from_first_frame(self, run):
        """Stereo gives metric scale instantly; IMU init must NOT rescale
        (fix_scale) and the whole trajectory stays metric."""
        slam, seq, imu = run
        traj = slam.get_trajectory()
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, n, s = ate_rmse(ts, est, seq.timestamps.astype(np.float64),
                              seq.t_wc, with_scale=True)
        assert n >= 25
        assert abs(s - 1.0) < 0.05, f"stereo-inertial scale {s}"
        rmse_m, _, _ = ate_rmse(ts, est, seq.timestamps.astype(np.float64),
                                seq.t_wc, with_scale=False)
        assert rmse_m < 0.12, f"metric ATE {rmse_m:.3f}"

    def test_bias_estimated(self, run):
        slam, seq, imu = run
        np.testing.assert_allclose(slam.bg_cur, imu["bg"], atol=1.5e-2)


@pytest.mark.slow
class TestStereoInertialChunk:
    def test_chunked_stereo_inertial(self):
        """The VI chunk loop with stereo pairs: (u,v,u_r) VI-BA rows,
        depth-point creation in the in-chunk keyframe body, metric
        trajectory preserved."""
        import jax.numpy as jnp

        n = 80
        seq, imu = synth.make_vi_sequence(
            n_frames=n, height=240, width=376, frame_dt=0.1,
            imu_per_frame=10, seed=0, bg=np.array([0.01, -0.015, 0.02]),
            noise_g=1e-4, noise_a=1e-3, stereo_baseline=BASELINE,
        )
        slam = StereoInertialSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=800, max_keyframes=32, max_points=4096,
            kf_every=3, ba_window=4, ba_fixed=2,
            baseline=BASELINE, calib=make_calib(freq=100.0),
            init_after_kf=6,
        )
        pairs = jnp.asarray(np.stack(
            [np.stack([l, r]) for l, r in
             zip(seq.images, seq.images_right)]
        ).astype(np.float32))
        chunk = 8
        i = 0
        while i < n and not slam._vi_chunkable():
            slam.process_frame(
                seq.images[i], seq.images_right[i], float(seq.timestamps[i]),
                acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
            )
            i += 1
        i_steady = i
        while i + chunk <= n:
            slam.process_frames(
                (pairs, i), seq.timestamps[i : i + chunk],
                acc=imu["acc"][i : i + chunk],
                gyro=imu["gyro"][i : i + chunk],
                dts=imu["dts"][i : i + chunk],
            )
            i += chunk
        while i < n:
            slam.process_frame(
                seq.images[i], seq.images_right[i], float(seq.timestamps[i]),
                acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
            )
            i += 1
        slam.flush()
        assert slam.state == OK
        assert i_steady < n - 2 * chunk, "stereo VI chunk never engaged"
        traj = slam.get_trajectory()
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, nm, s = ate_rmse(
            ts, est, seq.timestamps.astype(np.float64), seq.t_wc,
            with_scale=True,
        )
        assert nm >= n - 10
        assert abs(s - 1.0) < 0.05, f"chunked stereo-inertial scale {s}"
        rmse_m, _, _ = ate_rmse(
            ts, est, seq.timestamps.astype(np.float64), seq.t_wc,
            with_scale=False,
        )
        assert rmse_m < 0.12, f"chunked metric ATE {rmse_m:.3f}"
