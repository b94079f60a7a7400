"""2-chip front-end/back-end pipelining (the TPU shape of the
reference's Tracking/LocalMapping thread split, System.cc:178): tracking
runs on one device against an async map replica, keyframe work on a
second device against the canonical map. Exercised on two virtual CPU
devices; the orchestration is device-count agnostic."""

import numpy as np
import jax
import pytest

from orb_slam3_ros_tpu.models.system import MonoSlam, OK
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse


@pytest.mark.slow
class TestTwoChipSplit:
    def test_split_matches_single_device(self):
        devs = jax.devices()
        assert len(devs) >= 2, "conftest provides 8 virtual devices"
        seq = synth.make_sequence(
            n_frames=30, height=240, width=376, dt=0.1, seed=3
        )

        def run(devices):
            slam = MonoSlam(
                height=240, width=376, cam_params=seq.cam_params,
                n_features=1200, max_keyframes=32, max_points=4096,
                devices=devices,
            )
            for i in range(30):
                slam.process_frame(seq.images[i], float(seq.timestamps[i]))
            slam.flush()
            assert slam.state == OK
            traj = slam.get_trajectory()
            ts = np.asarray([t for t, _ in traj])
            est = np.stack([T[:3, 3] for _, T in traj])
            rmse, n, _ = ate_rmse(
                ts, est, seq.timestamps.astype(np.float64), seq.t_wc
            )
            return rmse, n, slam

        rmse_split, n_split, slam = run((devs[0], devs[1]))
        # canonical map lives on device 1, tracking replica on device 0
        assert devs[1] in slam.map.kf_R.sharding.device_set
        assert devs[0] in slam._tmap().kf_R.sharding.device_set
        assert n_split >= 25
        assert rmse_split < 0.12, rmse_split

        rmse_single, n_single, _ = run(None)
        # The split tracks against a one-keyframe-stale replica; allow
        # modest degradation vs the single-device result.
        assert rmse_split < max(2.0 * rmse_single, 0.08), (
            rmse_split, rmse_single,
        )
