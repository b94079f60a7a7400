"""Per-frame VI motion-only tracking, the RECENTLY_LOST dead-reckoning
ladder, and timestamp-jump segmentation (Tracking.cc:1856-2068;
Optimizer.cc:4636/5020)."""

import numpy as np
import pytest

from orb_slam3_ros_tpu.models.inertial_system import InertialSlam
from orb_slam3_ros_tpu.models.system import (
    LOST,
    NOT_INITIALIZED,
    OK,
    RECENTLY_LOST,
    MonoSlam,
)
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


def _run(vi_seq, blackout=(), vi_tracking=True):
    seq, imu = vi_seq
    slam = InertialSlam(
        height=240, width=376, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=32, max_points=4096, kf_every=3,
        calib=make_calib(freq=100.0), init_after_kf=6,
        vi_tracking=vi_tracking,
    )
    states = []
    for i in range(len(seq.images)):
        img = seq.images[i]
        if i in blackout:
            img = np.full_like(np.asarray(img), 0.5)  # feature-starved
        slam.process_frame(
            img, float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
        states.append(slam.state)
    return slam, states, seq


class TestViTrackingBlackout:
    def test_survives_feature_starved_segment(self, vi_seq):
        """A 5-frame blackout after IMU init: visual-only tracking goes
        LOST; the VI tracker dead-reckons through RECENTLY_LOST and
        recovers OK with bounded metric ATE."""
        blackout = set(range(30, 35))
        slam, states, seq = _run(vi_seq, blackout=blackout)
        assert slam.imu_initialized
        assert RECENTLY_LOST in states, "ladder never engaged"
        assert states[-1] == OK, "did not recover after blackout"
        assert LOST not in states

        traj = slam.get_trajectory()
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, n, s = ate_rmse(
            ts[12:], est[12:], seq.timestamps.astype(np.float64), seq.t_wc,
            with_scale=True,
        )
        assert n >= 25
        assert rmse < 0.2, f"ATE {rmse:.3f} after blackout"

    def test_visual_only_fails_same_segment(self, vi_seq):
        """The same blackout without the VI tracker: tracking must drop to
        LOST (the failure mode the VI ladder exists to prevent)."""
        blackout = set(range(30, 35))
        slam, states, _ = _run(vi_seq, blackout=blackout, vi_tracking=False)
        assert LOST in states

    def test_vi_tracking_matches_visual_accuracy(self, vi_seq):
        """On a clean sequence the VI tracker must not degrade ATE vs the
        visual-only pipeline (it should help scale consistency)."""
        slam, states, seq = _run(vi_seq)
        assert states[-1] == OK
        traj = slam.get_trajectory()
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, n, s = ate_rmse(
            ts[12:], est[12:], seq.timestamps.astype(np.float64), seq.t_wc,
            with_scale=True,
        )
        assert rmse < 0.12, f"ATE {rmse:.3f}"
        assert abs(s - 1.0) < 0.15, f"scale {s:.3f}"


class TestTimestampJump:
    def test_jump_drops_tracking_without_atlas(self):
        seq = synth.make_sequence(n_frames=30, height=240, width=376, dt=0.1, seed=3)
        slam = MonoSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=1200, max_keyframes=32, max_points=4096,
        )
        for i in range(20):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        assert slam.state == OK
        # 5-second input gap (threshold 1.0 s, Tracking.cc:1861): the
        # motion model must be abandoned — tracking drops to LOST and the
        # next frame goes through relocalization (which may legitimately
        # recover immediately since the scene is unchanged).
        slam._check_ts_jump(float(seq.timestamps[19]) + 5.0)
        assert slam.state == LOST
        # ...and a small gap must NOT drop tracking
        slam.state = OK
        slam._check_ts_jump(float(seq.timestamps[19]) + 5.1)
        assert slam.state == OK

    def test_jump_segments_map_with_atlas(self):
        """Reference policy (Tracking.cc:2050-2068): a map below the keep
        threshold (<10 KFs there, Atlas.min_kf_keep here) is RESET on a
        timestamp jump, a substantial map is ARCHIVED; either way a fresh
        map starts. kf_every=2 makes the 20-frame prefix produce >=
        min_kf_keep keyframes so the archive branch is exercised."""
        seq = synth.make_sequence(n_frames=40, height=240, width=376, dt=0.1, seed=3)
        slam = MonoSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=1200, max_keyframes=32, max_points=4096,
            enable_atlas=True, kf_every=2,
        )
        for i in range(20):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        assert slam.state == OK
        assert slam.n_kf >= slam.atlas.min_kf_keep, "prefix map too small"
        n_maps_before = len(slam.atlas.maps)
        # the jump archives the live map and re-initializes a fresh one
        for i in range(20, 40):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]) + 5.0)
        assert len(slam.atlas.maps) == n_maps_before + 1
        assert slam.state == OK, "fresh map never initialized after jump"

    def test_jump_discards_small_map_with_atlas(self):
        """A below-threshold map must be discarded (reference resets maps
        with <10 KFs instead of archiving, Tracking.cc:2050-2068)."""
        seq = synth.make_sequence(n_frames=40, height=240, width=376, dt=0.1, seed=3)
        slam = MonoSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=1200, max_keyframes=32, max_points=4096,
            enable_atlas=True,  # default kf_every=5: ~4 KFs in 14 frames
        )
        for i in range(14):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        assert slam.state == OK
        assert slam.n_kf < slam.atlas.min_kf_keep
        n_maps_before = len(slam.atlas.maps)
        for i in range(14, 40):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]) + 5.0)
        assert len(slam.atlas.maps) == n_maps_before, "small map not reset"
        assert slam.state == OK, "fresh map never initialized after jump"
