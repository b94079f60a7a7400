"""NeedNewKeyFrame ratio densification (the reference's thRefRatio c2
condition, Tracking.cc:3103: insert when tracked inliers sag relative to
the reference keyframe's count, not only below an absolute floor) —
keeps a map reserve through weak-texture viewing angles instead of
limping toward tracking loss (the round-4 soak failure mode)."""

import numpy as np

from orb_slam3_ros_tpu.models.system import MonoSlam, OK

CAM = np.asarray([120.0, 120.0, 96.0, 64.0, 0, 0, 0, 0, 0], np.float32)


def _slam(**kw):
    s = MonoSlam(height=128, width=192, cam_params=CAM, n_features=200,
                 max_keyframes=8, max_points=256, pipelined=False,
                 kf_every=10, kf_min_inliers=60, **kw)
    s.state = OK
    s.n_kf = 4
    s.last_kf_frame = 0
    s.frame_id = 3  # since = 3: inside the periodic cadence
    return s


class TestNeedKeyframeRatio:
    def test_ratio_fires_on_relative_sag(self):
        s = _slam(kf_ref_ratio=0.5)
        s._ref_kf_inl = 300
        assert not s._need_keyframe(200)  # healthy: 2/3 of reference
        assert s._need_keyframe(140)      # sagged below 0.5 * 300

    def test_absolute_floor_still_fires(self):
        s = _slam(kf_ref_ratio=0.0)
        s._ref_kf_inl = 300
        assert not s._need_keyframe(140)  # ratio off: 140 >= 60 floor
        assert s._need_keyframe(50)       # below the absolute floor

    def test_unseeded_reference_is_inert(self):
        s = _slam(kf_ref_ratio=0.5)
        s._ref_kf_inl = 0  # no keyframe inserted through the host path yet
        assert not s._need_keyframe(140)

    def test_periodic_cadence_unchanged(self):
        s = _slam(kf_ref_ratio=0.5)
        s._ref_kf_inl = 300
        s.frame_id = 10  # since = kf_every
        assert s._need_keyframe(290)
