"""Multi-session workflow end to end: run a session, checkpoint the
whole Atlas, load it into a FRESH system, relocalize in the loaded map,
and continue — plus localization-only mode on a frozen map.

Reference surface: ``System::ActivateLocalizationMode`` /
``DeactivateLocalizationMode`` (orb_slam3/src/System.cc:399-437), the
``mbOnlyTracking`` branch of ``Tracking::Track`` (Tracking.cc:1999-2124),
and the load-and-continue path ``System::LoadAtlas`` ->
``Atlas::PostLoad`` -> relocalize (System.cc:1471-1533, Atlas.cc:335).
"""

import numpy as np
import pytest

from orb_slam3_ros_tpu.models.system import MonoSlam, LOST, OK
from orb_slam3_ros_tpu.utils import checkpoint, synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse


@pytest.fixture(scope="module")
def seq():
    # Same cached sequence as test_e2e_mono (seed 3, 40 frames).
    return synth.make_sequence(n_frames=40, height=240, width=376,
                               dt=0.1, seed=3)


def _new_slam(seq):
    return MonoSlam(
        height=240, width=376, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=32, max_points=4096,
    )


def _run(slam, seq, lo, hi):
    out = []
    for i in range(lo, hi):
        T = slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        out.append((float(seq.timestamps[i]), T))
    return out


def _ate(poses, seq):
    kept = [(ts, T) for ts, T in poses if T is not None]
    ts = np.asarray([t for t, _ in kept])
    est = np.stack([T[:3, 3] for _, T in kept])
    rmse, n, s = ate_rmse(ts, est, seq.timestamps.astype(np.float64),
                          seq.t_wc, with_scale=True)
    return rmse, n


@pytest.fixture(scope="module")
def session_a(seq, tmp_path_factory):
    """Session A: map the first 28 frames, checkpoint, return the path."""
    slam = _new_slam(seq)
    poses = _run(slam, seq, 0, 28)
    path = str(tmp_path_factory.mktemp("ckpt") / "session_a")
    checkpoint.save_atlas(path, slam)
    return dict(path=path, n_kf=slam.n_kf, n_pts=slam.n_pts, poses=poses)


class TestLocalizationOnly:
    def test_frozen_map_tracks_and_inserts_nothing(self, seq):
        slam = _new_slam(seq)
        _run(slam, seq, 0, 28)
        assert slam.state == OK
        slam.activate_localization_mode()
        n_kf0, n_pts0 = slam.n_kf, slam.n_pts
        poses = _run(slam, seq, 28, 40)
        slam.flush()
        # Frozen map: not one keyframe or landmark was added while
        # tracking continued through unseen frames.
        assert slam.n_kf == n_kf0 and slam.n_pts == n_pts0
        tracked = sum(T is not None for _, T in poses)
        assert tracked >= 10, f"tracked {tracked}/12 in localization mode"
        rmse, n = _ate(poses, seq)
        assert rmse < 0.10, f"localization-mode ATE {rmse:.3f} m"

    def test_deactivate_resumes_mapping(self, seq):
        slam = _new_slam(seq)
        _run(slam, seq, 0, 20)
        slam.activate_localization_mode()
        _run(slam, seq, 20, 28)
        n_kf_frozen = slam.n_kf
        slam.deactivate_localization_mode()
        _run(slam, seq, 28, 40)
        slam.flush()
        assert slam.n_kf > n_kf_frozen, "mapping did not resume"


class TestMultiSessionResume:
    def test_load_relocalize_continue(self, seq, session_a):
        """save -> NEW system -> load -> relocalize -> continue mapping,
        the full multi-session loop (System.cc:1471-1533)."""
        slam = _new_slam(seq)
        checkpoint.load_atlas(session_a["path"], slam)
        assert slam.n_kf == session_a["n_kf"]
        # The new process does not trust the checkpoint's final pose:
        # force the relocalization path (the reference's post-load state).
        slam.state = LOST
        poses = _run(slam, seq, 24, 40)
        assert slam.state == OK, "never relocalized in the loaded map"
        # Relocalized within a few frames and kept tracking.
        tracked = sum(T is not None for _, T in poses)
        assert tracked >= 12, f"tracked {tracked}/16 after load"
        # Continued MAPPING (not just tracking) in the loaded map.
        slam.flush()
        assert slam.n_kf > session_a["n_kf"]
        rmse, n = _ate(poses, seq)
        assert rmse < 0.10, f"post-load ATE {rmse:.3f} m over {n} frames"

    def test_load_localization_only_replay(self, seq, session_a):
        """Load -> localization-only: the reference's canonical
        'localize against a prior map' deployment mode."""
        slam = _new_slam(seq)
        checkpoint.load_atlas(session_a["path"], slam)
        slam.state = LOST
        slam.activate_localization_mode()
        poses = _run(slam, seq, 24, 40)
        assert slam.state == OK
        assert slam.n_kf == session_a["n_kf"]
        assert slam.n_pts == session_a["n_pts"]
        rmse, n = _ate(poses, seq)
        assert n >= 10
        assert rmse < 0.10, f"frozen-map reloc ATE {rmse:.3f} m"
