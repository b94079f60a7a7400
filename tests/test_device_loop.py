"""Device-resident chunked frame loop (models/device_loop.py): chunked
processing must match the per-frame path's quality and survive loss."""

import numpy as np
import jax
import pytest

from orb_slam3_ros_tpu.models.system import MonoSlam, OK, LOST
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse


def _run(seq, n, chunked, preloaded=False, **kw):
    # lean_after_kf low enough that _chunkable() actually admits the
    # chunk path on these short sequences (it gates on map maturity).
    kw.setdefault("lean_after_kf", 4)
    slam = MonoSlam(height=240, width=376, cam_params=seq.cam_params,
                    n_features=1200, max_keyframes=32, max_points=4096, **kw)
    i = 0
    if chunked:
        stack = None
        if preloaded:
            import jax.numpy as jnp

            kw_u8 = getattr(slam, "transfer_uint8", False)
            stack = jnp.asarray(
                np.clip(np.stack(seq.images), 0, 255).astype(np.uint8)
                if kw_u8 else np.stack(seq.images).astype(np.float32)
            )
        while slam.state != OK and i < n:
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
            i += 1
        while i < n:
            j = min(i + 8, n)
            if preloaded and j - i == 8:
                slam.process_frames((stack, i), seq.timestamps[i:j])
            else:
                slam.process_frames(
                    [seq.images[k] for k in range(i, j)], seq.timestamps[i:j]
                )
            i = j
    else:
        for i in range(n):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
    slam.flush()
    traj = slam.get_trajectory()
    ts = np.asarray([t for t, _ in traj])
    est = np.stack([T[:3, 3] for _, T in traj])
    rmse, nm, _ = ate_rmse(ts, est, seq.timestamps.astype(np.float64), seq.t_wc)
    return rmse, nm, slam


@pytest.mark.slow
class TestDeviceLoop:
    def test_chunked_matches_per_frame(self):
        n = 40
        seq = synth.make_sequence(n_frames=n, height=240, width=376,
                                  dt=0.1, seed=3)
        rmse_c, nm_c, slam_c = _run(seq, n, True)
        rmse_f, nm_f, _ = _run(seq, n, False)
        assert nm_c >= nm_f - 2
        assert rmse_c < max(1.5 * rmse_f, 0.05), (rmse_c, rmse_f)
        assert slam_c.n_kf >= 4

    def test_preloaded_window_matches_list_path(self):
        """The (device stack, offset) packed single-upload path must
        produce the same-quality trajectory as the list path."""
        n = 40
        seq = synth.make_sequence(n_frames=n, height=240, width=376,
                                  dt=0.1, seed=3)
        rmse_p, nm_p, slam_p = _run(seq, n, True, preloaded=True)
        rmse_l, nm_l, _ = _run(seq, n, True)
        assert nm_p >= nm_l - 2
        assert rmse_p < max(1.5 * rmse_l, 0.05), (rmse_p, rmse_l)
        assert slam_p.n_kf >= 4

    def test_track_cap_quality(self):
        """Local-map tracking compaction must not degrade accuracy."""
        n = 40
        seq = synth.make_sequence(n_frames=n, height=240, width=376,
                                  dt=0.1, seed=3)
        rmse, nm, _ = _run(seq, n, True, track_cap=2048)
        assert nm >= n - 5
        assert rmse < 0.06, rmse

    def test_blackout_falls_back_and_recovers(self):
        """Frames the chunk cannot track are replayed host-side; the
        pipeline ends in a recoverable state."""
        n = 40
        seq = synth.make_sequence(n_frames=n, height=240, width=376,
                                  dt=0.1, seed=3)
        imgs = seq.images.copy()
        imgs[20:23] = 0.0  # blackout
        slam = MonoSlam(height=240, width=376, cam_params=seq.cam_params,
                        n_features=1200, max_keyframes=32, max_points=4096)
        i = 0
        while slam.state != OK and i < n:
            slam.process_frame(imgs[i], float(seq.timestamps[i]))
            i += 1
        while i < n:
            j = min(i + 8, n)
            slam.process_frames(
                [imgs[k] for k in range(i, j)], seq.timestamps[i:j]
            )
            i = j
        slam.flush()
        # Either relocalized back to OK or LOST with a preserved map —
        # never crashed or silently corrupted.
        assert slam.state in (OK, LOST)
        assert slam.n_kf >= 4
        traj = slam.get_trajectory()
        est = np.stack([T[:3, 3] for _, T in traj])
        assert np.isfinite(est).all()
