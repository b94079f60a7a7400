"""Long-sequence soak: 1000 frames, K_cap=256, a multi-revolution
trajectory with repeated genuine revisits — exercises slot compaction /
eviction, vocabulary retrain at keyframe-count doublings, unbounded
loop-edge storage, O(K*k) PGO assembly, and chunk-path throughput decay
TOGETHER, none of which short tests cover (full-sequence replay pattern,
orb_slam3/Examples/mono_inertial_euroc.cc:40-120)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.models.system import OK, MonoSlam
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse


@pytest.mark.slow
class TestSoak:
    def test_1000_frame_multiloop(self):
        n = 1000
        seq = synth.make_sequence(
            n_frames=n, height=240, width=376, dt=0.1, seed=5,
            trajectory="multiloop",
        )
        slam = MonoSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=800, max_keyframes=256, max_points=8192,
            kf_every=3, fuse_every=3, stats_every=3, cull_every=3,
            lean_after_kf=4, track_cap=768,
            enable_loop_closing=True,
            # Sliding-window tracking (odometry mode, device-side point
            # mask in the chunk loop): old revolutions leave the tracked
            # set, so GENUINE drift accumulates and each revisit needs a
            # real, drift-correcting loop closure — the reference's
            # closure regime, with its covisibility gating intact.
            track_window=12,
        )
        compactions = {"n": 0}
        orig_compact = slam._compact_kf_slots

        def counted():
            compactions["n"] += 1
            return orig_compact()

        slam._compact_kf_slots = counted
        retrains = {"n": 0}
        lc = slam.loop_closer
        orig_poll = lc._poll_vocab_training

        def counted_poll(s):
            # Count training SUBMISSIONS (a background k-medians may
            # still be in flight when the sequence ends — installs
            # undercount).
            had = getattr(lc, "_vocab_future", None)
            out = orig_poll(s)
            if had is None and getattr(lc, "_vocab_future", None) is not None:
                retrains["n"] += 1
            return out

        lc._poll_vocab_training = counted_poll

        chunk = 15
        stack = jnp.asarray(
            np.clip(np.stack(seq.images), 0, 255).astype(np.uint8)
        )
        i = 0
        while i < n:
            if slam.state == OK and slam._chunkable() and i + chunk <= n:
                slam.process_frames(
                    (stack, i), seq.timestamps[i : i + chunk]
                )
                i += chunk
            else:
                slam.process_frame(seq.images[i], float(seq.timestamps[i]))
                i += 1
        slam.flush()

        assert slam.state == OK
        # The live keyframe set stayed within capacity while the
        # sequence inserted far more than K_cap keyframes.
        assert slam.n_kf <= 256
        # Capacity management actually ran (culling alone cannot absorb
        # ~330 insertions into 256 slots).
        assert compactions["n"] >= 1, "no compaction/eviction happened"
        # Vocabulary retrained at least once past the initial training.
        assert retrains["n"] >= 2, f"vocab retrains: {retrains['n']}"
        # Genuine closures: one per revolution is available; require 3.
        assert len(slam.loop_closer.closures) >= 3, (
            f"closures: {slam.loop_closer.closures}"
        )
        traj = slam.get_trajectory()
        # A few loss-and-relocalize episodes are expected over 100 s of
        # the synthetic room's harder viewing angles.
        assert len(traj) >= 0.80 * n, f"tracked {len(traj)}/{n}"
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, nm, s = ate_rmse(
            ts, est, seq.timestamps.astype(np.float64), seq.t_wc,
            with_scale=True,
        )
        assert nm >= 0.75 * n
        assert rmse < 0.15, f"soak ATE {rmse:.4f}"
