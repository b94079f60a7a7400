"""Keyframe-slot recycling: compaction + forced culling keep a
fixed-capacity map running on unbounded sequences (VERDICT r1: culled
slots were never reused, so mapping silently stalled at K_cap)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.models import map_state as ms
from orb_slam3_ros_tpu.models import map_updates
from orb_slam3_ros_tpu.models.system import MonoSlam, OK
from orb_slam3_ros_tpu.utils import synth


class TestCompactDeviceFn:
    def test_order_and_remap(self):
        K, N, P = 8, 4, 16
        m = ms.empty_map(K, N, P)
        valid = np.array([1, 1, 0, 1, 0, 1, 1, 0], bool)
        m = m._replace(
            kf_valid=jnp.asarray(valid),
            kf_ts=jnp.arange(K, dtype=jnp.float32),  # slot id tracer
            pt_first_kf=jnp.asarray(
                np.array([0, 1, 2, 3, 4, 5, 6, 7] * 2, np.int32)
            ),
            pt_valid=jnp.ones((P,), bool),
        )
        m2, n_valid, order = map_updates.compact_keyframes(m)
        assert int(n_valid) == 5
        # survivors keep temporal order, parked at the front
        np.testing.assert_array_equal(
            np.asarray(m2.kf_ts)[:5], [0.0, 1.0, 3.0, 5.0, 6.0]
        )
        np.testing.assert_array_equal(
            np.asarray(m2.kf_valid), [1, 1, 1, 1, 1, 0, 0, 0]
        )
        # pt_first_kf: culled creators fall back to the nearest earlier
        # survivor (old slot 2 -> new 1, old 4 -> new 2, old 7 -> new 4)
        expect = np.array([0, 1, 1, 2, 2, 3, 4, 4] * 2, np.int32)
        np.testing.assert_array_equal(np.asarray(m2.pt_first_kf), expect)


@pytest.mark.slow
class TestLongRunNoStall:
    def test_mapping_survives_capacity(self):
        """200 frames with K_cap=20 at kf_every=3 would need ~60 slots
        without recycling; with compaction + forced culling the system
        must keep inserting keyframes to the end of the sequence."""
        n = 200
        seq = synth.make_sequence(
            n_frames=n, height=180, width=240, dt=0.1, seed=3
        )
        slam = MonoSlam(
            height=180, width=240, cam_params=seq.cam_params,
            n_features=600, max_keyframes=20, max_points=3072, kf_every=3,
        )
        for i in range(n):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        slam.flush()
        assert slam.state == OK
        assert slam.n_kf <= 20
        # keyframes were still being created near the end of the run
        assert slam.last_kf_frame > n - 25, (
            f"stalled at frame {slam.last_kf_frame}"
        )
        traj = slam.get_trajectory()
        assert len(traj) > n - 20
        est = np.stack([T[:3, 3] for _, T in traj])
        assert np.isfinite(est).all()
