"""Device-resident VI chunk loop (models/vi_device_loop.py): chunked
visual-inertial processing must match the per-frame VI path's quality,
keep the host keyframe-IMU mirror exact, and hand off to the loss
ladder on tracking failure."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.models.inertial_system import InertialSlam
from orb_slam3_ros_tpu.models.system import OK
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse
from vi_sim import make_calib

N_FRAMES = 70


@pytest.fixture(scope="module")
def vi_seq():
    return synth.make_vi_sequence(
        n_frames=N_FRAMES, height=240, width=376, frame_dt=0.1,
        imu_per_frame=10, seed=0, bg=np.array([0.01, -0.015, 0.02]),
        noise_g=1e-4, noise_a=1e-3,
    )


def _make_slam(seq):
    return InertialSlam(
        height=240, width=376, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=32, max_points=4096, kf_every=3,
        ba_window=4, ba_fixed=2,  # W=6: chunk window fits the short run
        calib=make_calib(freq=100.0), init_after_kf=6,
    )


def _run(vi_seq, chunked: bool, chunk: int = 8):
    seq, imu = vi_seq
    slam = _make_slam(seq)
    n = len(seq.images)
    # Per-frame until the three-stage IMU-init ladder completes (the
    # chunk loop only covers the steady state).
    i = 0
    while i < n and not (slam.imu_initialized and slam.imu_stage >= 3
                         and slam.state == OK and slam.n_kf > slam.W):
        slam.process_frame(
            seq.images[i], float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
        i += 1
    i_steady = i
    if chunked:
        stack = jnp.asarray(np.stack(seq.images).astype(np.float32))
        while i + chunk <= n:
            slam.process_frames(
                (stack, i), seq.timestamps[i : i + chunk],
                acc=imu["acc"][i : i + chunk],
                gyro=imu["gyro"][i : i + chunk],
                dts=imu["dts"][i : i + chunk],
            )
            i += chunk
    while i < n:
        slam.process_frame(
            seq.images[i], float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
        i += 1
    slam.flush()
    return slam, i_steady


@pytest.mark.slow
class TestVIChunk:
    def test_chunked_matches_per_frame(self, vi_seq):
        seq, imu = vi_seq
        slam_c, i_steady = _run(vi_seq, chunked=True)
        slam_f, _ = _run(vi_seq, chunked=False)
        assert slam_c.state == OK
        # Chunks actually ran and inserted keyframes on device.
        assert i_steady < N_FRAMES - 16, "steady state never reached"
        assert slam_c.n_kf >= slam_f.n_kf - 2
        for slam in (slam_c, slam_f):
            traj = slam.get_trajectory()
            assert len(traj) >= N_FRAMES - 4
        ts_gt = seq.timestamps.astype(np.float64)

        def _ate(slam):
            traj = slam.get_trajectory()
            ts = np.asarray([t for t, _ in traj])
            est = np.stack([T[:3, 3] for _, T in traj])
            rmse, nm, s = ate_rmse(ts[12:], est[12:], ts_gt, seq.t_wc,
                                   with_scale=True)
            return rmse, nm, s

        rmse_c, nm_c, s_c = _ate(slam_c)
        rmse_f, nm_f, s_f = _ate(slam_f)
        assert nm_c >= 40
        assert rmse_c < max(0.08, 2.5 * rmse_f + 0.02), (
            f"chunked ATE {rmse_c:.4f} vs per-frame {rmse_f:.4f}"
        )
        # Metric scale survives the chunked path.
        assert abs(s_c - 1.0) < 0.10, f"chunked scale {s_c}"

    def test_chunk_composes_with_loop_closing(self):
        """The VI chunk loop must coexist with an attached LoopCloser:
        closure checks run at chunk boundaries (the mono chunk's
        composition, LoopClosing.cc:1108 role), a REAL closure fires on
        the looping trajectory, and the chunked fraction of the steady
        state stays high (the chunk gate must not permanently bail)."""
        n = 160
        # The wander trajectory: continuously strong tracking (300+
        # inliers), so the test isolates the CLOSURE COMPOSITION from
        # scene-difficulty effects.
        seq, imu = synth.make_vi_sequence(
            n_frames=n, height=240, width=376, frame_dt=0.1,
            imu_per_frame=10, seed=0, bg=np.array([0.01, -0.015, 0.02]),
            noise_g=1e-4, noise_a=1e-3,
        )
        slam = InertialSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=1200, max_keyframes=64, max_points=4096,
            kf_every=3, ba_window=4, ba_fixed=2,
            calib=make_calib(freq=100.0), init_after_kf=6,
            enable_loop_closing=True,
        )
        # VI tracking against the full map keeps the revisit COVISIBLE
        # with the first revolution's keyframes (drift is tiny in this
        # room-scale scene), so the reference's non-covisible candidate
        # rule would rightly find nothing to close. Drop the exclusion
        # so the complete closure machinery (retrieval -> Sim3
        # consistency -> 4-DoF PGO + velocity rotation -> async GBA)
        # genuinely FIRES through the chunk-boundary path; the
        # drift-correcting closure case is covered by the mono soak
        # (test_soak.py) where real drift exists.
        slam.loop_closer.use_covisibility = False
        counts = {"per_frame": 0}
        orig_pf = slam.process_frame

        def counted(*a, **k):
            counts["per_frame"] += 1
            return orig_pf(*a, **k)

        slam.process_frame = counted
        chunk = 8
        stack = jnp.asarray(np.stack(seq.images).astype(np.float32))
        i = 0
        while i < n and not slam._vi_chunkable():
            slam.process_frame(
                seq.images[i], float(seq.timestamps[i]),
                acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
            )
            i += 1
        i_steady = i
        while i + chunk <= n:
            slam.process_frames(
                (stack, i), seq.timestamps[i : i + chunk],
                acc=imu["acc"][i : i + chunk],
                gyro=imu["gyro"][i : i + chunk],
                dts=imu["dts"][i : i + chunk],
            )
            i += chunk
        while i < n:
            slam.process_frame(
                seq.images[i], float(seq.timestamps[i]),
                acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
            )
            i += 1
        slam.flush()
        assert slam.state == OK
        assert i_steady < 90, "steady chunking never reached"
        # A real closure fired through the chunk-boundary path.
        assert len(slam.loop_closer.closures) >= 1, "no closure fired"
        # Chunked-frame fraction of the steady state: per-frame calls
        # beyond the ladder are chunk bail-outs/dead-tail replays.
        steady = n - i_steady
        fallback = counts["per_frame"] - i_steady
        assert fallback <= 0.5 * steady, (
            f"chunk engaged on only {1 - fallback / steady:.0%} of the "
            f"steady state"
        )
        traj = slam.get_trajectory()
        assert len(traj) >= n - 12
        ts = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, nm, s = ate_rmse(
            ts[12:], est[12:], seq.timestamps.astype(np.float64), seq.t_wc,
            with_scale=True,
        )
        assert nm >= 100
        # Closures on an ALREADY-consistent map cannot improve it: each
        # fired correction injects the Sim3 fit's noise through the PGO
        # loop edge (the reference would simply not fire here — see the
        # use_covisibility note above). The bound accepts that known
        # cost; the drift-CORRECTING closure quality case is the mono
        # soak test.
        assert rmse < 0.18, f"VI+LC chunked ATE {rmse:.4f}"
        assert abs(s - 1.0) < 0.12, f"VI+LC chunked scale {s}"

    def test_host_kf_imu_mirror_synced(self, vi_seq):
        """The chunk's new keyframes must land their IMU edge blocks in
        the host kf_imu_* mirror (used by host-side VI solves and
        checkpointing)."""
        seq, imu = vi_seq
        slam_c, i_steady = _run(vi_seq, chunked=True)
        n_steady_kf = 0
        for k in range(1, slam_c.n_kf):
            nsamp = int((slam_c.kf_imu_dts[k] > 0).sum())
            if k not in slam_c.chain_breaks:
                assert nsamp > 0, f"KF {k} has an empty IMU block"
            n_steady_kf += 1
        assert n_steady_kf >= 8
        # Device blocks agree with the host mirror for recent slots.
        if slam_c._vi_dev_state is not None:
            dev = np.asarray(jax.device_get(slam_c._vi_dev_state.kf_blk))
            for k in range(max(1, slam_c.n_kf - 4), slam_c.n_kf):
                np.testing.assert_allclose(
                    dev[k, :, 6], slam_c.kf_imu_dts[k], atol=1e-6
                )
