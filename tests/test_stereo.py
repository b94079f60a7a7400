"""Tests for stereo matching and the stereo/RGB-D pipelines."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.models.stereo_system import RgbdSlam, StereoSlam
from orb_slam3_ros_tpu.models.system import OK
from orb_slam3_ros_tpu.ops import orb, stereo
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse

BASELINE = 0.12


@pytest.fixture(scope="module")
def stereo_seq():
    return synth.make_sequence(
        n_frames=25, height=240, width=376, dt=0.1, seed=3,
        stereo_baseline=BASELINE, with_depth=True,
    )


class TestStereoMatch:
    def test_depth_against_ground_truth(self, stereo_seq):
        seq = stereo_seq
        config = orb.default_config(240, 376, n_features=800)
        ex = jax.jit(lambda im: orb.extract(im, config))
        fl = ex(jnp.asarray(seq.images[0]))
        fr = ex(jnp.asarray(seq.images_right[0]))
        sm = stereo.match_stereo(
            fl, fr, jnp.asarray(seq.images[0]), jnp.asarray(seq.images_right[0]),
            fx=float(seq.cam_params[0]), baseline=BASELINE,
        )
        valid = np.asarray(sm.valid)
        assert valid.sum() > 100, f"only {valid.sum()} stereo matches"
        # compare against rendered depth at keypoint locations
        xy = np.asarray(fl.xy)[valid]
        d_est = np.asarray(sm.depth)[valid]
        d_gt = seq.depths[0][
            np.clip(xy[:, 1].astype(int), 0, 239), np.clip(xy[:, 0].astype(int), 0, 375)
        ]
        rel = np.abs(d_est - d_gt) / d_gt
        assert np.median(rel) < 0.05, np.median(rel)
        assert (rel < 0.15).mean() > 0.8, (rel < 0.15).mean()

    def test_subpixel_refinement_improves(self, stereo_seq):
        seq = stereo_seq
        config = orb.default_config(240, 376, n_features=800)
        ex = jax.jit(lambda im: orb.extract(im, config))
        fl = ex(jnp.asarray(seq.images[0]))
        fr = ex(jnp.asarray(seq.images_right[0]))
        sm = stereo.match_stereo(
            fl, fr, jnp.asarray(seq.images[0]), jnp.asarray(seq.images_right[0]),
            fx=float(seq.cam_params[0]), baseline=BASELINE,
        )
        # u_right should be non-integer for most matches (evidence the
        # parabola refinement is applied)
        ur = np.asarray(sm.u_right)[np.asarray(sm.valid)]
        frac = np.abs(ur - np.round(ur))
        assert (frac > 0.01).mean() > 0.5


class TestStereoPipeline:
    @pytest.mark.slow
    def test_e2e_metric_scale(self, stereo_seq):
        seq = stereo_seq
        slam = StereoSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=800, max_keyframes=32, max_points=4096,
            baseline=BASELINE,
        )
        for i in range(len(seq.images)):
            slam.process_frame(seq.images[i], seq.images_right[i],
                               float(seq.timestamps[i]))
        assert slam.state == OK
        assert slam.n_kf >= 3
        ts = np.asarray([t for t, _ in slam.trajectory])
        est = np.stack([T[:3, 3] for _, T in slam.trajectory])
        # metric: evaluate WITHOUT scale alignment
        rmse, n, s = ate_rmse(ts, est, seq.timestamps.astype(np.float64),
                              seq.t_wc, with_scale=False)
        assert n >= 20
        assert rmse < 0.08, f"metric ATE {rmse:.3f}"
        # the recovered scale should be ~1 when allowed to float
        rmse_s, _, s2 = ate_rmse(ts, est, seq.timestamps.astype(np.float64),
                                 seq.t_wc, with_scale=True)
        assert abs(s2 - 1.0) < 0.05, s2


@pytest.mark.slow
class TestStereoChunk:
    def test_chunked_matches_per_frame(self):
        """The stereo chunk loop ([2,H,W] pairs on the device stack,
        (u,v,u_r) BA rows, depth-point creation in the KF body) must
        match the per-frame stereo path's metric quality."""
        n = 48
        seq = synth.make_sequence(
            n_frames=n, height=240, width=376, dt=0.1, seed=3,
            stereo_baseline=BASELINE,
        )

        def run(chunked):
            slam = StereoSlam(
                height=240, width=376, cam_params=seq.cam_params,
                n_features=800, max_keyframes=32, max_points=4096,
                baseline=BASELINE, kf_every=4, lean_after_kf=3,
            )
            counts = {"pf": 0}
            orig = slam.process_frame

            def counted(*a, **k):
                counts["pf"] += 1
                return orig(*a, **k)

            slam.process_frame = counted
            i = 0
            chunk = 8
            if chunked:
                pairs = jnp.asarray(np.stack(
                    [np.stack([l, r]) for l, r in
                     zip(seq.images, seq.images_right)]
                ).astype(np.float32))
                while i < n and not slam._chunkable():
                    slam.process_frame(
                        seq.images[i], seq.images_right[i],
                        float(seq.timestamps[i]),
                    )
                    i += 1
                i_steady = i
                while i + chunk <= n:
                    slam.process_frames(
                        (pairs, i), seq.timestamps[i : i + chunk]
                    )
                    i += chunk
            else:
                i_steady = n
            while i < n:
                slam.process_frame(
                    seq.images[i], seq.images_right[i],
                    float(seq.timestamps[i]),
                )
                i += 1
            slam.flush()
            return slam, i_steady, counts["pf"]

        slam_c, i_steady, pf_calls = run(True)
        slam_f, _, _ = run(False)
        assert slam_c.state == OK
        assert i_steady <= 24, f"chunk never engaged (steady at {i_steady})"
        # The chunk actually processed most steady-state frames.
        assert pf_calls - i_steady <= 8
        assert slam_c.n_kf >= slam_f.n_kf - 2

        def _metric_ate(slam):
            ts = np.asarray([t for t, _ in slam.get_trajectory()])
            est = np.stack([T[:3, 3] for _, T in slam.get_trajectory()])
            rmse, nm, s = ate_rmse(
                ts, est, seq.timestamps.astype(np.float64), seq.t_wc,
                with_scale=False,
            )
            return rmse, nm

        rmse_c, nm_c = _metric_ate(slam_c)
        rmse_f, _ = _metric_ate(slam_f)
        assert nm_c >= n - 8
        assert rmse_c < max(0.08, 2.5 * rmse_f + 0.02), (
            f"chunked stereo ATE {rmse_c:.4f} vs per-frame {rmse_f:.4f}"
        )


class TestRgbdPipeline:
    @pytest.mark.slow
    def test_e2e_metric_scale(self, stereo_seq):
        seq = stereo_seq
        slam = RgbdSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=800, max_keyframes=32, max_points=4096,
        )
        for i in range(len(seq.images)):
            slam.process_frame(seq.images[i], seq.depths[i],
                               float(seq.timestamps[i]))
        assert slam.state == OK
        ts = np.asarray([t for t, _ in slam.trajectory])
        est = np.stack([T[:3, 3] for _, T in slam.trajectory])
        rmse, n, _ = ate_rmse(ts, est, seq.timestamps.astype(np.float64),
                              seq.t_wc, with_scale=False)
        assert n >= 20
        assert rmse < 0.06, f"metric ATE {rmse:.3f}"
