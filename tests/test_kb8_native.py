"""Native KB8 fisheye tracking — no virtual-pinhole rectification
(VERDICT r2 #5; reference: KannalaBrandt8.cpp own projection/
triangulation, OptimizableTypes.h KB8 edges through the virtual camera
interface). The pipeline's jitted programs specialize on
``cam_model="kb8"`` and operate on RAW fisheye pixels end to end:
initialization (bearing-space H/F RANSAC), tracking (KB8 projection +
pose opt), triangulation (essential-matrix gate on bearings), local BA
(KB8 reprojection Jacobians by AD), fusion, relocalization (bearing
PnP)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.models.system import MonoSlam, OK
from orb_slam3_ros_tpu.ops import cameras
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse

KB8 = np.asarray(
    [150.0, 150.0, 187.5, 119.5, 0.02, 0.001, -0.002, 0.0002], np.float32
)


@pytest.mark.slow
class TestNativeKB8:
    def test_fisheye_sequence_tracks_natively(self):
        """Raw KB8 frames through the native-KB8 pipeline: tracked with
        ATE at or better than the rectified path's bound (0.15,
        test_rectify) — no FoV crop, no resampling."""
        scene = synth.make_room(seed=2)
        H, W = 240, 376
        R_wc, t_wc, ts = synth.orbit_trajectory(25, dt=0.1, seed=2)
        slam = MonoSlam(
            height=H, width=W, cam_params=KB8, n_features=1200,
            max_keyframes=32, max_points=4096, cam_model="kb8",
        )
        for i in range(25):
            img, _ = synth.render(
                scene, jnp.asarray(R_wc[i]), jnp.asarray(t_wc[i]),
                jnp.asarray(KB8), height=H, width=W, cam_model="kb8",
            )
            slam.process_frame(np.asarray(img), float(ts[i]))
        assert slam.state == OK, "native KB8 tracking never initialized"
        traj = slam.get_trajectory()
        tss = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, n, _ = ate_rmse(tss, est, ts.astype(np.float64), t_wc)
        assert n >= 12
        assert rmse < 0.15, f"native KB8 ATE {rmse:.3f}"
        assert slam.n_kf >= 4

    def test_kb8_projection_roundtrip(self):
        rng = np.random.default_rng(0)
        X = rng.uniform([-1, -1, 0.5], [1, 1, 4], size=(64, 3)).astype(
            np.float32
        )
        uv = cameras.kb8_project(jnp.asarray(KB8), jnp.asarray(X))
        rays = cameras.kb8_unproject(jnp.asarray(KB8), uv)
        dir_err = 1.0 - np.sum(
            np.asarray(rays) * X / np.linalg.norm(rays, axis=-1, keepdims=True)
            / np.linalg.norm(X, axis=-1, keepdims=True),
            axis=-1,
        )
        assert np.max(np.abs(dir_err)) < 1e-4
