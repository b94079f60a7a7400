"""AR demo equivalent: plane RANSAC on map points + cube overlay
(headless counterpart of the reference's src/AR/ ViewerAR demo)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import plane
from orb_slam3_ros_tpu.utils import ar, synth


class TestDetectPlane:
    def test_recovers_synthetic_plane(self, rng):
        # 70% of points on z = 2 + 0.3x - 0.2y, 30% outliers
        n = 400
        x = rng.uniform(-2, 2, n).astype(np.float32)
        y = rng.uniform(-2, 2, n).astype(np.float32)
        z = 2.0 + 0.3 * x - 0.2 * y
        X = np.stack([x, y, z], -1)
        out = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        is_out = rng.uniform(size=n) < 0.3
        X[is_out] = out[is_out]
        res = jax.device_get(
            plane.detect_plane(
                jnp.asarray(X), jnp.ones(n, bool), jax.random.PRNGKey(0)
            )
        )
        assert bool(res.ok)
        # recovered normal parallel to (-0.3, 0.2, 1)/norm
        n_true = np.array([-0.3, 0.2, 1.0])
        n_true /= np.linalg.norm(n_true)
        cos = abs(float(np.asarray(res.normal) @ n_true))
        assert cos > 0.99, cos
        assert int(res.n_inliers) > 0.5 * (n - is_out.sum())

    def test_rejects_unstructured_cloud(self, rng):
        X = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
        res = jax.device_get(
            plane.detect_plane(
                jnp.asarray(X), jnp.ones(300, bool), jax.random.PRNGKey(1),
                min_inlier_frac=0.5,
            )
        )
        assert not bool(res.ok)


class TestARDemo:
    def test_cube_overlay_on_slam_map(self):
        """Track a synthetic sequence, detect a wall plane, render the
        cube: drawn pixels must appear and the cube must stay anchored in
        the world (projections move with the camera, vertices do not)."""
        from orb_slam3_ros_tpu.models.system import MonoSlam, OK

        seq = synth.make_sequence(
            n_frames=25, height=240, width=376, dt=0.1, seed=3
        )
        slam = MonoSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=1200, max_keyframes=32, max_points=4096,
        )
        for i in range(25):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        slam.flush()
        assert slam.state == OK
        demo = ar.ARDemo(slam)
        assert demo.try_detect_plane(), "no dominant plane on the map"
        v0 = demo.verts.copy()
        out = demo.render(seq.images[-1])
        assert out.shape == seq.images[-1].shape
        diff = np.abs(out - np.asarray(seq.images[-1], np.float32))
        assert (diff > 0).sum() > 50, "no cube pixels drawn"
        # world anchoring: vertices unchanged by rendering more frames
        demo.render(seq.images[-2])
        np.testing.assert_array_equal(demo.verts, v0)

    def test_plane_on_map_is_wall(self):
        """The detected plane should coincide with one of the room's
        axis-aligned walls (synthetic scene geometry is a box)."""
        from orb_slam3_ros_tpu.models.system import MonoSlam

        seq = synth.make_sequence(
            n_frames=25, height=240, width=376, dt=0.1, seed=3
        )
        slam = MonoSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=1200, max_keyframes=32, max_points=4096,
        )
        for i in range(25):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        slam.flush()
        demo = ar.ARDemo(slam)
        assert demo.try_detect_plane()
        n, d, anchor = demo.plane
        # mono map axes: world = first camera frame; the scene is a box
        # around the trajectory, so the dominant plane normal should be
        # near one coordinate axis of the (gravity-free) world.
        ax = np.abs(n)
        assert ax.max() > 0.9, f"plane normal not axis-like: {n}"
