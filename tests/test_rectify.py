"""Fisheye (KB8) rectification to a virtual pinhole + pipeline test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.ops import cameras, rectify
from orb_slam3_ros_tpu.utils import synth

KB8 = np.asarray(
    [150.0, 150.0, 187.5, 119.5, 0.02, 0.001, -0.002, 0.0002], np.float32
)


def render_fisheye(scene, R_wc, t_wc, height, width, kb8=None):
    """Ray-cast through the KB8 model (unproject each pixel)."""
    kb8 = KB8 if kb8 is None else kb8
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    uv = jnp.stack([xg, yg], -1).reshape(-1, 2)
    rays = cameras.kb8_unproject(jnp.asarray(kb8), uv)
    dirs_w = rays @ jnp.asarray(R_wc).T
    origin = jnp.broadcast_to(jnp.asarray(t_wc), dirs_w.shape)
    ts, uvs = synth._ray_box_hits(origin, dirs_w, scene.half)
    face = jnp.argmin(ts, -1)
    uvf = jnp.take_along_axis(uvs, face[..., None, None], axis=-2)[..., 0, :]
    vals = jnp.stack(
        [synth._sample_tex(scene.textures[k], uvf) for k in range(6)], -1
    )
    img = jnp.take_along_axis(vals, face[..., None], axis=-1)[..., 0]
    return np.asarray(img.reshape(height, width))


class TestRectify:
    def test_rectified_matches_direct_pinhole_render(self):
        """Rectifying a KB8 render must reproduce a direct pinhole render
        of the same scene (up to interpolation)."""
        scene = synth.make_room(seed=2)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        H, W = 240, 376
        fish = render_fisheye(scene, R, t, H, W)
        pin = rectify.virtual_pinhole_params(KB8, H, W)
        smap = rectify.kb8_rect_map(jnp.asarray(KB8), jnp.asarray(pin), H, W)
        rectified = np.asarray(rectify.remap_bilinear(jnp.asarray(fish), smap))
        direct, _ = synth.render(scene, jnp.asarray(R), jnp.asarray(t),
                                 jnp.asarray(pin), height=H, width=W)
        direct = np.asarray(direct)
        # compare the central region (edges suffer interpolation)
        c = (slice(40, 200), slice(60, 316))
        err = np.abs(rectified[c] - direct[c])
        assert np.median(err) < 3.0, np.median(err)

    @pytest.mark.slow
    def test_fisheye_sequence_tracks_through_pinhole_pipeline(self):
        """KB8 input stream -> rectification -> standard mono pipeline."""
        from orb_slam3_ros_tpu.models.system import MonoSlam, OK
        from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse

        scene = synth.make_room(seed=2)
        H, W = 240, 376
        # Render the fisheye at 1.5x and rectify down: rectification
        # resamples the already-interpolated render, and the extra source
        # resolution keeps corners sharp (standard remap practice).
        up = 1.5
        Hs, Ws = int(H * up), int(W * up)
        KB8_HI = KB8.copy(); KB8_HI[:4] *= up
        R_wc, t_wc, ts = synth.orbit_trajectory(25, dt=0.1, seed=2)
        pin = rectify.virtual_pinhole_params(KB8, H, W)
        smap = rectify.kb8_rect_map(jnp.asarray(KB8_HI), jnp.asarray(pin), H, W)
        slam = MonoSlam(height=H, width=W, cam_params=pin, n_features=1200,
                        max_keyframes=32, max_points=4096)
        for i in range(25):
            fish = render_fisheye(scene, R_wc[i], t_wc[i], Hs, Ws, kb8=KB8_HI)
            rectified = np.asarray(
                rectify.remap_bilinear(jnp.asarray(fish), smap)
            )
            slam.process_frame(rectified, float(ts[i]))
        assert slam.state == OK
        traj = slam.get_trajectory()
        tss = np.asarray([t for t, _ in traj])
        est = np.stack([T[:3, 3] for _, T in traj])
        rmse, n, _ = ate_rmse(tss, est, ts.astype(np.float64), t_wc)
        assert n >= 12
        assert rmse < 0.15, f"fisheye-pipeline ATE {rmse:.3f}"
