"""Two-camera (Tlr) fisheye frames: cross-camera triangulation +
body-frame observation factors (VERDICT r2 #5; reference Frame.h:346
fisheye ctor, Frame.cc:1126 ComputeStereoFishEyeMatches,
OptimizableTypes.h:118 EdgeSE3ProjectXYZToBody)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.ops import cameras, lie, orb, twocam
from orb_slam3_ros_tpu.utils import synth

KB8 = np.asarray(
    [150.0, 150.0, 187.5, 119.5, 0.02, 0.001, -0.002, 0.0002], np.float32
)
BASELINE = 0.11  # left->right along +x (TUM-VI-like)


def _render_pair(scene, R_wc, t_wc, H, W):
    """Left + right fisheye renders; right camera displaced by the
    baseline along the left camera's x-axis (identity R_rl)."""
    img_l, _ = synth.render(
        scene, jnp.asarray(R_wc), jnp.asarray(t_wc), jnp.asarray(KB8),
        height=H, width=W, cam_model="kb8",
    )
    t_r = t_wc + R_wc @ np.asarray([BASELINE, 0, 0], np.float32)
    img_r, _ = synth.render(
        scene, jnp.asarray(R_wc), jnp.asarray(t_r), jnp.asarray(KB8),
        height=H, width=W, cam_model="kb8",
    )
    return np.asarray(img_l), np.asarray(img_r)


@pytest.fixture(scope="module")
def pair_feats():
    scene = synth.make_room(seed=2)
    H, W = 240, 376
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    img_l, img_r = _render_pair(scene, R, t, H, W)
    cfg = orb.default_config(H, W, n_features=800)
    ext = jax.jit(lambda im: orb.extract(im, cfg))
    f_l = ext(jnp.asarray(img_l, jnp.float32))
    f_r = ext(jnp.asarray(img_r, jnp.float32))
    return f_l, f_r


class TestTwoCamFisheye:
    def test_cross_camera_triangulation_metric(self, pair_feats):
        """Triangulated cross-camera points must be metric (the baseline
        pins scale): ray-cast ground truth depth agrees within a few %."""
        f_l, f_r = pair_feats
        R_rl = jnp.eye(3, dtype=jnp.float32)
        t_rl = jnp.asarray([-BASELINE, 0.0, 0.0], jnp.float32)  # X_r = X_l - b
        tri = twocam.triangulate_cross_camera(
            f_l, f_r, R_rl, t_rl, jnp.asarray(KB8), jnp.asarray(KB8),
        )
        ok = np.asarray(tri.ok)
        assert int(tri.n_new) >= 80, int(tri.n_new)
        X = np.asarray(tri.X_l)[ok]
        # GT depth via ray-cast: the room's +x wall sits at the scene
        # half-extent; instead compare against the rendered depth map.
        scene = synth.make_room(seed=2)
        _, depth = synth.render(
            scene, jnp.eye(3), jnp.zeros(3), jnp.asarray(KB8),
            height=240, width=376, cam_model="kb8",
        )
        depth = np.asarray(depth)
        uv = np.asarray(cameras.kb8_project(jnp.asarray(KB8), jnp.asarray(X)))
        xi = np.clip(uv[:, 0].round().astype(int), 0, 375)
        yi = np.clip(uv[:, 1].round().astype(int), 0, 239)
        # kb8 depth map stores ray PARAMETER t (distance along unit-z-
        # normalized dir); convert point to the same parameterization.
        rays = np.asarray(
            cameras.kb8_unproject(jnp.asarray(KB8), jnp.asarray(uv))
        )
        t_est = X[:, 2] / rays[:, 2] if rays.shape[0] else X[:, 2]
        t_gt = depth[yi, xi]
        rel = np.abs(t_est - t_gt) / np.maximum(t_gt, 1e-6)
        # Stereo depth error model: dz/z = (z / (f b)) sigma_px — at
        # z~3 m, f=150 px, b=0.11 m that is ~18% per pixel of feature
        # noise; a sub-pixel detector gives ~8% median on this scene.
        assert np.median(rel) < 0.12, np.median(rel)
        near = t_gt < 2.5
        if near.sum() >= 10:
            assert np.median(rel[near]) < 0.08, np.median(rel[near])

    def test_body_frame_pose_optimization(self, pair_feats):
        """pose_optimization_two_cam recovers a perturbed left-camera
        pose from MIXED left/right observations; right-only edges alone
        constrain it through Tlr (EdgeToBody role)."""
        f_l, f_r = pair_feats
        R_rl = jnp.eye(3, dtype=jnp.float32)
        t_rl = jnp.asarray([-BASELINE, 0.0, 0.0], jnp.float32)
        tri = twocam.triangulate_cross_camera(
            f_l, f_r, R_rl, t_rl, jnp.asarray(KB8), jnp.asarray(KB8),
        )
        ok = np.asarray(tri.ok)
        X_l = np.asarray(tri.X_l)  # world := left camera frame at GT
        N = X_l.shape[0]
        # Mixed edge table: left observations (uv from f_l) + right
        # observations (uv from f_r at the matched index).
        ridx = np.asarray(tri.right_feat)
        uv_l = np.asarray(f_l.xy)
        uv_r = np.asarray(f_r.xy)[ridx]
        Xw = np.concatenate([X_l, X_l])
        uv = np.concatenate([uv_l, uv_r])
        is_right = np.concatenate([np.zeros(N, bool), np.ones(N, bool)])
        valid = np.concatenate([ok, ok])
        inv_s2 = np.ones(2 * N, np.float32)
        # Perturb the pose and recover.
        dR = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.015, 0.01])))
        R0 = jnp.asarray(dR.astype(np.float32))
        t0 = jnp.asarray([0.04, -0.03, 0.05], jnp.float32)
        res = twocam.pose_optimization_two_cam(
            R0, t0, jnp.asarray(Xw.astype(np.float32)),
            jnp.asarray(uv.astype(np.float32)), jnp.asarray(is_right),
            R_rl, t_rl, jnp.asarray(inv_s2), jnp.asarray(valid),
            jnp.asarray(KB8),
        )
        R_f = np.asarray(res.R)
        t_f = np.asarray(res.t)
        assert np.linalg.norm(t_f) < 5e-3, t_f
        assert np.linalg.norm(R_f - np.eye(3)) < 5e-3
        assert int(res.n_inliers) >= int(ok.sum())

        # Right-only edges: the body factor alone must still pin the pose.
        res_r = twocam.pose_optimization_two_cam(
            R0, t0, jnp.asarray(X_l.astype(np.float32)),
            jnp.asarray(uv_r.astype(np.float32)),
            jnp.ones((N,), bool), R_rl, t_rl,
            jnp.ones((N,), jnp.float32), jnp.asarray(ok),
            jnp.asarray(KB8),
        )
        assert np.linalg.norm(np.asarray(res_r.t)) < 1e-2
