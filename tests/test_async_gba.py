"""Chunked, abortable global BA (the reference's background GBA thread +
mbStopGBA, LoopClosing.cc:3609-3780): chunks interleave with tracking, a
new keyframe aborts remaining chunks, and keyframes/points created during
the solve are folded in by relative-pose propagation."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.models import local_mapping, map_state as ms
from orb_slam3_ros_tpu.models.system import MonoSlam, OK
from orb_slam3_ros_tpu.ops import cameras

CAM = np.asarray([120.0, 120.0, 96.0, 64.0, 0, 0, 0, 0, 0], np.float32)


def _consistent_system(rng, K_use=6, P_use=48, perturb=0.02):
    """MonoSlam whose map holds K_use keyframes all observing the same
    P_use points, observations = exact projections; poses/points
    perturbed so GBA has real work to do."""
    slam = MonoSlam(height=128, width=192, cam_params=CAM, n_features=200,
                    max_keyframes=8, max_points=256, pipelined=False)
    m = slam.map
    X = np.stack([
        rng.uniform(-1.5, 1.5, P_use),
        rng.uniform(-1.0, 1.0, P_use),
        rng.uniform(4.0, 6.0, P_use),
    ], axis=1).astype(np.float32)
    kf_R = np.tile(np.eye(3, dtype=np.float32), (slam.K_cap, 1, 1))
    kf_t = np.zeros((slam.K_cap, 3), np.float32)
    kf_xy = np.zeros((slam.K_cap, slam.N, 2), np.float32)
    kf_obs = np.full((slam.K_cap, slam.N), -1, np.int32)
    fv = np.zeros((slam.K_cap, slam.N), bool)
    for k in range(K_use):
        kf_t[k] = [0.25 * k, 0.0, 0.0]
        Xc = X @ kf_R[k].T + kf_t[k]
        uv = np.asarray(cameras.pinhole_project_nodist(
            jnp.asarray(CAM), jnp.asarray(Xc)))
        kf_xy[k, :P_use] = uv
        kf_obs[k, :P_use] = np.arange(P_use)
        fv[k, :P_use] = True
    R_gt, t_gt = kf_R.copy(), kf_t.copy()
    # perturb everything but the two gauge keyframes
    for k in range(2, K_use):
        from orb_slam3_ros_tpu.ops import lie
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(size=3).astype(np.float32) * perturb)))
        kf_R[k] = dR @ kf_R[k]
        kf_t[k] = kf_t[k] + rng.normal(size=3).astype(np.float32) * perturb
    Xp = X + rng.normal(size=X.shape).astype(np.float32) * perturb
    pt_valid = np.zeros(slam.P_cap, bool)
    pt_valid[:P_use] = True
    slam.map = m._replace(
        kf_valid=jnp.asarray(np.arange(slam.K_cap) < K_use),
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_xy=jnp.asarray(kf_xy), kf_obs=jnp.asarray(kf_obs),
        kf_feat_valid=jnp.asarray(fv),
        pt_valid=jnp.asarray(pt_valid),
        pt_X=jnp.asarray(np.concatenate(
            [Xp, np.zeros((slam.P_cap - P_use, 3), np.float32)])),
    )
    slam.n_kf, slam.n_pts, slam.state = K_use, P_use, OK
    return slam, R_gt, t_gt, X


def _pose_err(slam, R_gt, t_gt, K_use):
    R = np.asarray(jax.device_get(slam.map.kf_R))[:K_use]
    t = np.asarray(jax.device_get(slam.map.kf_t))[:K_use]
    return float(np.linalg.norm(t - t_gt[:K_use]) +
                 np.linalg.norm(R - R_gt[:K_use]))


class TestAsyncGBA:
    def test_chunks_and_abort(self, rng):
        slam, R_gt, t_gt, X = _consistent_system(rng)
        err0 = _pose_err(slam, R_gt, t_gt, 6)
        slam._start_async_gba(8, chunk=2)
        assert slam._gba is not None and slam._gba["done"] == 2
        slam._poll_gba(force=True)  # chunk boundary -> next chunk
        assert slam._gba["done"] == 4
        slam.abort_gba()  # a "new keyframe arrived"
        slam._poll_gba(force=True)  # folds in the partial result
        assert slam._gba is None
        err1 = _pose_err(slam, R_gt, t_gt, 6)
        assert np.isfinite(err1)
        assert err1 < err0 * 0.7, (err0, err1)

    def test_full_run_applies(self, rng):
        slam, R_gt, t_gt, X = _consistent_system(rng)
        err0 = _pose_err(slam, R_gt, t_gt, 6)
        slam._start_async_gba(8, chunk=4)
        while slam._gba is not None:
            slam._poll_gba(force=True)
        err1 = _pose_err(slam, R_gt, t_gt, 6)
        assert err1 < err0 * 0.5, (err0, err1)

    def test_keyframe_during_gba_is_propagated(self, rng):
        """A keyframe inserted while GBA runs keeps its pose RELATIVE to
        the last optimized keyframe (LoopClosing.cc:3713 mnBAGlobalForKF
        propagation)."""
        slam, R_gt, t_gt, X = _consistent_system(rng, K_use=5)
        slam._start_async_gba(8, chunk=2)
        # "tracking" inserts keyframe 5 with a known relative pose to 4
        from orb_slam3_ros_tpu.ops import lie
        R4 = np.asarray(jax.device_get(slam.map.kf_R[4]))
        t4 = np.asarray(jax.device_get(slam.map.kf_t[4]))
        R_rel = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0])))
        t_rel = np.asarray([0.3, 0.0, 0.0], np.float32)
        R5 = R_rel @ R4
        t5 = R_rel @ t4 + t_rel
        slam.map = slam.map._replace(
            kf_valid=slam.map.kf_valid.at[5].set(True),
            kf_R=slam.map.kf_R.at[5].set(jnp.asarray(R5)),
            kf_t=slam.map.kf_t.at[5].set(jnp.asarray(t5)),
        )
        slam.n_kf = 6
        slam.abort_gba()
        while slam._gba is not None:
            slam._poll_gba(force=True)
        R4n = np.asarray(jax.device_get(slam.map.kf_R[4]))
        t4n = np.asarray(jax.device_get(slam.map.kf_t[4]))
        R5n = np.asarray(jax.device_get(slam.map.kf_R[5]))
        t5n = np.asarray(jax.device_get(slam.map.kf_t[5]))
        np.testing.assert_allclose(R5n, R_rel @ R4n, atol=1e-5)
        np.testing.assert_allclose(t5n, R_rel @ t4n + t_rel, atol=1e-5)
