"""Time the VI chunk's component programs in isolation on the real TPU
(warm compile cache): per-frame step pieces (extract/track/refine/
preintegrate) and the keyframe body pieces (build_vi_ba /
vi_bundle_adjust / fuse / stats / culls) at the bench workload shapes.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.utils import tpucache

tpucache.enable_on_tpu()

from orb_slam3_ros_tpu.models.inertial_system import InertialSlam, _vi_refine
from orb_slam3_ros_tpu.models import local_mapping, map_updates, tracking
from orb_slam3_ros_tpu.ops import imu as imu_ops
from orb_slam3_ros_tpu.ops import orb, viba
from orb_slam3_ros_tpu.utils import synth


def timeit(name, fn, n=10):
    fn()  # compile / warm
    fn()
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:38s} {(time.time()-t0)/n*1e3:8.2f} ms")


def main():
    H, W = 480, 752
    freq = 100.0
    seq, imu = synth.make_vi_sequence(
        n_frames=80, height=H, width=W, frame_dt=0.1, imu_per_frame=10,
        seed=0, bg=np.array([0.01, -0.015, 0.02]), noise_g=1e-4, noise_a=1e-3,
    )
    calib = imu_ops.ImuCalib(
        sigma_g=jnp.full((3,), 1.7e-4 * np.sqrt(freq), jnp.float32),
        sigma_a=jnp.full((3,), 2e-3 * np.sqrt(freq), jnp.float32),
        sigma_gw=jnp.full((3,), 1.9e-5 / np.sqrt(freq), jnp.float32),
        sigma_aw=jnp.full((3,), 3e-3 / np.sqrt(freq), jnp.float32),
        R_bc=jnp.eye(3), t_bc=jnp.zeros(3),
    )
    slam = InertialSlam(
        height=H, width=W, cam_params=seq.cam_params, n_features=1000,
        max_keyframes=64, max_points=4096, kf_every=4,
        calib=calib, init_after_kf=6, lean_after_kf=4, track_cap=768,
        fuse_every=3, stats_every=3, cull_every=3,
    )
    t0 = time.time()
    i = 0
    while i < 78 and not slam._vi_chunkable():
        slam.process_frame(
            seq.images[i], float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
        i += 1
    print(f"ladder done at frame {i} in {time.time()-t0:.1f}s "
          f"(n_kf={slam.n_kf})")
    m = slam.map
    jax.block_until_ready(m.kf_R)
    cam = slam.cam_params
    cfg = slam.config
    img = jnp.asarray(seq.images[i], jnp.float32)

    ex = jax.jit(lambda im: orb.extract(im, cfg))
    feats = ex(img)
    timeit("extract 752x480", lambda: ex(img))

    sched = slam._current_schedule()
    trk = jax.jit(lambda m, f: tracking.track_against_map(
        m, f, jnp.eye(3), jnp.zeros(3), cam, W, H,
        schedule=sched, track_cap=768))
    res = trk(m, feats)
    timeit("track_against_map", lambda: trk(m, feats))

    M = slam.imu_cap_frame
    a = jnp.zeros((M, 3)); g = jnp.zeros((M, 3)); d = jnp.full((M,), 0.01)
    pre_fn = jax.jit(lambda a, g, d: imu_ops.preintegrate(
        a, g, d, jnp.zeros(6), calib))
    pre = pre_fn(a, g, d)
    timeit(f"preintegrate M={M}", lambda: pre_fn(a, g, d))

    S = slam.imu_cap_kf
    aS = jnp.zeros((S, 3)); gS = jnp.zeros((S, 3)); dS = jnp.full((S,), 0.01)
    preS_fn = jax.jit(lambda a, g, d: imu_ops.preintegrate(
        a, g, d, jnp.zeros(6), calib))
    preS_fn(aS, gS, dS)
    timeit(f"preintegrate S={S}", lambda: preS_fn(aS, gS, dS))
    W11 = jax.jit(lambda a, g, d: jax.vmap(
        lambda aa, gg, dd: imu_ops.preintegrate(aa, gg, dd, jnp.zeros(6), calib)
    )(a, g, d))
    aW = jnp.zeros((11, S, 3)); gW = jnp.zeros((11, S, 3)); dW = jnp.full((11, S), 0.004)
    W11(aW, gW, dW)
    timeit(f"preintegrate x11 edges S={S}", lambda: W11(aW, gW, dW))

    refine = jax.jit(lambda m, f, fp: _vi_refine(
        m, f, fp, jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
        jnp.zeros(3), jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
        jnp.zeros(3), pre, jnp.zeros((15, 15)), cam,
        calib.R_bc, calib.t_bc))
    refine(m, feats, res.feat_pt)
    timeit("vi_refine (pose_inertial_opt)", lambda: refine(m, feats, res.feat_pt))

    Wn = slam.W
    ids = jnp.arange(slam.n_kf - Wn, slam.n_kf, dtype=jnp.int32)
    fixed = ids == ids[0]
    edge_ok = jnp.ones((Wn - 1,), bool)
    big = jnp.zeros((Wn - 1, S, 7)).at[..., 6].set(0.004)

    build = jax.jit(lambda m: local_mapping.build_vi_ba(
        m, ids, fixed, big[..., 0:3], big[..., 3:6], big[..., 6],
        edge_ok, calib, cam, bf=jnp.asarray(0.0)))
    prob = build(m)
    timeit(f"build_vi_ba W={Wn}", lambda: build(m))

    for it in (4, 6):
        solve = jax.jit(lambda p: viba.vi_bundle_adjust(
            p, n_iters=it, row_n=m.N))
        solve(prob)
        timeit(f"vi_bundle_adjust iters={it}", lambda: solve(prob))

    fuse = jax.jit(lambda m: map_updates.fuse_in_neighbors(
        m, jnp.asarray(slam.n_kf - 1), cam, W, H, n_neighbors=1)[0])
    fuse(m)
    timeit("fuse_in_neighbors", lambda: fuse(m))

    stats = jax.jit(lambda m: map_updates.refresh_point_stats(
        m, n_levels=cfg.n_levels))
    stats(m)
    timeit("refresh_point_stats", lambda: stats(m))

    cullp = jax.jit(lambda m: map_updates.cull_points(
        m, jnp.asarray(slam.n_kf)))
    cullp(m)
    timeit("cull_points", lambda: cullp(m))

    cullk = jax.jit(lambda m: map_updates.cull_keyframes(
        m, jnp.asarray(slam.n_kf), n_levels=cfg.n_levels)[0])
    cullk(m)
    timeit("cull_keyframes", lambda: cullk(m))

    tri = jax.jit(lambda m: tracking.triangulate_with_ref(
        m, jnp.asarray(slam.n_kf - 1), jnp.asarray(slam.n_kf - 2), cam))
    tri(m)
    timeit("triangulate_with_ref", lambda: tri(m))


if __name__ == "__main__":
    main()
