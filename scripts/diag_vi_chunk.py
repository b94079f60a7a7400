"""Diagnose VI chunk throughput: how many frames actually chunk, and
where the per-chunk wall time goes (dispatch vs drain vs fallback)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.utils import tpucache

tpucache.enable_on_tpu()

from orb_slam3_ros_tpu.models.inertial_system import InertialSlam
from orb_slam3_ros_tpu.ops import imu as imu_ops
from orb_slam3_ros_tpu.utils import synth


def main():
    H, W = 480, 752
    n_frames, warm = 165, 105
    freq = 100.0
    seq, imu = synth.make_vi_sequence(
        n_frames=n_frames, height=H, width=W, frame_dt=0.1, imu_per_frame=10,
        seed=0, bg=np.array([0.01, -0.015, 0.02]), noise_g=1e-4, noise_a=1e-3,
    )
    calib = imu_ops.ImuCalib(
        sigma_g=jnp.full((3,), 1.7e-4 * np.sqrt(freq), jnp.float32),
        sigma_a=jnp.full((3,), 2e-3 * np.sqrt(freq), jnp.float32),
        sigma_gw=jnp.full((3,), 1.9e-5 / np.sqrt(freq), jnp.float32),
        sigma_aw=jnp.full((3,), 3e-3 / np.sqrt(freq), jnp.float32),
        R_bc=jnp.eye(3), t_bc=jnp.zeros(3),
    )
    import os
    import sys
    kf_every = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ba_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cfg = dict(
        imu_cap_kf=int(os.environ.get("D_SKF", 256)),
        imu_cap_frame=int(os.environ.get("D_MF", 32)),
        ba_window=int(os.environ.get("D_BAW", 8)),
        ba_fixed=int(os.environ.get("D_BAF", 4)),
    )
    print("cfg:", cfg, "kf_every:", kf_every, "ba_iters:", ba_iters)
    slam = InertialSlam(
        height=H, width=W, cam_params=seq.cam_params, n_features=1000,
        max_keyframes=64, max_points=4096, kf_every=kf_every,
        calib=calib, init_after_kf=6, lean_after_kf=4, track_cap=768,
        fuse_every=3, stats_every=3, cull_every=3,
        local_ba_iters=ba_iters, **cfg,
    )
    events = []
    slam.on_frame = lambda ev: events.append(ev)
    counts = {"pf": 0}
    orig_pf = slam.process_frame

    def counted(*a, **k):
        counts["pf"] += 1
        return orig_pf(*a, **k)

    slam.process_frame = counted

    chunk = 15
    frames_dev = jnp.asarray(np.clip(np.stack(seq.images), 0, 255).astype(np.uint8))
    jax.block_until_ready(frames_dev)
    i = 0
    t_start = time.time()
    while i < warm - 2 * chunk and not slam._vi_chunkable():
        slam.process_frame(
            seq.images[i], float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
        i += 1
    print(f"ladder done at frame {i} ({time.time()-t_start:.1f}s), "
          f"n_kf={slam.n_kf} stage={slam.imu_stage} W={slam.W}")
    while i + chunk <= warm:
        t0 = time.time()
        slam.process_frames(
            (frames_dev, i), seq.timestamps[i : i + chunk],
            acc=imu["acc"][i : i + chunk], gyro=imu["gyro"][i : i + chunk],
            dts=imu["dts"][i : i + chunk],
        )
        print(f"warm chunk @{i}: {1e3*(time.time()-t0):.0f} ms "
              f"(pf={counts['pf']}, dev_state={'ok' if slam._vi_dev_state is not None else 'NONE'})")
        i += chunk
    pf0 = counts["pf"]
    t0 = time.time()
    while i + chunk <= n_frames:
        t1 = time.time()
        slam.process_frames(
            (frames_dev, i), seq.timestamps[i : i + chunk],
            acc=imu["acc"][i : i + chunk], gyro=imu["gyro"][i : i + chunk],
            dts=imu["dts"][i : i + chunk],
        )
        t2 = time.time()
        print(f"chunk @{i}: total {1e3*(t2-t1):.0f} ms "
              f"(pf_calls={counts['pf']-pf0}, n_kf={slam.n_kf}, "
              f"dev_state={'ok' if slam._vi_dev_state is not None else 'NONE'})")
        i += chunk
    slam.flush()
    dt = time.time() - t0
    print(f"steady: {(i-warm)/dt:.2f} fps, per-frame fallbacks in timed "
          f"region: {counts['pf']-pf0}")
    inl = [(round(e["ts"], 1), e["n_inliers"], e["state"])
           for e in events if e["event"] == "frame" and 9.0 <= e["ts"] <= 12.0]
    print("inliers t=9..12s:", inl)


if __name__ == "__main__":
    main()
