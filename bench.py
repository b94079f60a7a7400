"""Benchmark: steady-state MONO-INERTIAL tracking + VI-BA throughput at
the EuRoC-native workload (752x480, 1000 features, 8 levels, 100 Hz
IMU) through the device-resident VI chunk loop — the BASELINE.json
flagship metric ("frames/s, EuRoC MH_01 mono-inertial"). The plain-mono
and other pipeline variants are measured by scripts/bench_variants.py.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference runs EuRoC at camera rate (20 fps) on a desktop
CPU (config/Monocular-Inertial/EuRoC.yaml Camera.fps: 20, Camera.width:
752, Camera.height: 480, ORBextractor.nFeatures: 1000; BASELINE.md) —
vs_baseline = our frames/s / 20.

Measures frames after the pipeline is warm (all XLA programs compiled,
map initialized); per-frame work includes ORB extraction, project+match
tracking, pose optimization, and amortized keyframe insertion
(triangulation + local BA + fusion + culling), mirroring the reference's
per-frame hot path (SURVEY §3.1).

Dataset ingest: the steady-state window is preloaded to device HBM in
one bulk transfer before the timed region (32 MB uint8), the replay
equivalent of the reference reading RAM-cached dataset images — the
TPU-tunnel link in this environment moves ~10 MB/s, which would
otherwise measure the tunnel, not the pipeline. On directly-attached
TPU hosts, PCIe moves camera-rate uint8 video with ~zero overhead.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam3_ros_tpu.models.system import MonoSlam, OK
    from orb_slam3_ros_tpu.utils import synth, tpucache
    from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse

    tpucache.enable_on_tpu()  # warm-cache reruns: minutes -> seconds

    H, W = 480, 752
    n_frames = 120
    warm = 45
    chunk = 15
    print(f"bench: rendering {n_frames} frames at {W}x{H}...",
          file=sys.stderr, flush=True)
    seq = synth.make_sequence(n_frames=n_frames, height=H, width=W, dt=0.1, seed=3)
    # Real-time configuration, matched to the reference's EuRoC settings
    # (ORBextractor.nFeatures: 1000, config/Monocular/EuRoC.yaml) with
    # the TPU-tuned runtime knobs: device-resident chunked loop, local-
    # map tracking cap, uint8 frames (EuRoC images are 8-bit),
    # LocalMapping maintenance cadence.
    slam = MonoSlam(
        height=H, width=W, cam_params=seq.cam_params, n_features=1000,
        max_keyframes=64, max_points=4096,
        kf_every=8, fuse_every=3, stats_every=3, cull_every=3,
        lean_after_kf=4, track_cap=768, transfer_uint8=True,
        track_schedule=None,
    )
    slam._sched_lean = ((40.0, 2, 4), (4.0, 2, 4))
    t_warm_start = time.time()
    # One bulk upload of the whole sequence (excluded from the timed
    # region, like dataset prefetch).
    frames_dev = jnp.asarray(
        np.clip(np.stack(seq.images), 0, 255).astype(np.uint8)
    )
    jax.block_until_ready(frames_dev)
    # Warm the per-frame path until the map is up, then the chunked
    # device-resident loop (compiles the scan program at the SAME chunk
    # length the steady phase uses).
    i = 0
    # Per-frame until the map is mature enough for the chunked fast path
    # (n_kf >= lean_after_kf) — otherwise the warm "chunks" fall back to
    # the per-frame path and the chunk program compiles inside the timed
    # region.
    while (slam.state != OK or not slam._chunkable()) and i < warm - chunk:
        slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        i += 1
    while i + chunk <= warm:
        slam.process_frames(
            (frames_dev, i), seq.timestamps[i : i + chunk],
        )
        i += chunk
    while i < warm:  # chunk-misaligned remainder: per-frame (compiled)
        slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        i += 1
    slam.flush()
    print(
        f"bench: warmup done in {time.time()-t_warm_start:.1f}s "
        f"(state_ok={slam.state == OK}, kf={slam.n_kf})",
        file=sys.stderr, flush=True,
    )
    t0 = time.time()
    i = warm
    while i + chunk <= n_frames:
        slam.process_frames(
            (frames_dev, i), seq.timestamps[i : i + chunk],
        )
        i += chunk
    slam.flush()
    dt = time.time() - t0
    fps = (i - warm) / dt

    ts = np.asarray([t for t, _ in slam.trajectory])
    est = np.stack([T[:3, 3] for _, T in slam.trajectory])
    rmse, _, _ = ate_rmse(ts, est, seq.timestamps.astype(np.float64), seq.t_wc)
    print(
        f"bench: ate_rmse={rmse:.4f} m, tracked={len(ts)}/{n_frames}",
        file=sys.stderr, flush=True,
    )
    return fps, rmse


def main_vi():
    """MONO-INERTIAL headline (the BASELINE.json flagship metric:
    'frames/s, EuRoC MH_01 mono-inertial'): the device-resident VI
    chunk loop at the EuRoC-native workload, timed after all three
    IMU-init ladder stages and the chunk program are warm. Metric ATE
    (no scale alignment — the inertial map is metric)."""
    import jax
    import jax.numpy as jnp

    from orb_slam3_ros_tpu.models.inertial_system import InertialSlam
    from orb_slam3_ros_tpu.ops import imu as imu_ops
    from orb_slam3_ros_tpu.utils import synth, tpucache
    from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse

    tpucache.enable_on_tpu()
    H, W = 480, 752
    n_frames, warm, chunk = 165, 105, 15
    freq = 100.0
    print(f"bench[vi]: rendering {n_frames} frames at {W}x{H}...",
          file=sys.stderr, flush=True)
    seq, imu = synth.make_vi_sequence(
        n_frames=n_frames, height=H, width=W, frame_dt=0.1,
        imu_per_frame=10, seed=0, bg=np.array([0.01, -0.015, 0.02]),
        noise_g=1e-4, noise_a=1e-3,
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
        max_keyframes=64, max_points=4096, kf_every=5,
        calib=calib, init_after_kf=6, lean_after_kf=4, track_cap=768,
        fuse_every=3, stats_every=3, cull_every=3, local_ba_iters=4,
        imu_cap_kf=64, imu_cap_frame=16,
    )
    frames_dev = jnp.asarray(
        np.clip(np.stack(seq.images), 0, 255).astype(np.uint8)
    )
    jax.block_until_ready(frames_dev)
    t_warm = time.time()
    i = 0
    while i < warm - 2 * chunk and not slam._vi_chunkable():
        slam.process_frame(
            seq.images[i], float(seq.timestamps[i]),
            acc=imu["acc"][i], gyro=imu["gyro"][i], dts=imu["dts"][i],
        )
        i += 1
    while i + chunk <= warm:
        slam.process_frames(
            (frames_dev, i), seq.timestamps[i : i + chunk],
            acc=imu["acc"][i : i + chunk], gyro=imu["gyro"][i : i + chunk],
            dts=imu["dts"][i : i + chunk],
        )
        i += chunk
    print(f"bench[vi]: warmup done in {time.time()-t_warm:.1f}s "
          f"(imu_stage={slam.imu_stage}, kf={slam.n_kf})",
          file=sys.stderr, flush=True)
    start = i
    t0 = time.time()
    while i + chunk <= n_frames:
        slam.process_frames(
            (frames_dev, i), seq.timestamps[i : i + chunk],
            acc=imu["acc"][i : i + chunk], gyro=imu["gyro"][i : i + chunk],
            dts=imu["dts"][i : i + chunk],
        )
        i += chunk
    slam.flush()
    fps = (i - start) / (time.time() - t0)
    traj = slam.get_trajectory()
    ts = np.asarray([t for t, _ in traj])
    est = np.stack([T[:3, 3] for _, T in traj])
    rmse_m, n_m, _ = ate_rmse(
        ts[12:], est[12:], seq.timestamps.astype(np.float64), seq.t_wc,
        with_scale=False,
    )
    print(f"bench[vi]: metric ate_rmse={rmse_m:.4f} m over {n_m} frames, "
          f"imu_initialized={slam.imu_initialized}",
          file=sys.stderr, flush=True)
    return fps, rmse_m


if __name__ == "__main__":
    # The flagship metric is MONO-INERTIAL (BASELINE.json: 'frames/s,
    # EuRoC MH_01 mono-inertial >= 3x reference on one v5p host'); the
    # plain-mono number and other variants live in
    # scripts/bench_variants.py + BASELINE.md.
    fps_vi, rmse_vi = main_vi()
    print(
        json.dumps(
            {
                "metric": "mono-inertial tracking+VI-BA throughput "
                          "(synthetic 752x480, 1000 feats, 100 Hz IMU, "
                          "EuRoC-native workload)",
                "value": round(fps_vi, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps_vi / 20.0, 3),
                "metric_ate_m": round(float(rmse_vi), 4),
            }
        )
    )
