"""Benchmark: steady-state monocular tracking+local-BA throughput at the
EuRoC-native workload (752x480, 1000 features, 8 levels).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference runs EuRoC at camera rate (20 fps) on a desktop
CPU (config/Monocular/EuRoC.yaml Camera.fps: 20, Camera.width: 752,
Camera.height: 480, ORBextractor.nFeatures: 1000; BASELINE.md) —
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

    print(
        json.dumps(
            {
                "metric": "mono tracking+local-BA throughput (synthetic 752x480, 1000 feats, EuRoC-native workload)",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
