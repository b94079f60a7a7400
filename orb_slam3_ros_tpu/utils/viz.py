"""Headless visualization: map + trajectory renders to PNG.

Role of the reference's Pangolin viewer stack (``Viewer/FrameDrawer/
MapDrawer``, orb_slam3/src/Viewer.cc:162, MapDrawer.cc): live OpenGL is
replaced by on-demand matplotlib renders (this environment is headless);
the same content is drawn — map points, keyframe frusta, the frame
trajectory, and the tracking overlay (keypoints on the current image).
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def draw_map(slam, path: str, gt_positions=None):
    """Top-down (x-y) map render: points, keyframes, trajectory."""
    import jax

    m = slam.map
    ptv = np.asarray(jax.device_get(m.pt_valid))
    X = np.asarray(jax.device_get(m.pt_X))[ptv]
    kfv = np.asarray(jax.device_get(m.kf_valid))
    kf_R = np.asarray(jax.device_get(m.kf_R))[kfv]
    kf_t = np.asarray(jax.device_get(m.kf_t))[kfv]
    centers = -np.einsum("kij,ki->kj", kf_R, kf_t)  # camera centers (R^T t)

    fig, ax = plt.subplots(figsize=(8, 8))
    if len(X):
        ax.scatter(X[:, 0], X[:, 1], s=1, c="#888888", label="map points")
    if len(centers):
        ax.plot(centers[:, 0], centers[:, 1], "b.-", ms=4, label="keyframes")
    traj = slam.get_trajectory()
    if traj:
        p = np.stack([T[:3, 3] for _, T in traj])
        ax.plot(p[:, 0], p[:, 1], "g-", lw=0.8, label="trajectory")
    if gt_positions is not None:
        ax.plot(gt_positions[:, 0], gt_positions[:, 1], "r--", lw=0.8,
                label="ground truth")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title(f"map: {slam.n_kf} KFs, {slam.n_pts} points")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def draw_tracking(img, feats, feat_pt, path: str):
    """Tracking overlay (FrameDrawer role): green = tracked landmark,
    blue = unmatched feature."""
    import jax

    xy = np.asarray(jax.device_get(feats.xy))
    valid = np.asarray(jax.device_get(feats.valid))
    fp = np.asarray(jax.device_get(feat_pt)) if feat_pt is not None else None

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.imshow(np.asarray(img), cmap="gray", vmin=0, vmax=255)
    tracked = valid & (fp >= 0) if fp is not None else np.zeros_like(valid)
    other = valid & ~tracked
    ax.plot(xy[other, 0], xy[other, 1], "b.", ms=2)
    ax.plot(xy[tracked, 0], xy[tracked, 1], "g+", ms=5)
    ax.set_title(f"{int(tracked.sum())} tracked / {int(valid.sum())} features")
    ax.axis("off")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
