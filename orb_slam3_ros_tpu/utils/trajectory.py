"""Trajectory export in the reference's formats.

Role of ``System::SaveTrajectoryTUM/EuRoC/KITTI`` (reference
orb_slam3/src/System.cc:553, :646, :1190): TUM = ``ts x y z qx qy qz qw``,
EuRoC differs only in timestamp units, KITTI = flattened 3x4 row-major.
"""

from __future__ import annotations

import numpy as np

from ..ops import lie
import jax.numpy as jnp


def _quat_xyzw(Rwc: np.ndarray) -> np.ndarray:
    q = np.asarray(lie.quat_from_rotmat(jnp.asarray(Rwc)))  # (w, x, y, z)
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def save_tum(path: str, trajectory):
    """trajectory: iterable of (ts, Twc [4,4])."""
    with open(path, "w") as f:
        for ts, T in trajectory:
            q = _quat_xyzw(T[:3, :3])
            t = T[:3, 3]
            f.write(
                f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def save_euroc(path: str, trajectory):
    """EuRoC format (System::SaveTrajectoryEuRoC, System.cc:646):
    nanosecond integer timestamps, then TUM-style pose + quat xyzw."""
    with open(path, "w") as f:
        for ts, T in trajectory:
            q = _quat_xyzw(T[:3, :3])
            t = T[:3, 3]
            f.write(
                f"{int(round(ts * 1e9))} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}\n"
            )


def save_kitti(path: str, trajectory):
    with open(path, "w") as f:
        for _, T in trajectory:
            row = T[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def load_tum(path: str):
    data = np.loadtxt(path)
    return data[:, 0], data[:, 1:4], data[:, 4:8]
