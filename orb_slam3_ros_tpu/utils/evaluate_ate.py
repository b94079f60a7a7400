"""Absolute trajectory error with Horn/Umeyama alignment (+ optional
scale for monocular).

Re-derivation of the reference's evaluation script
(``evaluation/evaluate_ate_scale.py:50-101``: Horn closed-form alignment
with the scale factor of Umeyama's method, ATE RMSE over aligned
translations). Implemented from the standard Umeyama (1991) closed form —
the acceptance metric for every sequence in SURVEY §6.
"""

from __future__ import annotations

import numpy as np


def align_umeyama(est: np.ndarray, gt: np.ndarray, with_scale: bool = True):
    """Least-squares similarity aligning est -> gt.

    Args:
      est, gt: [N, 3] corresponding positions.

    Returns (s, R, t) with gt ~ s * R @ est + t.
    """
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    xe = est - mu_e
    xg = gt - mu_g
    C = xg.T @ xe / len(est)
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_e = (xe**2).sum() / len(est)
        s = float(np.trace(np.diag(D) @ S) / max(var_e, 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(
    est_ts: np.ndarray,
    est_pos: np.ndarray,
    gt_ts: np.ndarray,
    gt_pos: np.ndarray,
    with_scale: bool = True,
    max_dt: float = 0.02,
):
    """Associate by timestamp (role of evaluation/associate.py), align,
    return (rmse, n_matched, scale)."""
    # nearest-neighbor association
    j = np.searchsorted(gt_ts, est_ts)
    j = np.clip(j, 1, len(gt_ts) - 1)
    left = np.abs(gt_ts[j - 1] - est_ts)
    right = np.abs(gt_ts[j] - est_ts)
    jj = np.where(left < right, j - 1, j)
    ok = np.abs(gt_ts[jj] - est_ts) <= max_dt
    if ok.sum() < 3:
        return np.inf, int(ok.sum()), 1.0
    e = est_pos[ok]
    g = gt_pos[jj][ok]
    s, R, t = align_umeyama(e, g, with_scale)
    aligned = (s * (R @ e.T)).T + t
    err = np.linalg.norm(aligned - g, axis=1)
    return float(np.sqrt((err**2).mean())), int(ok.sum()), s
