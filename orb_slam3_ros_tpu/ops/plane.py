"""Dominant-plane detection on map points — batched RANSAC.

Role of the reference AR demo's ``ViewerAR::DetectPlane``
(src/AR/ViewerAR.cc: 3-point plane hypotheses over the currently tracked
map points, inliers by point-plane distance, refit on inliers). The
reference iterates 50 sequential RANSAC rounds; here all hypotheses are
evaluated batched and the winner is refit by an SVD plane fit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PlaneResult(NamedTuple):
    ok: jnp.ndarray  # [] bool
    normal: jnp.ndarray  # [3] unit normal (world)
    d: jnp.ndarray  # [] plane offset: n . X + d = 0
    inlier: jnp.ndarray  # [N]
    n_inliers: jnp.ndarray
    anchor: jnp.ndarray  # [3] inlier centroid (cube anchor point)


@partial(jax.jit, static_argnames=("n_hyp",))
def detect_plane(
    X: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 128,
    rel_th: float = 0.03,
    min_inlier_frac: float = 0.15,
) -> PlaneResult:
    """Fit the dominant plane to [N,3] world points.

    ``rel_th``: inlier distance threshold as a fraction of the point
    cloud's median absolute deviation scale (adapts to map scale, mono
    maps have arbitrary units). The winning hypothesis is refit twice
    (SVD on inliers, re-gate, refit) — the second round recovers points
    the minimal 3-point hypothesis missed, which matters on noisy
    triangulated maps where per-point error is a few percent of scene
    scale.
    """
    N = X.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[None, :], shape=(n_hyp, 3))
    p = X[idx]  # [S,3,3]
    n = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    d = -jnp.einsum("si,si->s", n, p[:, 0])  # [S]

    med = jnp.nanmedian(jnp.where(valid[:, None], X, jnp.nan), axis=0)
    scale = jnp.nanmedian(
        jnp.where(valid, jnp.linalg.norm(X - med, axis=-1), jnp.nan)
    )
    th = rel_th * jnp.maximum(scale, 1e-9)

    dist = jnp.abs(jnp.einsum("si,ni->sn", n, X) + d[:, None])  # [S,N]
    inl = (dist < th) & valid
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    def refit(w):
        # Plane through the weighted centroid, normal = smallest
        # singular vector of the centered inliers.
        wsum = jnp.maximum(jnp.sum(w), 1e-9)
        c = jnp.sum(X * w[:, None], axis=0) / wsum
        Xc = (X - c) * w[:, None]
        _, _, Vt = jnp.linalg.svd(Xc, full_matrices=False)
        n_f = Vt[-1] / jnp.maximum(jnp.linalg.norm(Vt[-1]), 1e-12)
        d_f = -n_f @ c
        inlier = (jnp.abs(X @ n_f + d_f) < th) & valid
        return n_f, d_f, c, inlier

    n_f, d_f, c, inlier = refit(inl[best].astype(X.dtype))
    n_f, d_f, c, inlier = refit(inlier.astype(X.dtype))
    n_inl = jnp.sum(inlier.astype(jnp.int32))
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    ok = n_inl.astype(jnp.float32) >= min_inlier_frac * n_valid.astype(
        jnp.float32
    )
    return PlaneResult(
        ok=ok, normal=n_f, d=d_f, inlier=inlier, n_inliers=n_inl, anchor=c
    )
