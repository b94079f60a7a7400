"""Two-view reconstruction for monocular initialization: batched RANSAC
of fundamental/homography models + motion recovery.

Role of the reference's ``TwoViewReconstruction``
(orb_slam3/src/TwoViewReconstruction.cc: parallel H/F RANSAC :48-160,
``CheckFundamental``/``CheckHomography`` symmetric-transfer scoring,
``ReconstructF`` E-decomposition + ``CheckRT`` cheirality :400-900).

TPU-first: the reference's 200 sequential RANSAC iterations with early
exits become ``n_hyp`` *parallel* hypotheses — model fit (SVD nullspace)
and scoring are batched over [S] hypotheses x [N] matches; argmax picks
the winner. Fixed shapes, no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie, triangulate

TH_F = 3.841  # chi2 1-DoF 95% (TwoViewReconstruction.cc CheckFundamental)
TH_H = 5.991  # chi2 2-DoF 95%
TH_SCORE = 5.991


def _normalize_pts(p):
    """Hartley normalization over the sample axis. p [..., M, 2] ->
    (pn, T) with T [..., 3, 3] mapping original -> normalized."""
    mean = jnp.mean(p, axis=-2, keepdims=True)
    d = jnp.mean(jnp.abs(p - mean), axis=-2, keepdims=True)
    s = 1.0 / jnp.maximum(d, 1e-8)
    pn = (p - mean) * s
    sx, sy = s[..., 0, 0], s[..., 0, 1]
    mx, my = mean[..., 0, 0], mean[..., 0, 1]
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    T = jnp.stack(
        [
            jnp.stack([sx, z, -mx * sx], -1),
            jnp.stack([z, sy, -my * sy], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )
    return pn, T


def fit_fundamental(p1, p2):
    """Normalized 8-point algorithm, batched. p1/p2 [..., 8, 2] -> F [..., 3, 3]."""
    p1n, T1 = _normalize_pts(p1)
    p2n, T2 = _normalize_pts(p2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # [..., 8, 9]
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[..., :, 0].reshape(p1.shape[:-2] + (3, 3))
    # Rank-2 enforcement.
    u, s, vt = jnp.linalg.svd(f)
    s = s.at[..., 2].set(0.0)
    f2 = u @ (s[..., :, None] * vt)
    F = jnp.swapaxes(T2, -1, -2) @ f2 @ T1
    return F / jnp.maximum(jnp.abs(F[..., 2:3, 2:3]), 1e-12)


def fit_fundamental_masked(p1, p2, w):
    """Least-squares 8-point fit over *all* N correspondences weighted by
    mask ``w`` [N] (the gold-standard refit on the RANSAC winner's
    inliers; zero-weight rows drop out of A^T A)."""
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean1 = jnp.sum(p1 * w[:, None], 0) / wsum
    mean2 = jnp.sum(p2 * w[:, None], 0) / wsum
    d1 = jnp.sum(jnp.abs(p1 - mean1) * w[:, None], 0) / wsum
    d2 = jnp.sum(jnp.abs(p2 - mean2) * w[:, None], 0) / wsum
    s1 = 1.0 / jnp.maximum(d1, 1e-8)
    s2 = 1.0 / jnp.maximum(d2, 1e-8)
    p1n = (p1 - mean1) * s1
    p2n = (p2 - mean2) * s2

    def T_of(s, m):
        return jnp.array(
            [[s[0], 0.0, -m[0] * s[0]], [0.0, s[1], -m[1] * s[1]], [0.0, 0.0, 1.0]],
            p1.dtype,
        )

    T1, T2 = T_of(s1, mean1), T_of(s2, mean2)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    ) * w[:, None]
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[:, 0].reshape(3, 3)
    u, s, vt = jnp.linalg.svd(f)
    f2 = u @ (s.at[2].set(0.0)[:, None] * vt)
    F = T2.T @ f2 @ T1
    return F / jnp.maximum(jnp.abs(F[2, 2]), 1e-12)


def fit_homography(p1, p2):
    """Normalized DLT homography from 4+ correspondences, batched."""
    p1n, T1 = _normalize_pts(p1)
    p2n, T2 = _normalize_pts(p2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    rowA = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    rowB = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], axis=-1)
    A = jnp.concatenate([rowA, rowB], axis=-2)  # [..., 2M, 9]
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0].reshape(p1.shape[:-2] + (3, 3))
    H = jnp.linalg.inv(T2) @ h @ T1
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1e-12, H[..., 2:3, 2:3])


def _epipolar_chi2(F, p1, p2, inv_sigma2=1.0):
    """(chi1, chi2): squared point-to-epipolar-line distances both ways."""

    def point_line(Fm, a, b):
        # lines in image b from points a: l = F a
        pa = jnp.concatenate([a, jnp.ones_like(a[..., :1])], -1)
        l = jnp.einsum("...ij,...nj->...ni", Fm, pa)
        num = jnp.einsum("...ni,...ni->...n", l[..., :2], b) + l[..., 2]
        den = jnp.sum(l[..., :2] ** 2, axis=-1)
        return num * num / jnp.maximum(den, 1e-12)

    chi1 = point_line(F, p1, p2) * inv_sigma2  # p1 -> line in 2
    chi2 = point_line(jnp.swapaxes(F, -1, -2), p2, p1) * inv_sigma2
    return chi1, chi2


def score_fundamental(F, p1, p2, match_valid, inv_sigma2=1.0):
    """Symmetric epipolar-transfer score (CheckFundamental semantics).

    Returns (score [...], inlier [..., N])."""
    chi1, chi2 = _epipolar_chi2(F, p1, p2, inv_sigma2)
    ok = (chi1 < TH_F) & (chi2 < TH_F) & match_valid
    sc = jnp.where(chi1 < TH_F, TH_SCORE - chi1, 0.0) + jnp.where(
        chi2 < TH_F, TH_SCORE - chi2, 0.0
    )
    return jnp.sum(jnp.where(match_valid, sc, 0.0), axis=-1), ok


def score_homography(H, p1, p2, match_valid, inv_sigma2=1.0):
    """Symmetric transfer score for H (CheckHomography semantics)."""
    Hinv = jnp.linalg.inv(H)

    def transfer(Hm, a, b):
        pa = jnp.concatenate([a, jnp.ones_like(a[..., :1])], -1)
        q = jnp.einsum("...ij,...nj->...ni", Hm, pa)
        q = q[..., :2] / jnp.where(
            jnp.abs(q[..., 2:3]) < 1e-12, 1e-12, q[..., 2:3]
        )
        return jnp.sum((q - b) ** 2, axis=-1)

    chi1 = transfer(H, p1, p2) * inv_sigma2
    chi2 = transfer(Hinv, p2, p1) * inv_sigma2
    ok = (chi1 < TH_H) & (chi2 < TH_H) & match_valid
    sc = jnp.where(chi1 < TH_H, TH_H - chi1, 0.0) + jnp.where(
        chi2 < TH_H, TH_H - chi2, 0.0
    )
    return jnp.sum(jnp.where(match_valid, sc, 0.0), axis=-1), ok


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray  # [] bool
    used_H: jnp.ndarray  # [] bool — which model won
    R21: jnp.ndarray  # [3,3] pose of cam1 in cam2
    t21: jnp.ndarray  # [3] (unit norm — monocular scale is free)
    X1: jnp.ndarray  # [N,3] triangulated points in cam1 frame
    good: jnp.ndarray  # [N] bool triangulation accepted
    n_good: jnp.ndarray
    score_F: jnp.ndarray
    score_H: jnp.ndarray


def _check_rt(R21, t21, rays1, rays2, inlier, cam_params, p1, p2, sigma2=1.0):
    """Cheirality + reprojection test of one (R, t) candidate over all
    inlier matches (CheckRT, TwoViewReconstruction.cc:600-720).

    Returns (n_good, good_mask, X1, median_parallax_cos)."""
    X1 = triangulate.triangulate_dlt(rays1, rays2, R21, t21)
    X2 = X1 @ R21.T + t21
    finite = jnp.all(jnp.isfinite(X1), axis=-1)
    z_ok = (X1[..., 2] > 0) & (X2[..., 2] > 0)
    # Parallax between rays from the two camera centers.
    C2_in_1 = -R21.T @ t21
    cospar = triangulate.parallax_cos(X1, C2_in_1)
    par_ok = cospar < 0.99998
    from . import cameras as cam_mod

    e1 = jnp.sum((cam_mod.pinhole_project_nodist(cam_params, X1) - p1) ** 2, -1)
    e2 = jnp.sum((cam_mod.pinhole_project_nodist(cam_params, X2) - p2) ** 2, -1)
    reproj_ok = (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2)
    good = inlier & finite & z_ok & par_ok & reproj_ok
    return jnp.sum(good.astype(jnp.int32)), good, X1, cospar


def reconstruct_from_F(F, p1, p2, inlier, cam_params):
    """E = K^T F K, 4-way decomposition, pick the candidate seen by the
    most points (ReconstructF, TwoViewReconstruction.cc:400-500).

    Returns TwoViewResult fields (without scores)."""
    from . import cameras as cam_mod

    K = triangulate.K_matrix(cam_params)
    E = K.T @ F @ K
    u, s, vt = jnp.linalg.svd(E)
    # Proper rotations.
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], F.dtype)
    Ra = u @ W @ vt
    Rb = u @ W.T @ vt
    Ra = Ra * jnp.sign(jnp.linalg.det(Ra))
    Rb = Rb * jnp.sign(jnp.linalg.det(Rb))
    tu = u[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-12)

    rays1 = cam_mod.pinhole_unproject(cam_params, p1)
    rays2 = cam_mod.pinhole_unproject(cam_params, p2)

    cands = [(Ra, tu), (Ra, -tu), (Rb, tu), (Rb, -tu)]
    counts, goods, Xs = [], [], []
    for R21, t21 in cands:
        n, good, X1, _ = _check_rt(R21, t21, rays1, rays2, inlier, cam_params, p1, p2)
        counts.append(n)
        goods.append(good)
        Xs.append(X1)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    n_best = counts[best]
    n_second = jnp.sort(counts)[-2]
    n_inl = jnp.sum(inlier.astype(jnp.int32))
    # Uniqueness + support conditions (reference: nGood > 0.9 nInliers not
    # required; uses minTriangulated=50 and unique-winner checks).
    ok = (n_best > jnp.maximum(jnp.int32(30), (0.75 * n_inl).astype(jnp.int32))) & (
        n_second < (0.85 * n_best).astype(jnp.int32)
    )
    R21 = jnp.stack([c[0] for c in cands])[best]
    t21 = jnp.stack([c[1] for c in cands])[best]
    X1 = jnp.stack(Xs)[best]
    good = jnp.stack(goods)[best]
    return ok, R21, t21, X1, good, n_best


def reconstruct_from_H(H, p1, p2, inlier, cam_params):
    """Faugeras-Lustman homography decomposition: 8 candidate
    (R, t, n) from A = K^-1 H K, cheirality-selected like the F path
    (reference ``ReconstructH``, TwoViewReconstruction.cc:504-600 follows
    the same Faugeras SVD construction — re-derived here from the paper's
    closed form, batched over the 8 cases)."""
    from . import cameras as cam_mod

    K = triangulate.K_matrix(cam_params)
    A = jnp.linalg.inv(K) @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s_det = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = d[0], d[1], d[2]
    # Degenerate if singular values are too close (pure rotation).
    distinct = (d1 / jnp.maximum(d2, 1e-9) > 1.0001) & (
        d2 / jnp.maximum(d3, 1e-9) > 1.0001
    )
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1m = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    x3m = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))

    # Case d' = +d2: theta; case d' = -d2: phi.
    sin_t = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sin_p = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)

    rays1 = cam_mod.pinhole_unproject(cam_params, p1)
    rays2 = cam_mod.pinhole_unproject(cam_params, p2)

    cands = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            x1, x3 = e1 * x1m, e3 * x3m
            # positive d'
            st = e1 * e3 * sin_t
            Rp = jnp.array(
                [[cos_t, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, cos_t]], H.dtype
            )
            tp = (d1 - d3) * jnp.asarray([x1, 0.0, -x3], H.dtype)
            cands.append((s_det * U @ Rp @ Vt, U @ tp))
            # negative d'
            sp = e1 * e3 * sin_p
            Rn = jnp.array(
                [[cos_p, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cos_p]], H.dtype
            )
            tn = (d1 + d3) * jnp.asarray([x1, 0.0, x3], H.dtype)
            cands.append((s_det * U @ Rn @ Vt, U @ tn))

    counts, goods, Xs, Rs, ts_ = [], [], [], [], []
    for R21, t21 in cands:
        tn = t21 / jnp.maximum(jnp.linalg.norm(t21), 1e-12)
        n, good, X1, _ = _check_rt(R21, tn, rays1, rays2, inlier, cam_params, p1, p2)
        counts.append(n)
        goods.append(good)
        Xs.append(X1)
        Rs.append(R21)
        ts_.append(tn)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    n_best = counts[best]
    n_second = jnp.sort(counts)[-2]
    n_inl = jnp.sum(inlier.astype(jnp.int32))
    ok = (
        distinct
        & (n_best > jnp.maximum(jnp.int32(30), (0.75 * n_inl).astype(jnp.int32)))
        & (n_second < (0.85 * n_best).astype(jnp.int32))
    )
    return (
        ok,
        jnp.stack(Rs)[best],
        jnp.stack(ts_)[best],
        jnp.stack(Xs)[best],
        jnp.stack(goods)[best],
        n_best,
    )


def two_view_init(
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    match_valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 256,
    sigma: float = 1.0,
) -> TwoViewResult:
    """Full monocular two-view initialization from matched level-0
    keypoints (already paired: xy1[i] <-> xy2[i], mask ``match_valid``).

    Runs H and F RANSAC in parallel like the reference's two threads
    (TwoViewReconstruction.cc:86-91) and reconstructs from the winner
    (only the F/essential path recovers motion here; an H winner with
    strong F support still reconstructs via F — planar-degenerate cases
    where F fails entirely return ok=False and the caller retries next
    frame, matching the reference's conservative initializer behavior).
    """
    n = xy1.shape[0]
    inv_sigma2 = 1.0 / (sigma * sigma)

    # Sample hypothesis sets from valid matches.
    logits = jnp.where(match_valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[None, :], shape=(n_hyp, 8))
    s1 = xy1[idx]  # [S, 8, 2]
    s2 = xy2[idx]

    F_all = fit_fundamental(s1, s2)
    H_all = fit_homography(s1, s2)
    scF, _ = score_fundamental(F_all, xy1[None], xy2[None], match_valid[None], inv_sigma2)
    scH, _ = score_homography(H_all, xy1[None], xy2[None], match_valid[None], inv_sigma2)
    bF = jnp.argmax(scF)
    bH = jnp.argmax(scH)
    F = F_all[bF]
    H = H_all[bH]
    score_H_best = scH[bH]
    _, inlF = score_fundamental(F, xy1, xy2, match_valid, inv_sigma2)
    # Gold-standard IRLS refit on the winner's inliers — the minimal
    # 8-point epipole is too noisy to decompose directly, and even 1%
    # residual outliers have enough leverage to bend it, so weight rows
    # by a Cauchy factor of their symmetric transfer error.
    w = inlF.astype(xy1.dtype)
    for _ in range(3):
        F = fit_fundamental_masked(xy1, xy2, w)
        chi1, chi2 = _epipolar_chi2(F, xy1, xy2, inv_sigma2)
        chi = chi1 + chi2
        inlF = (chi1 < TH_F) & (chi2 < TH_F) & match_valid
        w = inlF.astype(xy1.dtype) * jnp.sqrt(1.0 / (1.0 + chi))
    score_F_best, _ = score_fundamental(F, xy1, xy2, match_valid, inv_sigma2)

    rh = score_H_best / jnp.maximum(score_H_best + score_F_best, 1e-9)
    used_H = rh > 0.45  # reference selects H when rh > 0.40

    ok_f, R_f, t_f, X_f, good_f, n_f = reconstruct_from_F(
        F, xy1, xy2, inlF, cam_params
    )
    _, inlH = score_homography(H, xy1, xy2, match_valid, inv_sigma2)
    ok_h, R_h, t_h, X_h, good_h, n_h = reconstruct_from_H(
        H, xy1, xy2, inlH, cam_params
    )
    # Prefer the selected model's reconstruction, but fall back to a
    # passing F reconstruction when H wins the score yet fails its
    # degeneracy/uniqueness gates (the F path has its own gates, so this
    # only ever adds initializations that independently check out).
    use_h = used_H & ok_h
    ok = use_h | ok_f
    pick = lambda a, b: jnp.where(use_h, a, b)
    R21 = pick(R_h, R_f)
    t21 = pick(t_h, t_f)
    X1 = jnp.where(use_h, X_h, X_f)
    good = jnp.where(use_h, good_h, good_f)
    n_good = pick(n_h, n_f)
    return TwoViewResult(
        ok=ok,
        used_H=used_H,
        R21=R21,
        t21=t21,
        X1=X1,
        good=good & ok,
        n_good=jnp.where(ok, n_good, 0),
        score_F=score_F_best,
        score_H=score_H_best,
    )
