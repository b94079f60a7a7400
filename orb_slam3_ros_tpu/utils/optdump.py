"""Loop-closure optimization-problem dump + offline replay.

Role of the fork's data-dump subsystem inside ``LoopClosing`` (the
defining addition of giltchcity/orb_slam3_ros over upstream):
``SaveOptimizationData`` (orb_slam3/src/LoopClosing.cc:125),
``SaveCompleteTrajectory`` (:377), ``SaveCovisibilityGraph`` (:630),
``SaveEssentialGraph`` (:713), ``SaveIMUStates`` (:768) — which write
the complete pre/post pose-graph problem to disk so the standalone
Ceres experiments (3DCERES/loop_optimization.cpp, test_op_data.cpp)
can re-solve it offline and compare.

This module writes/reads the same logical schema (keyframe poses,
covisibility weights, essential-graph edges with relative-pose
measurements, loop Sim3 constraints, IMU states, map points) as plain
text, and ``reoptimize`` replays a dump through the TPU pose-graph
optimizer producing before/after TUM trajectories — the golden-data
replay testing pattern the fork pioneered (SURVEY §2.4/§4).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np


class OptDump(NamedTuple):
    kf_id: np.ndarray  # [K] int
    kf_ts: np.ndarray  # [K]
    kf_R: np.ndarray  # [K,3,3] Tcw rotation
    kf_t: np.ndarray  # [K,3]
    cov_i: np.ndarray  # [C] covisibility edges
    cov_j: np.ndarray
    cov_w: np.ndarray  # [C] shared-point weight
    e_i: np.ndarray  # [E] essential-graph edges (incl. loop edges)
    e_j: np.ndarray
    e_R: np.ndarray  # [E,3,3] measured relative S_ji rotation
    e_t: np.ndarray  # [E,3]
    e_s: np.ndarray  # [E]
    e_kind: np.ndarray  # [E] 0=spanning-tree/seq, 1=loop
    kf_v: np.ndarray  # [K,3] IMU velocity
    kf_bg: np.ndarray  # [K,3]
    kf_ba: np.ndarray  # [K,3]
    pt_X: np.ndarray  # [P,3]
    pt_ref_kf: np.ndarray  # [P]


def _quat_wxyz(R):
    """Rotation matrix -> (qw, qx, qy, qz), batched."""
    from ..ops import lie
    import jax.numpy as jnp

    q = np.asarray(lie.quat_from_rotmat(jnp.asarray(R)))
    return q


def _rot_from_quat(q):
    from ..ops import lie
    import jax.numpy as jnp

    return np.asarray(lie.rotmat_from_quat(jnp.asarray(q)))


def save_optimization_data(
    dirpath: str,
    kf_id,
    kf_ts,
    kf_R,
    kf_t,
    cov,  # [K,K] covisibility weights (int) or None
    e_i,
    e_j,
    e_R,
    e_t,
    e_s,
    e_kind,
    kf_v=None,
    kf_bg=None,
    kf_ba=None,
    pt_X=None,
    pt_ref_kf=None,
) -> None:
    """Write one optimization problem to ``dirpath`` (created).

    File-per-section layout mirrors the fork's optimization_data dirs
    (LoopClosing.cc:125-1074 writes keyframe poses, covisibility with
    weights, essential graph, loop Sim3 constraints, IMU states, map
    points as separate text files).
    """
    os.makedirs(dirpath, exist_ok=True)
    kf_R = np.asarray(kf_R)
    kf_t = np.asarray(kf_t)
    K = len(kf_R)
    q = _quat_wxyz(kf_R)
    with open(os.path.join(dirpath, "keyframe_poses.txt"), "w") as f:
        f.write("# id ts qw qx qy qz tx ty tz  (T_cw)\n")
        for k in range(K):
            f.write(
                f"{int(kf_id[k])} {float(kf_ts[k]):.9f} "
                + " ".join(f"{v:.9f}" for v in q[k])
                + " "
                + " ".join(f"{v:.9f}" for v in kf_t[k])
                + "\n"
            )
    if cov is not None:
        cov = np.asarray(cov)
        ii, jj = np.nonzero(np.triu(cov, 1))
        with open(os.path.join(dirpath, "covisibility_graph.txt"), "w") as f:
            f.write("# i j weight\n")
            for a, b in zip(ii, jj):
                f.write(f"{int(kf_id[a])} {int(kf_id[b])} {int(cov[a, b])}\n")
    e_R = np.asarray(e_R)
    e_t = np.asarray(e_t)
    qe = _quat_wxyz(e_R) if len(e_R) else np.zeros((0, 4))
    with open(os.path.join(dirpath, "essential_graph.txt"), "w") as f:
        f.write("# i j kind s qw qx qy qz tx ty tz  (S_ji; kind 0=seq 1=loop)\n")
        for n in range(len(e_i)):
            f.write(
                f"{int(e_i[n])} {int(e_j[n])} {int(e_kind[n])} {float(e_s[n]):.9f} "
                + " ".join(f"{v:.9f}" for v in qe[n])
                + " "
                + " ".join(f"{v:.9f}" for v in e_t[n])
                + "\n"
            )
    if kf_v is not None:
        kf_v, kf_bg, kf_ba = (np.asarray(a) for a in (kf_v, kf_bg, kf_ba))
        with open(os.path.join(dirpath, "imu_states.txt"), "w") as f:
            f.write("# id vx vy vz bgx bgy bgz bax bay baz\n")
            for k in range(K):
                f.write(
                    f"{int(kf_id[k])} "
                    + " ".join(f"{v:.9f}" for v in kf_v[k])
                    + " "
                    + " ".join(f"{v:.9f}" for v in kf_bg[k])
                    + " "
                    + " ".join(f"{v:.9f}" for v in kf_ba[k])
                    + "\n"
                )
    if pt_X is not None:
        pt_X = np.asarray(pt_X)
        pt_ref_kf = np.asarray(pt_ref_kf)
        with open(os.path.join(dirpath, "map_points.txt"), "w") as f:
            f.write("# id x y z ref_kf\n")
            for p in range(len(pt_X)):
                f.write(
                    f"{p} "
                    + " ".join(f"{v:.9f}" for v in pt_X[p])
                    + f" {int(pt_ref_kf[p])}\n"
                )


def load_optimization_data(dirpath: str) -> OptDump:
    """Parse a dump directory back into arrays (role of the parsing half
    of 3DCERES/loop_optimization.cpp / test_op_data.cpp)."""
    kp = np.loadtxt(os.path.join(dirpath, "keyframe_poses.txt"), ndmin=2)
    kf_id = kp[:, 0].astype(np.int32)
    kf_ts = kp[:, 1]
    kf_R = _rot_from_quat(kp[:, 2:6].astype(np.float32))
    kf_t = kp[:, 6:9].astype(np.float32)

    cov_path = os.path.join(dirpath, "covisibility_graph.txt")
    if os.path.exists(cov_path) and os.path.getsize(cov_path) > 20:
        cg = np.loadtxt(cov_path, ndmin=2)
        if cg.size == 0:
            cg = np.zeros((0, 3))
    else:
        cg = np.zeros((0, 3))
    eg = np.loadtxt(os.path.join(dirpath, "essential_graph.txt"), ndmin=2)
    if eg.size == 0:
        eg = np.zeros((0, 11))
    imu_path = os.path.join(dirpath, "imu_states.txt")
    if os.path.exists(imu_path):
        st = np.loadtxt(imu_path, ndmin=2)
        kf_v = st[:, 1:4].astype(np.float32)
        kf_bg = st[:, 4:7].astype(np.float32)
        kf_ba = st[:, 7:10].astype(np.float32)
    else:
        kf_v = kf_bg = kf_ba = np.zeros((len(kf_id), 3), np.float32)
    pt_path = os.path.join(dirpath, "map_points.txt")
    if os.path.exists(pt_path) and os.path.getsize(pt_path) > 20:
        mp = np.loadtxt(pt_path, ndmin=2)
        pt_X = mp[:, 1:4].astype(np.float32) if mp.size else np.zeros((0, 3), np.float32)
        pt_ref = mp[:, 4].astype(np.int32) if mp.size else np.zeros((0,), np.int32)
    else:
        pt_X = np.zeros((0, 3), np.float32)
        pt_ref = np.zeros((0,), np.int32)
    return OptDump(
        kf_id=kf_id,
        kf_ts=kf_ts,
        kf_R=kf_R,
        kf_t=kf_t,
        cov_i=cg[:, 0].astype(np.int32),
        cov_j=cg[:, 1].astype(np.int32),
        cov_w=cg[:, 2].astype(np.int32),
        e_i=eg[:, 0].astype(np.int32),
        e_j=eg[:, 1].astype(np.int32),
        e_kind=eg[:, 2].astype(np.int32),
        e_s=eg[:, 3].astype(np.float32),
        e_R=_rot_from_quat(eg[:, 4:8].astype(np.float32)),
        e_t=eg[:, 8:11].astype(np.float32),
        kf_v=kf_v,
        kf_bg=kf_bg,
        kf_ba=kf_ba,
        pt_X=pt_X,
        pt_ref_kf=pt_ref,
    )


def dump_from_map(m, n_kf: int, loop_edges=None, with_points: bool = True):
    """Build dump arrays from a (host-fetched) MapState: sequential
    spanning-tree edges from consecutive keyframe poses + optional loop
    constraints [(i, j, R_ji, t_ji, s_ji), ...]."""
    import jax

    from ..models import map_state as ms
    from ..ops import lie
    import jax.numpy as jnp

    cov = np.asarray(jax.device_get(ms.covisibility(m)))[:n_kf, :n_kf]
    kf_R = np.asarray(jax.device_get(m.kf_R))[:n_kf]
    kf_t = np.asarray(jax.device_get(m.kf_t))[:n_kf]
    kf_ts = np.asarray(jax.device_get(m.kf_ts))[:n_kf]
    ones = np.ones((n_kf,), np.float32)
    # sequential relative measurements S_ji = S_jw * S_iw^-1, scale 1
    Ri, ti = kf_R[:-1], kf_t[:-1]
    Rj, tj = kf_R[1:], kf_t[1:]
    Rinv, tinv, sinv = (
        np.asarray(x)
        for x in lie.sim3_inv(jnp.asarray(Ri), jnp.asarray(ti), jnp.asarray(ones[:-1]))
    )
    Rm, tm, sm = (
        np.asarray(x)
        for x in lie.sim3_mul(
            jnp.asarray(Rj), jnp.asarray(tj), jnp.asarray(ones[:-1]),
            jnp.asarray(Rinv), jnp.asarray(tinv), jnp.asarray(sinv),
        )
    )
    e_i = list(range(n_kf - 1))
    e_j = list(range(1, n_kf))
    e_R = list(Rm)
    e_t = list(tm)
    e_s = list(sm)
    e_kind = [0] * (n_kf - 1)
    for le in loop_edges or []:
        i, j, R_ji, t_ji, s_ji = le
        e_i.append(int(i))
        e_j.append(int(j))
        e_R.append(np.asarray(R_ji))
        e_t.append(np.asarray(t_ji))
        e_s.append(float(s_ji))
        e_kind.append(1)
    out = dict(
        kf_id=np.arange(n_kf),
        kf_ts=kf_ts,
        kf_R=kf_R,
        kf_t=kf_t,
        cov=cov,
        e_i=np.asarray(e_i),
        e_j=np.asarray(e_j),
        e_R=np.stack(e_R),
        e_t=np.stack(e_t),
        e_s=np.asarray(e_s, np.float32),
        e_kind=np.asarray(e_kind),
        kf_v=np.asarray(jax.device_get(m.kf_v))[:n_kf],
        kf_bg=np.asarray(jax.device_get(m.kf_bg))[:n_kf],
        kf_ba=np.asarray(jax.device_get(m.kf_ba))[:n_kf],
    )
    if with_points:
        pt_valid = np.asarray(jax.device_get(m.pt_valid))
        out["pt_X"] = np.asarray(jax.device_get(m.pt_X))[pt_valid]
        out["pt_ref_kf"] = np.asarray(jax.device_get(m.pt_first_kf))[pt_valid]
    return out


def reoptimize(
    dump: OptDump,
    n_iters: int = 30,
    four_dof: bool = False,
    fix_first: bool = True,
    loop_weight: float = 5.0,
    cov_min: int = 100,
):
    """Re-solve the dumped essential-graph problem with the TPU
    pose-graph optimizer (the 3DCERES/loop_optimization.cpp workflow:
    parse dump -> rebuild vertices/edges -> optimize -> before/after).

    Strong covisibility pairs from the dump's covisibility section
    (weight >= ``cov_min``, the reference's minFeat=100 covisibility
    edges, Optimizer.cc:1711) are added as extra relative-pose edges with
    measurements computed from the BEFORE poses, matching the live
    system's essential-graph assembly.

    Returns (R_new [K,3,3], t_new [K,3], s_new [K], cost)."""
    import jax.numpy as jnp

    from ..ops import lie, pgo

    K = len(dump.kf_id)
    id_to_idx = {int(v): k for k, v in enumerate(dump.kf_id)}
    e_i = np.asarray([id_to_idx[int(v)] for v in dump.e_i], np.int32)
    e_j = np.asarray([id_to_idx[int(v)] for v in dump.e_j], np.int32)
    w = np.where(dump.e_kind == 1, loop_weight, 1.0).astype(np.float32)
    e_R = dump.e_R.astype(np.float32)
    e_t = dump.e_t.astype(np.float32)
    e_s = dump.e_s.astype(np.float32)
    # --- covisibility edges (w >= cov_min), excluding pairs already in
    # the essential-graph section ---
    if len(dump.cov_i):
        have = {(int(a), int(b)) for a, b in zip(e_i, e_j)}
        have |= {(b, a) for a, b in have}
        ci = np.asarray([id_to_idx[int(v)] for v in dump.cov_i], np.int32)
        cj = np.asarray([id_to_idx[int(v)] for v in dump.cov_j], np.int32)
        keep = (dump.cov_w >= cov_min) & np.asarray(
            [(int(a), int(b)) not in have for a, b in zip(ci, cj)]
        )
        if keep.any():
            ci, cj = ci[keep], cj[keep]
            ones = jnp.ones((len(ci),), jnp.float32)
            Rinv, tinv, sinv = lie.sim3_inv(
                jnp.asarray(dump.kf_R[ci].astype(np.float32)),
                jnp.asarray(dump.kf_t[ci].astype(np.float32)), ones,
            )
            Rm, tm, sm = lie.sim3_mul(
                jnp.asarray(dump.kf_R[cj].astype(np.float32)),
                jnp.asarray(dump.kf_t[cj].astype(np.float32)), ones,
                Rinv, tinv, sinv,
            )
            e_i = np.concatenate([e_i, ci])
            e_j = np.concatenate([e_j, cj])
            e_R = np.concatenate([e_R, np.asarray(Rm)])
            e_t = np.concatenate([e_t, np.asarray(tm)])
            e_s = np.concatenate([e_s, np.asarray(sm)])
            w = np.concatenate([w, np.ones((len(ci),), np.float32)])
    fixed = np.zeros((K,), bool)
    if fix_first:
        fixed[0] = True
    # loop edges' endpoints anchor the graph like the reference fixes
    # the loop keyframe (Optimizer.cc:1535 pLoopKF fixed)
    for n in range(len(dump.e_kind)):
        if dump.e_kind[n] == 1:
            fixed[e_j[n]] = True
    prob = pgo.PGOProblem(
        R=jnp.asarray(dump.kf_R),
        t=jnp.asarray(dump.kf_t),
        s=jnp.ones((K,), jnp.float32),
        kf_fixed=jnp.asarray(fixed),
        kf_valid=jnp.ones((K,), bool),
        e_i=jnp.asarray(e_i),
        e_j=jnp.asarray(e_j),
        e_R=jnp.asarray(e_R),
        e_t=jnp.asarray(e_t),
        e_s=jnp.asarray(e_s),
        e_valid=jnp.ones((len(e_i),), bool),
        e_weight=jnp.asarray(w),
    )
    if four_dof:
        res = pgo.optimize_pose_graph_4dof(prob, n_iters=n_iters)
    else:
        res = pgo.optimize_pose_graph(prob, n_iters=n_iters)
    s = np.maximum(np.asarray(res.s), 1e-6)
    return (
        np.asarray(res.R),
        np.asarray(res.t) / s[:, None],
        s,
        float(res.cost),
    )


def trajectory_from_poses(kf_ts, kf_R, kf_t):
    """Tcw arrays -> [(ts, Twc 4x4)] for trajectory.save_tum."""
    out = []
    for k in range(len(kf_ts)):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = kf_R[k].T
        T[:3, 3] = -kf_R[k].T @ kf_t[k]
        out.append((float(kf_ts[k]), T))
    return out
