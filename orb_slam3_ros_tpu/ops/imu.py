"""IMU preintegration on manifold — pure JAX, `lax.scan` over windows.

Re-derivation of the reference's ``IMU::Preintegrated`` (reference
orb_slam3/src/ImuTypes.cc:177-235 ``IntegrateNewMeasurement``,
:283-312 bias-corrected delta getters, orb_slam3/include/ImuTypes.h:46-251)
following the standard on-manifold preintegration (Forster et al.):

state per keyframe-pair: ``dR`` [3,3], ``dV`` [3], ``dP`` [3], bias
Jacobians ``JRg JVg JVa JPg JPa`` [3,3], covariance ``C`` [15,15] over
[theta(3), v(3), p(3), bg(3), ba(3)], integrated time ``dT``, and the
linearization bias ``b_lin`` [6] = [bg, ba] (gyro first).

TPU-first design: a fixed-capacity measurement buffer ``(acc [N,3],
gyro [N,3], dt [N])`` with ``dt == 0`` padding rows integrates as a no-op,
so one compiled scan serves every frame regardless of how many IMU samples
arrived (the reference reintegrates variable-length std::vectors,
ImuTypes.cc:168-176; we re-run the same scan on the padded buffer).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie


class ImuCalib(NamedTuple):
    """Noise calibration (role of ``IMU::Calib``, ImuTypes.h:105-130).

    ``sigma_g/sigma_a`` are the *discrete* noise densities, i.e. the
    continuous densities already multiplied by sqrt(rate) as the reference
    does when parsing the YAML (Tracking.cc:1386-1395: ``Ng*sf`` with
    ``sf = sqrt(freq)``); walk sigmas divided by sqrt(rate) likewise.
    ``R_bc/t_bc``: camera-in-body extrinsics (``Tbc`` in the YAML).
    """

    sigma_g: jnp.ndarray  # [3] gyro noise (discrete)
    sigma_a: jnp.ndarray  # [3] accel noise (discrete)
    sigma_gw: jnp.ndarray  # [3] gyro random walk (discrete)
    sigma_aw: jnp.ndarray  # [3] accel random walk (discrete)
    R_bc: jnp.ndarray  # [3,3]
    t_bc: jnp.ndarray  # [3]


GRAVITY = 9.81  # reference GRAVITY_VALUE, ImuTypes.h:32
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)


class Preintegrated(NamedTuple):
    """Pytree preintegration state (role of ``IMU::Preintegrated``)."""

    dR: jnp.ndarray  # [3,3]
    dV: jnp.ndarray  # [3]
    dP: jnp.ndarray  # [3]
    JRg: jnp.ndarray  # [3,3] d(dR)/d(bg)
    JVg: jnp.ndarray  # [3,3]
    JVa: jnp.ndarray  # [3,3]
    JPg: jnp.ndarray  # [3,3]
    JPa: jnp.ndarray  # [3,3]
    C: jnp.ndarray  # [15,15] cov of [theta, v, p, bg, ba]
    dT: jnp.ndarray  # [] total time
    b_lin: jnp.ndarray  # [6] linearization bias [bg, ba]


def init_preintegrated(b_lin=None, dtype=jnp.float32) -> Preintegrated:
    z33 = jnp.zeros((3, 3), dtype)
    z3 = jnp.zeros((3,), dtype)
    return Preintegrated(
        dR=jnp.eye(3, dtype=dtype),
        dV=z3,
        dP=z3,
        JRg=z33,
        JVg=z33,
        JVa=z33,
        JPg=z33,
        JPa=z33,
        C=jnp.zeros((15, 15), dtype),
        dT=jnp.zeros((), dtype),
        b_lin=jnp.zeros((6,), dtype) if b_lin is None else b_lin,
    )


def _integrate_step(state: Preintegrated, meas, nga: jnp.ndarray, nga_walk: jnp.ndarray):
    """One measurement update (mirrors ImuTypes.cc:177-235 semantics).

    ``meas = (acc [3], gyro [3], dt [])``; a ``dt == 0`` row is a no-op
    (covariance walk term is gated on dt > 0).
    """
    acc_raw, gyro_raw, dt = meas
    bg, ba = state.b_lin[:3], state.b_lin[3:]
    acc = acc_raw - ba
    omega = gyro_raw - bg

    dR, dV, dP = state.dR, state.dV, state.dP

    # Position/velocity first (they use the pre-update rotation).
    dP_new = dP + dV * dt + 0.5 * dR @ acc * dt * dt
    dV_new = dV + dR @ acc * dt

    Wacc = lie.hat(acc)

    # Bias Jacobians (pre-update rotation, pre-update JRg).
    JPa_new = state.JPa + state.JVa * dt - 0.5 * dt * dt * dR
    JPg_new = state.JPg + state.JVg * dt - 0.5 * dt * dt * (dR @ Wacc @ state.JRg)
    JVa_new = state.JVa - dR * dt
    JVg_new = state.JVg - dt * (dR @ Wacc @ state.JRg)

    # Rotation increment.
    phi = omega * dt
    dRi = lie.so3_exp(phi)
    rightJ = lie.so3_right_jacobian(phi)
    dR_new = lie.normalize_rotation(dR @ dRi)
    JRg_new = dRi.T @ state.JRg - rightJ * dt

    # Covariance propagation: x9 = [theta, v, p], A [9,9], B [9,6] with
    # noise vector [n_g, n_a].
    A = jnp.eye(9, dtype=dR.dtype)
    A = A.at[0:3, 0:3].set(dRi.T)
    A = A.at[3:6, 0:3].set(-dt * (dR @ Wacc))
    A = A.at[6:9, 0:3].set(-0.5 * dt * dt * (dR @ Wacc))
    A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dR.dtype) * dt)
    B = jnp.zeros((9, 6), dR.dtype)
    B = B.at[0:3, 0:3].set(rightJ * dt)
    B = B.at[3:6, 3:6].set(dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * dt * dt * dR)

    C9 = state.C[:9, :9]
    C9_new = A @ C9 @ A.T + B @ jnp.diag(nga) @ B.T
    active = (dt > 0).astype(dR.dtype)
    C_new = state.C.at[:9, :9].set(jnp.where(dt > 0, C9_new, C9))
    C_new = C_new.at[9:, 9:].add(jnp.diag(nga_walk) * active)

    new_state = Preintegrated(
        dR=jnp.where(dt > 0, dR_new, dR),
        dV=jnp.where(dt > 0, dV_new, dV),
        dP=jnp.where(dt > 0, dP_new, dP),
        JRg=jnp.where(dt > 0, JRg_new, state.JRg),
        JVg=jnp.where(dt > 0, JVg_new, state.JVg),
        JVa=jnp.where(dt > 0, JVa_new, state.JVa),
        JPg=jnp.where(dt > 0, JPg_new, state.JPg),
        JPa=jnp.where(dt > 0, JPa_new, state.JPa),
        C=C_new,
        dT=state.dT + dt,
        b_lin=state.b_lin,
    )
    return new_state, None


def preintegrate_sequential(
    acc: jnp.ndarray,
    gyro: jnp.ndarray,
    dts: jnp.ndarray,
    b_lin: jnp.ndarray,
    calib: ImuCalib,
) -> Preintegrated:
    """Sequential ``lax.scan`` integration (the direct transcription of
    the reference's ``Reintegrate`` loop, ImuTypes.cc:168) — kept as the
    parity reference for ``preintegrate``'s tree reduction."""
    nga = jnp.concatenate([calib.sigma_g**2, calib.sigma_a**2])
    nga_walk = jnp.concatenate([calib.sigma_gw**2, calib.sigma_aw**2])
    state0 = init_preintegrated(b_lin, dtype=acc.dtype)

    def step(s, m):
        return _integrate_step(s, m, nga, nga_walk)

    state, _ = jax.lax.scan(step, state0, (acc, gyro, dts))
    return state


def _compose_preint(a, b):
    """EXACT composition of two preintegrated segments (A then B, same
    linearization bias) — the algebra behind the reference's
    ``MergePrevious`` (ImuTypes.cc:125-166), with covariance and bias
    Jacobians composed in closed form. Exactness (bitwise-equal modulo
    reassociation) against the per-sample recursion follows from
    hat(R a) = R hat(a) R^T: the step-transition products collapse to
    -hat(dV_B)/-hat(dP_B) blocks. Elements are dicts of stacked arrays
    with leading batch dims (used pairwise inside the tree reduction).
    """
    dR_A, dV_A, dP_A, dT_A = a["dR"], a["dV"], a["dP"], a["dT"]
    dR_B, dV_B, dP_B, dT_B = b["dR"], b["dV"], b["dP"], b["dT"]
    mm = lambda x, y: jnp.einsum("...ij,...jk->...ik", x, y)
    mv = lambda x, y: jnp.einsum("...ij,...j->...i", x, y)
    tT = lambda x: jnp.swapaxes(x, -1, -2)
    hat = lambda v: lie.hat(v) if v.ndim == 1 else jax.vmap(lie.hat)(
        v.reshape(-1, 3)).reshape(v.shape[:-1] + (3, 3))
    e = dT_B[..., None]
    dV = dV_A + mv(dR_A, dV_B)
    dP = dP_A + dV_A * e + mv(dR_A, dP_B)
    hV = hat(dV_B)
    hP = hat(dP_B)
    JRg = mm(tT(dR_B), a["JRg"]) + b["JRg"]
    JVa = a["JVa"] + mm(dR_A, b["JVa"])
    JVg = a["JVg"] + mm(dR_A, b["JVg"]) - mm(dR_A, mm(hV, a["JRg"]))
    JPa = a["JPa"] + a["JVa"] * e[..., None] + mm(dR_A, b["JPa"])
    JPg = (a["JPg"] + a["JVg"] * e[..., None] + mm(dR_A, b["JPg"])
           - mm(dR_A, mm(hP, a["JRg"])))
    # 9x9 error-state composition: C = F C_A F^T + T C_B T^T with
    # F = [[dR_B^T,0,0],[-dR_A hat(dV_B),I,0],[-dR_A hat(dP_B),dT_B,I]]
    # and T = diag(I, dR_A, dR_A).
    batch = dR_A.shape[:-2]
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dR_A.dtype), batch + (3, 3))
    Z3 = jnp.zeros(batch + (3, 3), dR_A.dtype)
    eI = I3 * e[..., None]
    F = jnp.concatenate([
        jnp.concatenate([tT(dR_B), Z3, Z3], axis=-1),
        jnp.concatenate([-mm(dR_A, hV), I3, Z3], axis=-1),
        jnp.concatenate([-mm(dR_A, hP), eI, I3], axis=-1),
    ], axis=-2)
    T = jnp.concatenate([
        jnp.concatenate([I3, Z3, Z3], axis=-1),
        jnp.concatenate([Z3, dR_A, Z3], axis=-1),
        jnp.concatenate([Z3, Z3, dR_A], axis=-1),
    ], axis=-2)
    CA9 = a["C9"]
    CB9 = b["C9"]
    C9 = mm(F, mm(CA9, tT(F))) + mm(T, mm(CB9, tT(T)))
    return dict(
        dR=lie.normalize_rotation(mm(dR_A, dR_B)),
        dV=dV, dP=dP, dT=dT_A + dT_B,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
        C9=C9, Cw=a["Cw"] + b["Cw"],
    )


def preintegrate(
    acc: jnp.ndarray,
    gyro: jnp.ndarray,
    dts: jnp.ndarray,
    b_lin: jnp.ndarray,
    calib: ImuCalib,
) -> Preintegrated:
    """Integrate a (padded) window of measurements from scratch.

    Args:
      acc: [N, 3] accelerometer samples (body frame, includes gravity).
      gyro: [N, 3] gyro samples.
      dts: [N] per-sample integration intervals; 0 rows are padding.
      b_lin: [6] linearization bias [bg, ba].
      calib: noise calibration.

    The reference's ``Reintegrate`` loop (ImuTypes.cc:168) is a strictly
    sequential per-sample recursion; on TPU a 64-256-step ``lax.scan``
    of tiny 3x3/9x9 ops is latency-bound and dominated the measured
    keyframe-body cost (build_vi_ba re-scans W windows). Preintegration
    composes associatively (segment merge — the MergePrevious algebra),
    so this runs as a log2(N)-depth TREE REDUCTION: per-sample segment
    stats once, then pairwise ``_compose_preint`` halvings, all
    vectorized on the VPU. Matches ``preintegrate_sequential`` to
    reassociation tolerance (tests/test_imu_cameras.py).
    """
    dtype = acc.dtype
    N = acc.shape[0]
    nga = jnp.concatenate([calib.sigma_g**2, calib.sigma_a**2]).astype(dtype)
    nga_walk = jnp.concatenate(
        [calib.sigma_gw**2, calib.sigma_aw**2]
    ).astype(dtype)
    bg, ba = b_lin[:3], b_lin[3:]
    a_c = acc - ba
    w_c = gyro - bg
    dt = dts.astype(dtype)
    active = (dt > 0).astype(dtype)
    # Per-sample standalone segment stats (prefix rotation = identity).
    phi = w_c * dt[:, None]
    dRi = jax.vmap(lie.so3_exp)(phi)
    rJ = jax.vmap(lie.so3_right_jacobian)(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (N, 3, 3))
    dtc = dt[:, None, None]
    # dt == 0 rows must be the identity element.
    dR = jnp.where(dtc > 0, dRi, eye)
    dV = a_c * (dt * active)[:, None]
    dP = 0.5 * a_c * (dt * dt * active)[:, None]
    JRg = -rJ * dtc * (dtc > 0)
    JVa = -eye * dtc
    JVg = jnp.zeros((N, 3, 3), dtype)
    JPa = -0.5 * eye * dtc * dtc
    JPg = jnp.zeros((N, 3, 3), dtype)
    B = jnp.zeros((N, 9, 6), dtype)
    B = B.at[:, 0:3, 0:3].set(rJ * dtc)
    B = B.at[:, 3:6, 3:6].set(eye * dtc)
    B = B.at[:, 6:9, 3:6].set(0.5 * eye * dtc * dtc)
    C9 = jnp.einsum("nij,j,nkj->nik", B, nga, B) * (dtc > 0)
    Cw = jnp.einsum("n,ij->nij", active, jnp.diag(nga_walk))
    elems = dict(dR=dR, dV=dV, dP=dP, dT=dt * active,
                 JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
                 C9=C9, Cw=Cw)
    # Pad to a power of two with identity elements, halve log2(N) times.
    P2 = 1 << max(0, (N - 1).bit_length())
    if P2 != N:
        ident = dict(
            dR=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (P2 - N, 3, 3)),
            dV=jnp.zeros((P2 - N, 3), dtype), dP=jnp.zeros((P2 - N, 3), dtype),
            dT=jnp.zeros((P2 - N,), dtype),
            JRg=jnp.zeros((P2 - N, 3, 3), dtype),
            JVg=jnp.zeros((P2 - N, 3, 3), dtype),
            JVa=jnp.zeros((P2 - N, 3, 3), dtype),
            JPg=jnp.zeros((P2 - N, 3, 3), dtype),
            JPa=jnp.zeros((P2 - N, 3, 3), dtype),
            C9=jnp.zeros((P2 - N, 9, 9), dtype),
            Cw=jnp.zeros((P2 - N, 6, 6), dtype),
        )
        elems = jax.tree.map(
            lambda x, i: jnp.concatenate([x, i]), elems, ident
        )
    while elems["dT"].shape[0] > 1:
        left = jax.tree.map(lambda x: x[0::2], elems)
        right = jax.tree.map(lambda x: x[1::2], elems)
        elems = _compose_preint(left, right)
    total = jax.tree.map(lambda x: x[0], elems)
    C = jnp.zeros((15, 15), dtype)
    C = C.at[:9, :9].set(total["C9"]).at[9:, 9:].set(total["Cw"])
    return Preintegrated(
        dR=total["dR"], dV=total["dV"], dP=total["dP"],
        JRg=total["JRg"], JVg=total["JVg"], JVa=total["JVa"],
        JPg=total["JPg"], JPa=total["JPa"],
        C=C, dT=total["dT"], b_lin=b_lin,
    )


def delta_with_bias(state: Preintegrated, b_new: jnp.ndarray):
    """First-order bias-corrected deltas (reference GetDeltaRotation /
    GetDeltaVelocity / GetDeltaPosition, ImuTypes.cc:283-312).

    Returns (dR, dV, dP) at the new bias without re-integration.
    """
    db = b_new - state.b_lin
    dbg, dba = db[:3], db[3:]
    dR = state.dR @ lie.so3_exp(state.JRg @ dbg)
    dV = state.dV + state.JVg @ dbg + state.JVa @ dba
    dP = state.dP + state.JPg @ dbg + state.JPa @ dba
    return dR, dV, dP


def predict_state(R_wb, p_wb, v_w, b, preint: Preintegrated, gravity=None):
    """Dead-reckon keyframe state through a preintegrated window
    (reference ``Tracking::PredictStateIMU``, Tracking.cc:1774-1829).

    All quantities world-frame; returns (R_wb2, p_wb2, v_w2).
    """
    g = GRAVITY_VEC if gravity is None else gravity
    t = preint.dT
    dR, dV, dP = delta_with_bias(preint, b)
    R2 = lie.normalize_rotation(R_wb @ dR)
    v2 = v_w + g * t + R_wb @ dV
    p2 = p_wb + v_w * t + 0.5 * g * t * t + R_wb @ dP
    return R2, p2, v2


def inertial_residual(
    R1, p1, v1, b1, R2, p2, v2, preint: Preintegrated, gravity=None
):
    """9-dim preintegration factor residual (the reference's
    ``EdgeInertial::computeError``, G2oTypes.cc; ordering [er, ev, ep]).

    ``b1`` is the bias at the first keyframe (the edge's linearization
    uses first-order bias correction).
    """
    g = GRAVITY_VEC if gravity is None else gravity
    t = preint.dT
    dR, dV, dP = delta_with_bias(preint, b1)
    er = lie.so3_log(dR.T @ R1.T @ R2)
    ev = R1.T @ (v2 - v1 - g * t) - dV
    ep = R1.T @ (p2 - p1 - v1 * t - 0.5 * g * t * t) - dP
    return jnp.concatenate([er, ev, ep])


def inertial_residual_gs(R1, p1, v1, b1, R2, p2, v2, preint: Preintegrated,
                         gravity, scale):
    """Preintegration residual with a free metric scale multiplying the
    visual-frame velocity/position differences (the reference's
    ``EdgeInertialGS::computeError``, G2oTypes.cc:
    ev = R1^T (s (v2 - v1) - g dt) - dV,
    ep = R1^T (s (p2 - p1 - v1 dt) - 0.5 g dt^2) - dP)."""
    t = preint.dT
    dR, dV, dP = delta_with_bias(preint, b1)
    er = lie.so3_log(dR.T @ R1.T @ R2)
    ev = R1.T @ (scale * (v2 - v1) - gravity * t) - dV
    ep = R1.T @ (scale * (p2 - p1 - v1 * t) - 0.5 * gravity * t * t) - dP
    return jnp.concatenate([er, ev, ep])


# Debug/A-B knob: force the sequential reference integrator.
import os as _os

if _os.environ.get("ORB_TPU_SEQ_PREINT"):
    preintegrate = preintegrate_sequential
