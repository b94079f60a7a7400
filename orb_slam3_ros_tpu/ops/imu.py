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

    Equivalent to the reference's ``Reintegrate`` loop (ImuTypes.cc:168)
    but as one compiled ``lax.scan`` with a static buffer size.
    """
    nga = jnp.concatenate([calib.sigma_g**2, calib.sigma_a**2])
    nga_walk = jnp.concatenate([calib.sigma_gw**2, calib.sigma_aw**2])
    state0 = init_preintegrated(b_lin, dtype=acc.dtype)

    def step(s, m):
        return _integrate_step(s, m, nga, nga_walk)

    state, _ = jax.lax.scan(step, state0, (acc, gyro, dts))
    return state


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
