"""Shared visual-inertial simulation helpers for solver tests."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import imu, lie


def make_calib(freq=200.0):
    return imu.ImuCalib(
        sigma_g=jnp.full((3,), 1.7e-4 * np.sqrt(freq), jnp.float32),
        sigma_a=jnp.full((3,), 2e-3 * np.sqrt(freq), jnp.float32),
        sigma_gw=jnp.full((3,), 1.9e-5 / np.sqrt(freq), jnp.float32),
        sigma_aw=jnp.full((3,), 3e-3 / np.sqrt(freq), jnp.float32),
        R_bc=jnp.eye(3),
        t_bc=jnp.zeros(3),
    )


def simulate_vi(
    rng,
    n_kf=8,
    samples_per_kf=20,
    dt=0.005,
    gravity=None,
    bg=None,
    ba=None,
    meas_noise=0.0,
):
    """Simulate a smooth body trajectory + IMU measurements, segmented
    into keyframe windows.

    Returns dict with GT keyframe states and per-window measurement
    arrays (acc [Q, S, 3], gyro [Q, S, 3], dts [Q, S]).
    """
    g = np.array([0.0, 0.0, -imu.GRAVITY]) if gravity is None else np.asarray(gravity)
    bg = np.zeros(3) if bg is None else np.asarray(bg)
    ba = np.zeros(3) if ba is None else np.asarray(ba)
    n_steps = n_kf * samples_per_kf
    omega_base = rng.normal(size=3) * 0.3
    R = np.eye(3)
    v = rng.normal(size=3) * 0.4
    p = np.zeros(3)
    Rs, ps, vs = [R.copy()], [p.copy()], [v.copy()]
    accs, gyros = [], []
    sub = 16
    for i in range(n_steps):
        t = i * dt
        a_w = np.array(
            [1.2 * np.sin(2.2 * t), -0.9 * np.cos(1.7 * t), 0.5 * np.sin(1.3 * t + 0.4)]
        )
        omega = omega_base + 0.2 * np.array(
            [np.sin(0.9 * t), np.cos(1.1 * t), np.sin(0.6 * t)]
        )
        accs.append(R.T @ (a_w - g) + ba + rng.normal(size=3) * meas_noise)
        gyros.append(omega + bg + rng.normal(size=3) * meas_noise * 0.1)
        h = dt / sub
        for _ in range(sub):
            p = p + v * h + 0.5 * a_w * h * h
            v = v + a_w * h
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(omega * h, jnp.float32)))
        Rs.append(R.copy())
        ps.append(p.copy())
        vs.append(v.copy())
    # keyframe states at sample boundaries 0, S, 2S, ...
    kf_idx = np.arange(0, n_steps + 1, samples_per_kf)
    acc = np.asarray(accs, np.float32).reshape(n_kf, samples_per_kf, 3)
    gyro = np.asarray(gyros, np.float32).reshape(n_kf, samples_per_kf, 3)
    dts = np.full((n_kf, samples_per_kf), dt, np.float32)
    return dict(
        R_wb=np.asarray(Rs, np.float32)[kf_idx],
        p_wb=np.asarray(ps, np.float32)[kf_idx],
        v_w=np.asarray(vs, np.float32)[kf_idx],
        acc=acc,
        gyro=gyro,
        dts=dts,
        gravity=g.astype(np.float32),
        bg=bg.astype(np.float32),
        ba=ba.astype(np.float32),
    )


def preintegrate_windows(sim, b_lin=None, calib=None):
    """Stacked Preintegrated pytree over the Q = n_kf windows."""
    calib = calib or make_calib()
    b = jnp.zeros(6) if b_lin is None else jnp.asarray(b_lin)
    f = jax.vmap(lambda a, w, d: imu.preintegrate(a, w, d, b, calib))
    return f(jnp.asarray(sim["acc"]), jnp.asarray(sim["gyro"]), jnp.asarray(sim["dts"]))
