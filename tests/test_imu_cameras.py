"""Tests for IMU preintegration and camera models."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.ops import cameras, imu, lie


def make_calib():
    return imu.ImuCalib(
        sigma_g=jnp.full((3,), 1.7e-4 * np.sqrt(200.0), jnp.float32),
        sigma_a=jnp.full((3,), 2e-3 * np.sqrt(200.0), jnp.float32),
        sigma_gw=jnp.full((3,), 1.9e-5 / np.sqrt(200.0), jnp.float32),
        sigma_aw=jnp.full((3,), 3e-3 / np.sqrt(200.0), jnp.float32),
        R_bc=jnp.eye(3),
        t_bc=jnp.zeros(3),
    )


def simulate_trajectory(n, dt, rng):
    """Ground-truth body trajectory + perfect IMU measurements.

    Constant angular velocity + sinusoidal acceleration, integrated with
    a fine substep so the 'ground truth' is accurate.
    """
    omega = rng.normal(size=3).astype(np.float64) * 0.4
    R = np.eye(3)
    v = rng.normal(size=3).astype(np.float64) * 0.5
    p = np.zeros(3)
    g = np.array([0.0, 0.0, -imu.GRAVITY])
    accs, gyros = [], []
    Rs, ps, vs = [R.copy()], [p.copy()], [v.copy()]
    sub = 32
    for i in range(n):
        t = i * dt
        a_w = np.array(
            [0.8 * np.sin(2.0 * t), -0.5 * np.cos(1.5 * t), 0.3 * np.sin(t)]
        )
        # measured specific force in body frame at interval start
        accs.append(R.T @ (a_w - g))
        gyros.append(omega)
        # integrate finely over [t, t+dt] with constant a_w, omega
        h = dt / sub
        for _ in range(sub):
            p = p + v * h + 0.5 * a_w * h * h
            v = v + a_w * h
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(omega * h, jnp.float32)))
        Rs.append(R.copy())
        ps.append(p.copy())
        vs.append(v.copy())
    return (
        np.asarray(accs, np.float32),
        np.asarray(gyros, np.float32),
        np.asarray(Rs),
        np.asarray(ps),
        np.asarray(vs),
    )


class TestPreintegration:
    def test_zero_residual_on_perfect_data(self, rng):
        n, dt = 20, 0.005
        accs, gyros, Rs, ps, vs = simulate_trajectory(n, dt, rng)
        calib = make_calib()
        state = imu.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.full((n,), dt),
            jnp.zeros(6), calib
        )
        r = imu.inertial_residual(
            jnp.asarray(Rs[0], jnp.float32), jnp.asarray(ps[0], jnp.float32),
            jnp.asarray(vs[0], jnp.float32), jnp.zeros(6),
            jnp.asarray(Rs[-1], jnp.float32), jnp.asarray(ps[-1], jnp.float32),
            jnp.asarray(vs[-1], jnp.float32), state,
        )
        assert float(jnp.max(jnp.abs(r))) < 2e-3, np.asarray(r)

    def test_tree_reduction_matches_sequential(self, rng):
        """The log-depth tree reduction (associative segment composition,
        the MergePrevious algebra) must reproduce the sequential
        per-sample recursion to reassociation tolerance — deltas, ALL
        bias Jacobians, and the full 15x15 covariance."""
        for n in (1, 7, 20, 64):
            accs, gyros, *_ = simulate_trajectory(max(n, 2), 0.005, rng)
            accs, gyros = accs[:n], gyros[:n]
            dts = np.full((n,), 0.005, np.float32)
            if n >= 7:
                dts[n // 2] = 0.0  # padding row mid-stream
            b = jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.01)
            calib = make_calib()
            fast = imu.preintegrate(
                jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
                b, calib)
            seq = imu.preintegrate_sequential(
                jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
                b, calib)
            for f in ("dR", "dV", "dP", "dT", "JRg", "JVg", "JVa",
                      "JPg", "JPa"):
                np.testing.assert_allclose(
                    np.asarray(getattr(fast, f)),
                    np.asarray(getattr(seq, f)),
                    rtol=2e-4, atol=2e-6, err_msg=f"{f} n={n}",
                )
            np.testing.assert_allclose(
                np.asarray(fast.C), np.asarray(seq.C),
                rtol=2e-3, atol=1e-10, err_msg=f"C n={n}",
            )

    def test_padding_is_noop(self, rng):
        n, dt = 16, 0.005
        accs, gyros, *_ = simulate_trajectory(n, dt, rng)
        calib = make_calib()
        s1 = imu.preintegrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.full((n,), dt),
            jnp.zeros(6), calib
        )
        pad = 8
        accs_p = np.concatenate([accs, rng.normal(size=(pad, 3)).astype(np.float32)])
        gyros_p = np.concatenate([gyros, rng.normal(size=(pad, 3)).astype(np.float32)])
        dts_p = np.concatenate([np.full(n, dt, np.float32), np.zeros(pad, np.float32)])
        s2 = imu.preintegrate(
            jnp.asarray(accs_p), jnp.asarray(gyros_p), jnp.asarray(dts_p),
            jnp.zeros(6), calib
        )
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_bias_jacobian_first_order(self, rng):
        """delta_with_bias(b + db) ~ reintegration at b + db."""
        n, dt = 20, 0.005
        accs, gyros, *_ = simulate_trajectory(n, dt, rng)
        calib = make_calib()
        b0 = jnp.zeros(6)
        db = jnp.asarray(rng.normal(size=6).astype(np.float32) * 3e-3)
        s0 = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                              jnp.full((n,), dt), b0, calib)
        dR_c, dV_c, dP_c = imu.delta_with_bias(s0, b0 + db)
        s1 = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                              jnp.full((n,), dt), b0 + db, calib)
        np.testing.assert_allclose(np.asarray(dR_c), np.asarray(s1.dR), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dV_c), np.asarray(s1.dV), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dP_c), np.asarray(s1.dP), atol=2e-3)

    def test_covariance_psd_and_growing(self, rng):
        n, dt = 30, 0.005
        accs, gyros, *_ = simulate_trajectory(n, dt, rng)
        calib = make_calib()
        s = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                             jnp.full((n,), dt), jnp.zeros(6), calib)
        C = np.asarray(s.C, np.float64)
        C = 0.5 * (C + C.T)
        ev = np.linalg.eigvalsh(C)
        assert ev.min() > -1e-10
        assert np.trace(C) > 0
        np.testing.assert_allclose(float(s.dT), n * dt, rtol=1e-5)

    def test_predict_state(self, rng):
        n, dt = 20, 0.005
        accs, gyros, Rs, ps, vs = simulate_trajectory(n, dt, rng)
        calib = make_calib()
        s = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                             jnp.full((n,), dt), jnp.zeros(6), calib)
        R2, p2, v2 = imu.predict_state(
            jnp.asarray(Rs[0], jnp.float32), jnp.asarray(ps[0], jnp.float32),
            jnp.asarray(vs[0], jnp.float32), jnp.zeros(6), s
        )
        np.testing.assert_allclose(np.asarray(R2), Rs[-1], atol=1e-3)
        np.testing.assert_allclose(np.asarray(p2), ps[-1], atol=2e-3)
        np.testing.assert_allclose(np.asarray(v2), vs[-1], atol=2e-3)


class TestCameras:
    def test_pinhole_roundtrip_nodist(self, rng):
        params = jnp.asarray([458.0, 457.0, 367.0, 248.0, 0, 0, 0, 0, 0], jnp.float32)
        X = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        X = X.at[:, 2].set(jnp.abs(X[:, 2]) + 0.5)
        uv = cameras.pinhole_project(params, X)
        ray = cameras.pinhole_unproject(params, uv)
        np.testing.assert_allclose(
            np.asarray(ray[:, :2]), np.asarray(X[:, :2] / X[:, 2:3]), atol=1e-4
        )

    def test_pinhole_roundtrip_radtan(self, rng):
        params = jnp.asarray(
            [458.654, 457.296, 367.215, 248.375, -0.28, 0.07, 2e-4, 1.76e-5, 0.0],
            jnp.float32,
        )  # EuRoC cam0 intrinsics (config/Monocular/EuRoC.yaml schema)
        X = jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32) * 0.4)
        X = X.at[:, 2].set(jnp.abs(X[:, 2]) + 1.0)
        uv = cameras.pinhole_project(params, X)
        ray = cameras.pinhole_unproject(params, uv)
        np.testing.assert_allclose(
            np.asarray(ray[:, :2]), np.asarray(X[:, :2] / X[:, 2:3]), atol=1e-3
        )

    def test_pinhole_jacobian_fd(self, rng):
        params = jnp.asarray([458.0, 457.0, 367.0, 248.0, 0, 0, 0, 0, 0], jnp.float32)
        X = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        X = X.at[:, 2].set(jnp.abs(X[:, 2]) + 0.8)
        J = np.asarray(cameras.pinhole_project_jac(params, X))
        J_ad = np.asarray(
            jax.vmap(jax.jacfwd(lambda p: cameras.pinhole_project_nodist(params, p)))(X)
        )
        np.testing.assert_allclose(J, J_ad, atol=1e-3)

    def test_kb8_roundtrip(self, rng):
        # TUM-VI fisheye-like intrinsics
        params = jnp.asarray(
            [190.98, 190.97, 254.93, 256.9, 0.0034823894022493434,
             0.0007150348452162257, -0.0020532361418706202, 0.00020293673591811182],
            jnp.float32,
        )
        # wide-angle rays up to ~85 deg
        ang = rng.uniform(0, 1.48, size=200).astype(np.float32)
        azi = rng.uniform(0, 2 * np.pi, size=200).astype(np.float32)
        X = jnp.asarray(
            np.stack(
                [np.sin(ang) * np.cos(azi), np.sin(ang) * np.sin(azi), np.cos(ang)],
                axis=-1,
            ).astype(np.float32)
        )
        uv = cameras.kb8_project(params, X)
        ray = cameras.kb8_unproject(params, uv)
        np.testing.assert_allclose(
            np.asarray(ray[:, :2]), np.asarray(X[:, :2] / X[:, 2:3]),
            atol=2e-3, rtol=1e-3,
        )

    def test_kb8_jacobian_matches_ad(self, rng):
        params = jnp.asarray(
            [190.98, 190.97, 254.93, 256.9, 0.0035, 0.0007, -0.002, 0.0002],
            jnp.float32,
        )
        X = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        X = X.at[:, 2].set(jnp.abs(X[:, 2]) + 0.6)
        J = np.asarray(cameras.kb8_project_jac(params, X))
        eps = 1e-3
        for k in range(3):
            d = np.zeros(3, np.float32); d[k] = eps
            fd = (
                np.asarray(cameras.kb8_project(params, X + jnp.asarray(d)))
                - np.asarray(cameras.kb8_project(params, X - jnp.asarray(d)))
            ) / (2 * eps)
            np.testing.assert_allclose(J[:, :, k], fd, atol=5e-2)

    def test_in_image(self):
        uv = jnp.asarray([[0.0, 0.0], [751.9, 479.9], [752.0, 100.0], [-1.0, 5.0]])
        m = np.asarray(cameras.in_image(uv, 752, 480))
        assert list(m) == [True, True, False, False]
