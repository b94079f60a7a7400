"""Chunked, abortable FULL INERTIAL BA — the inertial twin of the mono
async GBA (the reference's RunGlobalBundleAdjustment background thread
calls FullInertialBA when pActiveMap->IsInertial(),
LoopClosing.cc:3611-3780, with the same mbStopGBA abort flag).

Covers the two new mechanisms:
  * resumable LM: vi_bundle_adjust carries its damping out
    (VIBAResult.lam) so a chunked caller walks the exact same
    trust-region path as a single long solve;
  * partial fold-in: apply_vi_gba_partial propagates keyframes/points
    created DURING the solve by the anchor-keyframe correction,
    including the world-frame velocity rotation the mono fold-in does
    not need.
The end-to-end composition (closure fires at a chunk boundary, GBA
chunks interleave with VI chunks) is covered by
test_vi_chunk.py::test_chunk_composes_with_loop_closing.
"""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_ros_tpu.models import local_mapping, map_state as ms
from orb_slam3_ros_tpu.ops import lie, viba
from test_viba import build_vi_problem
from vi_sim import make_calib, simulate_vi


class TestResumableVIBA:
    def test_chunked_lam_carry_matches_single_solve(self, rng):
        """4 x 2-iter chunks with carried (states, X, lam) must follow the
        same LM trajectory as one 8-iter solve — chunk boundaries only
        recompute values that are deterministic functions of the carry."""
        sim = simulate_vi(rng, n_kf=8)
        prob, _ = build_vi_problem(
            rng, sim, perturb=0.03, vel_perturb=0.05, pt_noise=0.02
        )
        res_one = viba.vi_bundle_adjust(prob, n_iters=8)
        p = prob
        lam = jnp.asarray(1e-3, jnp.float32)
        for _ in range(4):
            r = viba.vi_bundle_adjust(p, n_iters=2, lam0=lam)
            p = p._replace(states=r.states, X=r.X)
            lam = r.lam
        np.testing.assert_allclose(
            np.asarray(r.states.p_wb), np.asarray(res_one.states.p_wb),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(r.X), np.asarray(res_one.X), atol=1e-5
        )
        np.testing.assert_allclose(
            float(r.cost), float(res_one.cost), rtol=1e-5
        )


class TestApplyVIGBAPartial:
    def test_propagates_keyframes_points_velocities(self, rng):
        """Keyframes/points born during the solve ride the anchor
        correction; world velocities rotate by it; solved slots take the
        solver's states verbatim."""
        K, N, P = 8, 16, 32
        calib = make_calib()
        m = ms.empty_map(K, N, P)
        n_kf0 = 5
        # Ground layout: 5 solved keyframes along +x, one (slot 5) born
        # during the solve with a known pose relative to slot 4.
        kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        kf_t = np.zeros((K, 3), np.float32)
        for k in range(n_kf0):
            kf_t[k] = [0.3 * k, 0.0, 0.0]
        R_rel = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.04, 0.0])),
                           np.float32)
        t_rel = np.asarray([0.25, 0.0, 0.05], np.float32)
        kf_R[5] = R_rel @ kf_R[4]
        kf_t[5] = R_rel @ kf_t[4] + t_rel
        kf_v = rng.normal(size=(K, 3)).astype(np.float32)
        kf_bg = rng.normal(size=(K, 3)).astype(np.float32) * 0.01
        kf_ba = rng.normal(size=(K, 3)).astype(np.float32) * 0.01
        X = rng.uniform(-2, 2, size=(P, 3)).astype(np.float32)
        pt_valid = np.ones(P, bool)
        pt_first = np.zeros(P, np.int32)
        pt_first[20:] = n_kf0  # born during the solve
        m = m._replace(
            kf_valid=jnp.asarray(np.arange(K) < 6),
            kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
            kf_v=jnp.asarray(kf_v), kf_bg=jnp.asarray(kf_bg),
            kf_ba=jnp.asarray(kf_ba),
            pt_X=jnp.asarray(X), pt_valid=jnp.asarray(pt_valid),
            pt_first_kf=jnp.asarray(pt_first),
        )
        # The "solve" applied a rigid world correction x' = R_c x + t_c.
        R_c = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.08])),
                         np.float32)
        t_c = np.asarray([0.1, -0.05, 0.02], np.float32)
        wids = jnp.arange(n_kf0)
        R_wb, p_wb = viba.body_from_cam(
            m.kf_R[wids], m.kf_t[wids], calib.R_bc, calib.t_bc
        )
        states = viba.VIStates(
            R_wb=jnp.asarray(R_c) @ R_wb,
            p_wb=p_wb @ jnp.asarray(R_c).T + jnp.asarray(t_c),
            v_w=jnp.asarray(kf_v[:n_kf0] @ R_c.T),
            bg=jnp.asarray(kf_bg[:n_kf0]), ba=jnp.asarray(kf_ba[:n_kf0]),
        )
        res = viba.VIBAResult(
            states=states,
            X=jnp.asarray(X @ R_c.T + t_c),
            cost=jnp.asarray(0.0),
            chi2_visual=jnp.zeros(n_kf0 * N),
            inlier=jnp.ones(n_kf0 * N, bool),
        )
        m2 = local_mapping.apply_vi_gba_partial(
            m, wids, res, calib, jnp.asarray(n_kf0, jnp.int32)
        )
        kf_R2 = np.asarray(jax.device_get(m2.kf_R))
        kf_t2 = np.asarray(jax.device_get(m2.kf_t))
        kf_v2 = np.asarray(jax.device_get(m2.kf_v))
        X2 = np.asarray(jax.device_get(m2.pt_X))
        # Solved slots: corrected poses exactly (Tcw' = Tcw R_c^T ...).
        for k in range(n_kf0):
            np.testing.assert_allclose(
                kf_R2[k], kf_R[k] @ R_c.T, atol=1e-5
            )
            np.testing.assert_allclose(
                kf_t2[k], kf_t[k] - kf_R[k] @ R_c.T @ t_c, atol=1e-5
            )
            np.testing.assert_allclose(kf_v2[k], R_c @ kf_v[k], atol=1e-5)
        # Slot 5 keeps its RELATIVE pose to the corrected anchor.
        np.testing.assert_allclose(kf_R2[5], R_rel @ kf_R2[4], atol=1e-5)
        np.testing.assert_allclose(
            kf_t2[5], R_rel @ kf_t2[4] + t_rel, atol=1e-5
        )
        # ... and its world velocity rotates by the correction.
        np.testing.assert_allclose(kf_v2[5], R_c @ kf_v[5], atol=1e-5)
        # Biases are body quantities: unchanged everywhere.
        np.testing.assert_allclose(
            np.asarray(jax.device_get(m2.kf_bg)), kf_bg, atol=1e-6
        )
        # Old points take the solver's X; new points ride the correction.
        np.testing.assert_allclose(X2[:20], X[:20] @ R_c.T + t_c, atol=1e-5)
        np.testing.assert_allclose(X2[20:], X[20:] @ R_c.T + t_c, atol=1e-5)
