"""Distributed BA: sharded execution must agree with single-device
(the multi-chip scale-out path, SURVEY §2.5 / §7 phase 10, exercised on
the virtual 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.ops import ba
from orb_slam3_ros_tpu.parallel import dist_ba


def toy_problem(rng, K=32, P=2048, E=16384):
    """Equivalence shape: half the realistic GBA K with the same edge
    density (the full K=64/P=8192/E=65536 shape runs in
    test_realistic_gba_shape; solving it twice for equivalence is too
    slow for the 2-core CI host)."""
    import __graft_entry__ as g

    return g._toy_problem(K=K, P=P, E=E)


class TestDistributedBA:
    def test_matches_single_device(self, rng):
        prob = toy_problem(rng)
        res_single = ba.bundle_adjust(prob, n_iters=4)
        mesh = dist_ba.make_mesh(n_devices=8)
        res_dist = dist_ba.distributed_bundle_adjust(prob, mesh, n_iters=4)
        # Same math, different partitioning: results should agree to
        # reduction-order tolerance.
        np.testing.assert_allclose(
            np.asarray(res_dist.cost), np.asarray(res_single.cost),
            rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.R), np.asarray(res_single.R), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.t), np.asarray(res_single.t), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.X), np.asarray(res_single.X), atol=3e-3
        )

    def test_sharding_actually_applied(self, rng):
        prob = toy_problem(rng)
        mesh = dist_ba.make_mesh(n_devices=8)
        sharded = dist_ba.shard_problem(prob, mesh)
        # edge arrays sharded over 'obs', points over 'pt'
        assert len(sharded.uv.sharding.device_set) == 8
        assert not sharded.uv.sharding.is_fully_replicated
        assert not sharded.X.sharding.is_fully_replicated
        assert sharded.R.sharding.is_fully_replicated

    def test_odd_device_counts(self, rng):
        prob = toy_problem(rng)
        for n in (2, 4):
            mesh = dist_ba.make_mesh(n_devices=n)
            res = dist_ba.distributed_bundle_adjust(prob, mesh, n_iters=2)
            assert np.isfinite(float(res.cost))

    def test_pcg_matches_single_device(self, rng):
        from orb_slam3_ros_tpu.ops import ba_pcg

        prob = toy_problem(rng)
        res_single = ba_pcg.bundle_adjust_pcg(prob, n_iters=4, n_cg=30)
        mesh = dist_ba.make_mesh(n_devices=8)
        res_dist = dist_ba.distributed_bundle_adjust_pcg(
            prob, mesh, n_iters=4, n_cg=30
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.cost), np.asarray(res_single.cost), rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.R), np.asarray(res_single.R), atol=1e-4
        )

    @pytest.mark.slow
    def test_realistic_gba_shape_equivalence(self, rng):
        """The pipeline's actual global-BA shape (K=64, P=8192, E=65536
        — BASELINE.md operational target) must run sharded on the
        8-device mesh AND agree with the single-device solve — not just
        return finite results."""
        import __graft_entry__ as g

        prob = g._toy_problem()  # defaults ARE the realistic shape
        mesh = dist_ba.make_mesh(n_devices=8)
        from orb_slam3_ros_tpu.ops import ba_pcg  # noqa: F401

        res = dist_ba.distributed_bundle_adjust_pcg(
            prob, mesh, n_iters=2, n_cg=20
        )
        assert np.isfinite(float(res.cost))
        res2 = dist_ba.distributed_bundle_adjust(prob, mesh, n_iters=2)
        assert np.isfinite(float(res2.cost))
        assert int(res2.n_inliers) > 60000
        # Equivalence vs the single-device Schur-LM at the same shape.
        res_single = ba.bundle_adjust(prob, n_iters=2)
        np.testing.assert_allclose(
            np.asarray(res2.cost), np.asarray(res_single.cost), rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res2.R), np.asarray(res_single.R), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(res2.t), np.asarray(res_single.t), atol=1e-3
        )


class TestDistributedInertial:
    """Sharded FullInertialBA + PGO must agree with single-device
    (VERDICT r4 missing #5: the post-closure hot solve on inertial maps,
    LoopClosing.cc:3611-3658 / Optimizer.cc:392)."""

    def _vi_problem(self, rng, n_kf=24, n_pts=512):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_viba import build_vi_problem
        from vi_sim import simulate_vi

        sim = simulate_vi(rng, n_kf=n_kf)
        prob, _X_gt = build_vi_problem(
            rng, sim, n_pts=n_pts, perturb=0.02, vel_perturb=0.05,
            bias_perturb=1e-3, pt_noise=0.02,
        )
        return prob

    def test_vi_ba_matches_single_device(self, rng):
        from orb_slam3_ros_tpu.ops import viba

        prob = self._vi_problem(rng)
        res_single = viba.vi_bundle_adjust(prob, n_iters=4)
        mesh = dist_ba.make_mesh(n_devices=8)
        res_dist = dist_ba.distributed_vi_bundle_adjust(prob, mesh, n_iters=4)
        np.testing.assert_allclose(
            np.asarray(res_dist.cost), np.asarray(res_single.cost), rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.states.p_wb),
            np.asarray(res_single.states.p_wb), atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.states.v_w),
            np.asarray(res_single.states.v_w), atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.X), np.asarray(res_single.X), atol=3e-3
        )

    def test_vi_sharding_actually_applied(self, rng):
        prob = self._vi_problem(rng, n_kf=8, n_pts=128)
        mesh = dist_ba.make_mesh(n_devices=8)
        sharded = dist_ba.shard_vi_problem(prob, mesh)
        assert not sharded.uv.sharding.is_fully_replicated
        assert not sharded.X.sharding.is_fully_replicated
        assert sharded.states.R_wb.sharding.is_fully_replicated

    def test_pgo_matches_single_device(self, rng):
        from orb_slam3_ros_tpu.ops import lie, pgo

        K, E = 64, 256
        # noisy ring + random covisibility edges, one loop constraint
        angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
        R = np.stack([
            np.asarray(lie.so3_exp(jnp.asarray(
                [0, 0, a + rng.normal() * 0.02], dtype=jnp.float32)))
            for a in angles
        ])
        t = np.stack([
            np.array([np.cos(a), np.sin(a), 0], np.float32)
            + rng.normal(size=3).astype(np.float32) * 0.05
            for a in angles
        ])
        s = np.ones(K, np.float32)
        e_i = rng.integers(0, K, size=E).astype(np.int32)
        e_j = (e_i + 1 + rng.integers(0, 3, size=E).astype(np.int32)) % K
        one = jnp.ones((), jnp.float32)
        eR, et, es = [], [], []
        for i, j in zip(e_i, e_j):
            Rm, tm, sm = lie.sim3_mul(
                jnp.asarray(R[j]), jnp.asarray(t[j]), one,
                *lie.sim3_inv(jnp.asarray(R[i]), jnp.asarray(t[i]), one),
            )
            eR.append(np.asarray(Rm)); et.append(np.asarray(tm))
            es.append(float(sm))
        prob = pgo.PGOProblem(
            R=jnp.asarray(R), t=jnp.asarray(t), s=jnp.asarray(s),
            kf_fixed=jnp.asarray(np.arange(K) == 0),
            kf_valid=jnp.ones(K, bool),
            e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
            e_R=jnp.asarray(np.stack(eR)), e_t=jnp.asarray(np.stack(et)),
            e_s=jnp.asarray(np.asarray(es, np.float32)),
            e_valid=jnp.ones(E, bool),
            e_weight=jnp.ones(E, jnp.float32),
        )
        res_single = pgo.optimize_pose_graph(prob, n_iters=6)
        mesh = dist_ba.make_mesh(n_devices=8)
        res_dist = dist_ba.distributed_pose_graph(prob, mesh, n_iters=6)
        np.testing.assert_allclose(
            np.asarray(res_dist.cost), np.asarray(res_single.cost),
            rtol=1e-3, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(res_dist.t), np.asarray(res_single.t), atol=1e-3
        )
