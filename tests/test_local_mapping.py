"""Unit tests for the LocalMapping maintenance kernels: duplicate-landmark
fusion across covisible keyframes (SearchInNeighbors role) and redundant
keyframe culling (KeyFrameCulling role)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_ros_tpu.models import map_state as ms
from orb_slam3_ros_tpu.models import map_updates
from orb_slam3_ros_tpu.ops import cameras

CAM = jnp.asarray([100.0, 100.0, 188.0, 120.0, 0, 0, 0, 0, 0], jnp.float32)
W, H = 376, 240


def _rand_desc(rng, n):
    return (rng.integers(0, 2, size=(n, 256)).astype(np.int8) * 2 - 1)


def _make_map(K=6, N=32, P=64, seed=0):
    rng = np.random.default_rng(seed)
    m = ms.empty_map(K, N, P)
    # world points in front of all cameras (z ~ 4-6)
    X = np.stack(
        [
            rng.uniform(-1.2, 1.2, 16),
            rng.uniform(-0.8, 0.8, 16),
            rng.uniform(4.0, 6.0, 16),
        ],
        axis=1,
    ).astype(np.float32)
    desc = _rand_desc(rng, 16)
    return m, X, desc, rng


def _bind(m, kf, feat, pt, X_w, desc, level=0):
    """Place a feature at the projection of X_w in keyframe kf and bind it
    to point slot pt (pt=-1 leaves the feature free)."""
    Xc = np.asarray(m.kf_R[kf]) @ X_w + np.asarray(m.kf_t[kf])
    uv = np.asarray(cameras.pinhole_project_nodist(CAM, jnp.asarray(Xc)))
    return m._replace(
        kf_xy=m.kf_xy.at[kf, feat].set(jnp.asarray(uv)),
        kf_level=m.kf_level.at[kf, feat].set(level),
        kf_desc_sign=m.kf_desc_sign.at[kf, feat].set(jnp.asarray(desc)),
        kf_feat_valid=m.kf_feat_valid.at[kf, feat].set(True),
        kf_obs=m.kf_obs.at[kf, feat].set(pt),
    )


def _add_point(m, pt, X_w, desc, first_kf=0):
    return m._replace(
        pt_valid=m.pt_valid.at[pt].set(True),
        pt_X=m.pt_X.at[pt].set(jnp.asarray(X_w)),
        pt_desc_sign=m.pt_desc_sign.at[pt].set(jnp.asarray(desc)),
        pt_first_kf=m.pt_first_kf.at[pt].set(first_kf),
    )


class TestFuseInNeighbors:
    def test_merge_and_bind(self):
        m, X, desc, rng = _make_map()
        # KF0 (unused filler), KF1 at origin, KF2 translated slightly.
        m = m._replace(
            kf_valid=m.kf_valid.at[:3].set(True),
            kf_t=m.kf_t.at[2].set(jnp.asarray([0.05, 0.0, 0.0])),
        )
        # Shared landmarks 0..7 seen by both KF1 and KF2 -> covisibility.
        for p in range(8):
            m = _add_point(m, p, X[p], desc[p], first_kf=1)
            m = _bind(m, 1, p, p, X[p], desc[p])
            m = _bind(m, 2, p, p, X[p], desc[p])
        # Duplicate pair: slots 8 (bound in KF1) and 9 (bound in KF2)
        # are the same physical point.
        m = _add_point(m, 8, X[8], desc[8], first_kf=1)
        m = _add_point(m, 9, X[8], desc[8], first_kf=2)
        m = _bind(m, 1, 8, 8, X[8], desc[8])
        m = _bind(m, 2, 9, 9, X[8], desc[8])
        # Bind-case: slot 10 bound only in KF2; KF1 has a FREE feature at
        # its projection with a matching descriptor.
        m = _add_point(m, 10, X[10], desc[10], first_kf=2)
        m = _bind(m, 2, 10, 10, X[10], desc[10])
        m = _bind(m, 1, 10, -1, X[10], desc[10])

        m2, n_fused = map_updates.fuse_in_neighbors(
            m, jnp.asarray(2), CAM, W, H, n_neighbors=1
        )
        assert int(n_fused) >= 2
        pv = np.asarray(m2.pt_valid)
        # Exactly one of the duplicate pair survives; observations merged.
        assert pv[8] != pv[9]
        survivor = 8 if pv[8] else 9
        obs = np.asarray(ms.obs_matrix(m2)).astype(int)
        assert obs[1, survivor] == 1 and obs[2, survivor] == 1
        # Bind case: KF1 now observes landmark 10.
        assert obs[1, 10] == 1
        # Shared landmarks untouched.
        assert pv[:8].all()

    def test_noop_without_covisibility(self):
        m, X, desc, _ = _make_map()
        m = m._replace(kf_valid=m.kf_valid.at[:2].set(True))
        # KF0 and KF1 observe disjoint landmark sets far apart.
        m = _add_point(m, 0, X[0], desc[0], first_kf=0)
        m = _bind(m, 0, 0, 0, X[0], desc[0])
        m2, n_fused = map_updates.fuse_in_neighbors(
            m, jnp.asarray(1), CAM, W, H, n_neighbors=1
        )
        assert int(n_fused) == 0
        np.testing.assert_array_equal(
            np.asarray(m2.kf_obs), np.asarray(m.kf_obs)
        )


class TestCullKeyframes:
    def test_redundant_kf_culled(self):
        m, X, desc, _ = _make_map(K=8)
        n_kf = 6
        m = m._replace(kf_valid=m.kf_valid.at[:n_kf].set(True))
        # Landmarks 0..7 observed by KFs 0,1,3,4 (four observers) AND by
        # KF2 -> every KF2 observation has >=3 other same-level observers.
        for p in range(8):
            m = _add_point(m, p, X[p], desc[p])
            for k in (0, 1, 2, 3, 4):
                m = _bind(m, k, p, p, X[p], desc[p])
        # KF1 additionally holds a private landmark -> 8/9 < 0.9 keeps it.
        m = _add_point(m, 8, X[8], desc[8])
        m = _bind(m, 1, 8, 8, X[8], desc[8])

        m2, n_culled = map_updates.cull_keyframes(
            m, jnp.asarray(n_kf), protect_last=2
        )
        kv = np.asarray(m2.kf_valid)
        assert int(n_culled) == 1  # at most one per call
        assert not kv[2]  # the fully redundant one (lowest qualifying id)
        assert kv[[0, 1, 3, 4, 5]].all()
        # its observations are dropped
        assert (np.asarray(m2.kf_obs)[2] == -1).all()

    def test_finer_scale_observers_required(self):
        """Observers at a coarser octave must NOT count toward redundancy."""
        m, X, desc, _ = _make_map(K=8)
        n_kf = 6
        m = m._replace(kf_valid=m.kf_valid.at[:n_kf].set(True))
        for p in range(8):
            m = _add_point(m, p, X[p], desc[p])
            m = _bind(m, 2, p, p, X[p], desc[p], level=0)
            # other observers see it 3 octaves coarser (level 3 > 0+1)
            for k in (0, 1, 3, 4):
                m = _bind(m, k, p, p, X[p], desc[p], level=3)
        m2, _ = map_updates.cull_keyframes(
            m, jnp.asarray(n_kf), protect_last=2
        )
        # KF2 must survive: its coarse observers don't count toward its
        # redundancy (they, being mutually redundant at level 3, are fair
        # game — only KF2's survival is asserted).
        assert np.asarray(m2.kf_valid)[2]


class TestDenseGatherEquivalence:
    """The TPU-friendly compare-reduce formulations must match the
    scatter formulations exactly."""

    def _busy_map(self):
        m, X, desc, rng = _make_map(K=6, N=32, P=64, seed=3)
        m = m._replace(kf_valid=m.kf_valid.at[:5].set(True))
        for p in range(12):
            m = _add_point(m, p, X[p % 16], desc[p % 16], first_kf=p % 3)
            for k in range(5):
                if (p + k) % 3 != 0:
                    m = _bind(m, k, (p * 2 + k) % 32, p, X[p % 16],
                              desc[p % 16], level=(p + k) % 8)
        return m

    def test_obs_matrix(self):
        m = self._busy_map()
        a = np.asarray(ms.obs_matrix(m, dense=False))
        b = np.asarray(ms.obs_matrix(m, dense=True))
        np.testing.assert_array_equal(a, b)

    def test_refresh_point_stats(self):
        m = self._busy_map()
        a = map_updates.refresh_point_stats(m, dense=False)
        b = map_updates.refresh_point_stats(m, dense=True)
        for name in ("pt_desc_sign", "pt_normal", "pt_min_dist", "pt_max_dist"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                atol=1e-5, err_msg=name,
            )

    def test_cull_keyframes(self):
        m = self._busy_map()
        a, na = map_updates.cull_keyframes(m, jnp.asarray(5), dense=False)
        b, nb = map_updates.cull_keyframes(m, jnp.asarray(5), dense=True)
        assert int(na) == int(nb)
        np.testing.assert_array_equal(
            np.asarray(a.kf_valid), np.asarray(b.kf_valid)
        )


class TestCovisWindow:
    """select_covis_window: the local-BA window must follow covisibility,
    not time (Optimizer.cc:1120-1210) — the round-2 fix for revisits."""

    def _revisit_map(self):
        """10 KFs, 60 points: KF9 (the 'revisit') shares points with KFs
        0-2 only; KFs 3-8 observe a disjoint set."""
        import jax
        from orb_slam3_ros_tpu.models import local_mapping

        K, N, P = 12, 16, 64
        m = ms.empty_map(K, N, P)
        kf_valid = np.zeros(K, bool)
        kf_valid[:10] = True
        obs = np.full((K, N), -1, np.int32)
        fv = np.zeros((K, N), bool)
        # group A: points 0-15 seen by KFs 0,1,2 and the revisit KF 9
        for k in (0, 1, 2, 9):
            obs[k, :16] = np.arange(16)
            fv[k, :16] = True
        # group B: points 16-31 seen by KFs 3..8
        for k in range(3, 9):
            obs[k, :16] = np.arange(16, 32)
            fv[k, :16] = True
        pt_valid = np.zeros(P, bool)
        pt_valid[:32] = True
        return m._replace(
            kf_valid=jnp.asarray(kf_valid),
            kf_obs=jnp.asarray(obs),
            kf_feat_valid=jnp.asarray(fv),
            pt_valid=jnp.asarray(pt_valid),
        )

    def test_revisit_window_picks_old_keyframes(self):
        from orb_slam3_ros_tpu.models import local_mapping

        m = self._revisit_map()
        ids, fixed, ok = local_mapping.select_covis_window(
            m, jnp.asarray(9), 4, 4
        )
        ids, fixed, ok = map(np.asarray, (ids, fixed, ok))
        free = set(ids[:4][ok[:4] & ~fixed[:4]].tolist())
        fixed_live = set(ids[ok & fixed].tolist())
        # Free set: the revisit KF + its covisible OLD neighbors (1, 2;
        # 0 is demoted to fixed as the gauge root).
        assert 9 in free
        assert free <= {9, 1, 2}
        assert 0 in fixed_live  # gauge root fixed
        # The temporally-recent but covisibility-disjoint KFs 3-8 must
        # not enter the free set.
        assert not (free & set(range(3, 9)))

    def test_dead_entries_masked(self):
        from orb_slam3_ros_tpu.models import local_mapping

        m = self._revisit_map()
        # Window wider than the covisible set: extra slots must be dead.
        ids, fixed, ok = local_mapping.select_covis_window(
            m, jnp.asarray(9), 8, 6
        )
        ok = np.asarray(ok)
        assert int(ok[:8].sum()) == 4  # 9 + {0,1,2}
        # No live fixed candidates beyond group-B observers of A-points:
        # group B shares no points with the free set -> all fixed entries
        # dead.
        assert int(ok[8:].sum()) == 0

    def test_gauge_always_two_anchors(self):
        from orb_slam3_ros_tpu.models import local_mapping
        from orb_slam3_ros_tpu.ops import ba
        from orb_slam3_ros_tpu.models import local_mapping as lm

        m = self._revisit_map()
        ids, fixed, ok = local_mapping.select_covis_window(
            m, jnp.asarray(9), 4, 4
        )
        n_anchor = int(np.asarray(ok & fixed).sum())
        assert n_anchor >= 2
