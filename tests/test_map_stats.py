"""MapPoint bookkeeping parity: distinctive descriptors (median Hamming,
MapPoint::ComputeDistinctiveDescriptors), viewing normal + scale-invariance
band (MapPoint::UpdateNormalAndDepth), and PredictScale-driven projection
gating (Frame::isInFrustum + MapPoint::PredictScale)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_ros_tpu.models import map_state, map_updates
from orb_slam3_ros_tpu.models.tracking import _project_points


def _tiny_map(K=4, N=8, P=4):
    return map_state.empty_map(K, N, P)


def _sign(bits):
    """256-bit descriptor as +-1 int8 from a seed list of flipped bits."""
    d = np.full((256,), 1, np.int8)
    d[list(bits)] = -1
    return d


class TestDistinctiveDescriptor:
    def test_median_hamming_winner(self):
        m = _tiny_map()
        # Point 0 observed in KFs 0-3 at feature 0 with descriptors
        # A, B, B, C: B's row of pairwise distances has median 0 while
        # A's and C's have median 10 -> B is the distinctive descriptor
        # (the reference's min-median scan, MapPoint.cc
        # ComputeDistinctiveDescriptors).
        A = _sign(range(0, 10))
        B = _sign([])
        C = _sign(range(10, 20))
        desc = np.array(m.kf_desc_sign)
        desc[0, 0], desc[1, 0], desc[2, 0], desc[3, 0] = A, B, B, C
        obs = np.array(m.kf_obs)
        obs[0, 0] = obs[1, 0] = obs[2, 0] = obs[3, 0] = 0
        fv = np.array(m.kf_feat_valid)
        fv[0, 0] = fv[1, 0] = fv[2, 0] = fv[3, 0] = True
        m = m._replace(
            kf_valid=jnp.asarray([True, True, True, True]),
            kf_desc_sign=jnp.asarray(desc),
            kf_obs=jnp.asarray(obs),
            kf_feat_valid=jnp.asarray(fv),
            pt_valid=m.pt_valid.at[0].set(True),
            pt_X=m.pt_X.at[0].set(jnp.asarray([0.0, 0.0, 2.0])),
        )
        m2 = map_updates.refresh_point_stats(m)
        np.testing.assert_array_equal(np.asarray(m2.pt_desc_sign[0]), B)
        # untouched points keep their descriptor
        np.testing.assert_array_equal(
            np.asarray(m2.pt_desc_sign[1]), np.asarray(m.pt_desc_sign[1])
        )


class TestNormalAndDepth:
    def test_normal_and_band(self):
        m = _tiny_map()
        # Two KFs at x=+-1 looking at a point at z=2 on the axis: the mean
        # viewing direction is +z; the band comes from KF0 (first observer)
        # at level 2.
        t0 = np.asarray([-(-1.0), 0.0, 0.0], np.float32)  # t = -R C, C=(-1,0,0)
        t1 = np.asarray([-(1.0), 0.0, 0.0], np.float32)
        obs = np.array(m.kf_obs)
        obs[0, 0] = obs[1, 3] = 0
        fv = np.array(m.kf_feat_valid)
        fv[0, 0] = fv[1, 3] = True
        lvl = np.array(m.kf_level)
        lvl[0, 0] = 2
        m = m._replace(
            kf_valid=jnp.asarray([True, True, False, False]),
            kf_t=m.kf_t.at[0].set(jnp.asarray(t0)).at[1].set(jnp.asarray(t1)),
            kf_obs=jnp.asarray(obs),
            kf_feat_valid=jnp.asarray(fv),
            kf_level=jnp.asarray(lvl),
            pt_valid=m.pt_valid.at[0].set(True),
            pt_X=m.pt_X.at[0].set(jnp.asarray([0.0, 0.0, 2.0])),
        )
        m2 = map_updates.refresh_point_stats(m, scale=1.2, n_levels=8)
        n = np.asarray(m2.pt_normal[0])
        assert n[2] > 0.99 and abs(n[0]) < 1e-5, n
        d_ref = np.sqrt(1.0 + 4.0)  # distance from KF0 center (-1,0,0)
        assert abs(float(m2.pt_max_dist[0]) - d_ref * 1.2**2) < 1e-4
        assert abs(
            float(m2.pt_min_dist[0]) - d_ref * 1.2**2 / 1.2**7
        ) < 1e-4
        # invalid point stays unset
        assert float(m2.pt_max_dist[1]) == 0.0


class TestPredictScaleGating:
    def _map_with_band(self, max_dist, level0_dist=None):
        m = _tiny_map()
        m = m._replace(
            pt_valid=m.pt_valid.at[0].set(True),
            pt_X=m.pt_X.at[0].set(jnp.asarray([0.0, 0.0, level0_dist or max_dist])),
            pt_normal=m.pt_normal.at[0].set(jnp.asarray([0.0, 0.0, 1.0])),
            pt_max_dist=m.pt_max_dist.at[0].set(max_dist),
            pt_min_dist=m.pt_min_dist.at[0].set(max_dist / 1.2**7),
        )
        return m

    def _project(self, m):
        cam = jnp.asarray([100.0, 100.0, 160.0, 120.0])
        return _project_points(
            m, jnp.eye(3), jnp.zeros(3), cam, 320, 240, scale=1.2,
            predict_scale=True,
        )

    def test_level_zero_at_max_dist(self):
        m = self._map_with_band(4.0, level0_dist=4.0)
        _, ok, lvl = self._project(m)
        assert bool(ok[0])
        assert int(lvl[0]) == 0

    def test_higher_level_when_closer(self):
        # distance max/1.2^3 -> predicted level 3 (ceil(log ratio / log s))
        m = self._map_with_band(4.0, level0_dist=4.0 / 1.2**3)
        _, ok, lvl = self._project(m)
        assert bool(ok[0])
        assert int(lvl[0]) == 3

    def test_band_gate_rejects_out_of_range(self):
        m = self._map_with_band(4.0, level0_dist=4.0 * 1.5)  # beyond 1.2x max
        _, ok, _ = self._project(m)
        assert not bool(ok[0])

    def test_view_angle_gate(self):
        m = self._map_with_band(4.0, level0_dist=4.0)
        m = m._replace(pt_normal=m.pt_normal.at[0].set(jnp.asarray([0.0, 0.0, -1.0])))
        _, ok, _ = self._project(m)
        assert not bool(ok[0])

    def test_unset_band_passes(self):
        m = _tiny_map()
        m = m._replace(
            pt_valid=m.pt_valid.at[0].set(True),
            pt_X=m.pt_X.at[0].set(jnp.asarray([0.0, 0.0, 3.0])),
            pt_level=m.pt_level.at[0].set(2),
        )
        _, ok, lvl = self._project(m)
        assert bool(ok[0])
        assert int(lvl[0]) == 2  # falls back to creation octave
