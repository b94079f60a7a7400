"""Tests for the ORB-style feature front-end and matching kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.ops import fast, hamming, matching, orb, pyramid
from orb_slam3_ros_tpu.utils import synth


@pytest.fixture(scope="module")
def seq():
    return synth.make_sequence(n_frames=3, height=240, width=376, dt=0.08)


@pytest.fixture(scope="module")
def config():
    return orb.default_config(240, 376, n_features=600)


@pytest.fixture(scope="module")
def feats(seq, config):
    ex = jax.jit(lambda im: orb.extract(im, config))
    return [jax.tree.map(np.asarray, ex(jnp.asarray(im))) for im in seq.images]


class TestFast:
    def test_detects_synthetic_corners(self):
        # A grid of bright dots on dark background -> FAST fires on dots.
        img = np.zeros((120, 160), np.float32)
        ys, xs = np.mgrid[30:100:20, 30:150:20]
        img[ys, xs] = 200.0
        img[ys + 1, xs] = 200.0
        img[ys, xs + 1] = 200.0
        img[ys + 1, xs + 1] = 200.0
        xy, resp, valid = fast.detect_grid(jnp.asarray(img), max_kp=64, cell=16)
        xy, valid = np.asarray(xy), np.asarray(valid)
        found = xy[valid]
        assert valid.sum() >= 15, f"only {valid.sum()} corners"
        # every dot with margin from border should be found within 2 px
        dots = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
        dots = dots[
            (dots[:, 0] > 19) & (dots[:, 0] < 160 - 20)
            & (dots[:, 1] > 19) & (dots[:, 1] < 120 - 20)
        ]
        d = np.linalg.norm(dots[:, None, :] - found[None, :, :], axis=-1).min(1)
        assert (d <= 2.0).mean() > 0.9

    def test_no_corners_on_flat(self):
        img = jnp.full((120, 160), 100.0)
        _, _, valid = fast.detect_grid(img, max_kp=64, cell=16)
        assert int(jnp.sum(valid)) == 0

    def test_border_respected(self, seq, config):
        xy, resp, valid = fast.detect_grid(jnp.asarray(seq.images[0]), max_kp=256, cell=20)
        xy, valid = np.asarray(xy), np.asarray(valid)
        f = xy[valid]
        assert (f[:, 0] >= 19).all() and (f[:, 1] >= 19).all()
        assert (f[:, 0] < 376 - 19).all() and (f[:, 1] < 240 - 19).all()


class TestExtractor:
    def test_counts_and_spread(self, feats, config):
        f = feats[0]
        n = f.valid.sum()
        assert n > 0.5 * config.total_cap, f"only {n}/{config.total_cap} features"
        # spatial spread: features in all 4 image quadrants
        v = f.xy[f.valid]
        assert ((v[:, 0] < 188) & (v[:, 1] < 120)).sum() > 10
        assert ((v[:, 0] >= 188) & (v[:, 1] < 120)).sum() > 10
        assert ((v[:, 0] < 188) & (v[:, 1] >= 120)).sum() > 10
        assert ((v[:, 0] >= 188) & (v[:, 1] >= 120)).sum() > 10

    def test_multi_level(self, feats):
        f = feats[0]
        lv = f.level[f.valid]
        assert len(np.unique(lv)) >= 4

    def test_descriptor_determinism(self, seq, config):
        ex = jax.jit(lambda im: orb.extract(im, config))
        f1 = ex(jnp.asarray(seq.images[0]))
        f2 = ex(jnp.asarray(seq.images[0]))
        np.testing.assert_array_equal(np.asarray(f1.desc_packed), np.asarray(f2.desc_packed))

    def test_pack_sign_consistency(self, feats):
        f = feats[0]
        # hamming from packed XOR+popcount must equal matmul version
        a = jnp.asarray(f.desc_packed[:50])
        s = jnp.asarray(f.desc_sign[:50])
        d_mat = np.asarray(hamming.hamming_matrix(s, s))
        d_pack = np.asarray(
            hamming.hamming_packed(a[:, None, :], a[None, :, :])
        )
        valid = f.valid[:50]
        m = valid[:, None] & valid[None, :]
        np.testing.assert_array_equal(d_mat[m], d_pack[m])
        assert (np.diag(d_mat)[valid] == 0).all()


@pytest.mark.slow
class TestBatchedExtractParity:
    """The level-batched ``extract`` must reproduce the per-level loop
    (``extract_looped``): identical detection/orientation, and descriptors
    equal up to blur-boundary effects on border keypoints."""

    @pytest.mark.parametrize("n_features", [600, 1200])
    def test_bit_exact(self, seq, n_features):
        config = orb.default_config(240, 376, n_features=n_features)
        img = jnp.asarray(seq.images[0])
        fb = jax.tree.map(np.asarray, orb.extract(img, config))
        fl = jax.tree.map(np.asarray, orb.extract_looped(img, config))
        np.testing.assert_array_equal(fb.valid, fl.valid)
        v = fb.valid
        np.testing.assert_array_equal(fb.level[v], fl.level[v])
        np.testing.assert_array_equal(fb.xy[v], fl.xy[v])
        np.testing.assert_array_equal(fb.response[v], fl.response[v])
        np.testing.assert_array_equal(fb.angle[v], fl.angle[v])
        # Descriptors may differ only where a keypoint's blur window
        # crosses the level edge (canvas replicate vs image reflect);
        # in practice none do on this data.
        np.testing.assert_array_equal(fb.desc_packed[v], fl.desc_packed[v])


class TestMatching:
    def test_match_consecutive_frames(self, feats):
        f0 = jax.tree.map(jnp.asarray, feats[0])
        f1 = jax.tree.map(jnp.asarray, feats[1])
        idx, dist = matching.search_for_initialization(f0, f1, window=80.0)
        idx = np.asarray(idx)
        n = (idx >= 0).sum()
        assert n >= 30, f"only {n} init matches"

    def test_matches_are_geometrically_consistent(self, feats, seq):
        """Matched features should displace coherently (small median flow
        error vs the dominant motion)."""
        f0 = jax.tree.map(jnp.asarray, feats[0])
        f1 = jax.tree.map(jnp.asarray, feats[1])
        idx, _ = matching.search_for_initialization(f0, f1, window=80.0)
        idx = np.asarray(idx)
        m = idx >= 0
        flow = np.asarray(f1.xy)[idx[m]] - np.asarray(f0.xy)[m]
        med = np.median(flow, axis=0)
        frac_consistent = (np.linalg.norm(flow - med, axis=-1) < 20).mean()
        assert frac_consistent > 0.7, frac_consistent

    def test_self_match_identity(self, feats):
        f0 = jax.tree.map(jnp.asarray, feats[0])
        idx, dist = matching.search_frame_frame(f0, f0, ratio=1.0)
        idx = np.asarray(idx); valid = np.asarray(f0.valid)
        m = idx >= 0
        # nearly all valid features match themselves at distance 0
        agree = (idx[m] == np.arange(len(idx))[m]).mean()
        assert agree > 0.95
        assert m.sum() > 0.8 * valid.sum()

    def test_mutual_nn_respects_mask(self):
        rng = np.random.default_rng(0)
        d = jnp.asarray(rng.integers(0, 200, size=(8, 8)).astype(np.int32))
        mask = jnp.zeros((8, 8), bool)
        idx, dist = hamming.mutual_nn(d, mask, max_dist=256)
        assert (np.asarray(idx) == -1).all()

    def test_rotation_consistency_filters_outliers(self):
        n = 100
        rng = np.random.default_rng(1)
        ang_q = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        ang_t = ang_q + 0.3  # coherent rotation
        out = rng.choice(n, 10, replace=False)
        # incoherent outliers: random angle offsets (spread across bins, as
        # real mismatches are — a *coherent* second mode would rightly be
        # kept by the reference's top-3-bins rule)
        ang_t[out] += rng.uniform(0.5, 2 * np.pi - 0.5, 10)
        idx = jnp.arange(n, dtype=jnp.int32)
        kept = np.asarray(
            matching.rotation_consistency(
                jnp.asarray(ang_q), jnp.asarray(ang_t), idx
            )
        )
        assert (kept[out] == -1).mean() > 0.8
        inl = np.setdiff1d(np.arange(n), out)
        assert (kept[inl] >= 0).mean() > 0.9


class TestPyramid:
    def test_shapes(self):
        shapes = pyramid.level_shapes(480, 752, 8, 1.2)
        assert shapes[0] == (480, 752)
        assert all(
            shapes[i][0] > shapes[i + 1][0] and shapes[i][1] > shapes[i + 1][1]
            for i in range(7)
        )

    def test_blur_preserves_mean(self, seq):
        img = jnp.asarray(seq.images[0])
        b = pyramid.gaussian_blur(img)
        assert abs(float(jnp.mean(b)) - float(jnp.mean(img))) < 1.0
