"""Place recognition at scale: two-level (hierarchically trained)
vocabulary + aliased-scene discrimination (VERDICT r2 #7; reference:
DBoW2 TemplatedVocabulary.h:1078-1255, KeyFrameDatabase.cc:604)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.ops import orb, retrieval
from orb_slam3_ros_tpu.utils import synth


@pytest.fixture(scope="module")
def two_rooms():
    """Per-frame descriptor sets from two DIFFERENT rooms (texture seeds)
    rendered along the same trajectory — the aliasing scenario: similar
    global statistics, different places."""
    cfg = orb.default_config(240, 376, n_features=600)
    ext = jax.jit(lambda im: orb.extract(im, cfg))

    def frames_of(seed):
        seq = synth.make_sequence(n_frames=10, height=240, width=376,
                                  dt=0.1, seed=seed)
        out = []
        for im in seq.images:
            f = ext(jnp.asarray(im, jnp.float32))
            out.append((np.asarray(f.desc_sign), np.asarray(f.valid)))
        return out

    return frames_of(3), frames_of(11)


class TestHierVocabulary:
    def test_shapes_and_fallbacks(self, rng):
        d = rng.choice([-1, 1], size=(4000, 256)).astype(np.int8)
        v = retrieval.train_vocabulary_hier(d, n_words=1024, branching=128)
        assert v.shape == (1024, 256)
        assert set(np.unique(v)) <= {-1, 1}
        # Tiny sample: flat fallback still returns a usable vocabulary.
        v2 = retrieval.train_vocabulary_hier(d[:40], n_words=1024)
        assert v2.shape[1] == 256 and v2.shape[0] >= 32

    def test_quantization_beats_small_vocab(self, two_rooms):
        """More (well-trained) words must separate the two rooms at
        least as well as the 512-word flat vocabulary: the margin
        between same-room-revisit similarity and best cross-room
        similarity must not shrink."""
        room_a, room_b = two_rooms
        train = np.concatenate(
            [d[v] for d, v in room_a[:5]] + [d[v] for d, v in room_b[:5]]
        )

        def margin(vocab):
            vocab = jnp.asarray(vocab)

            def sig(d, v):
                return np.asarray(
                    retrieval.signature(jnp.asarray(d), jnp.asarray(v), vocab)
                )

            sa = [sig(d, v) for d, v in room_a]
            sb = [sig(d, v) for d, v in room_b]
            # query: a late room-A frame against early A frames vs all B
            q = sa[8]
            same = max(float(q @ s) for s in sa[:5])
            cross = max(float(q @ s) for s in sb)
            return same, cross

        flat = retrieval.train_vocabulary(train, n_words=512)
        hier = retrieval.train_vocabulary_hier(
            train, n_words=2048, branching=128
        )
        same_f, cross_f = margin(flat)
        same_h, cross_h = margin(hier)
        assert same_h > cross_h, (same_h, cross_h)
        assert (same_h - cross_h) >= 0.8 * (same_f - cross_f), (
            (same_h, cross_h), (same_f, cross_f)
        )


class TestDefaultVocabulary:
    """The shipped pretrained vocabulary (scripts/train_default_vocab.py,
    the reference's offline-ORBvoc role, System.cc:114) must exist, load
    by default, and discriminate places on scenes it never saw —
    cold-start retrieval without ``train_vocabulary_from_map``."""

    def test_ships_and_loads_by_default(self):
        v = retrieval.default_vocabulary()
        assert v is not None, "default_vocab.npz missing from the package"
        assert v.shape[1] == 256 and v.shape[0] >= 512
        assert set(np.unique(v)) <= {-1, 1}
        from orb_slam3_ros_tpu.models.system import MonoSlam

        cam = np.asarray([200.0, 200.0, 96.0, 64.0, 0, 0, 0, 0, 0],
                         np.float32)
        s = MonoSlam(height=128, width=192, cam_params=cam, n_features=200,
                     max_keyframes=8, max_points=256,
                     enable_loop_closing=True)
        assert s.vocab is not None and s.vocab.shape == v.shape
        assert s.loop_closer.vocab is not None

    def test_cold_start_discrimination_on_unseen_scenes(self, two_rooms):
        """On rooms OUTSIDE the training corpus (seeds 3/11 vs the
        trained 20..27), the pretrained vocabulary must separate a
        same-room revisit from the best cross-room alias at least as
        well as the random anchors the cold start otherwise uses."""
        room_a, room_b = two_rooms

        def margin(vocab):
            def sig(d, v):
                return np.asarray(retrieval.signature(
                    jnp.asarray(d), jnp.asarray(v),
                    jnp.asarray(vocab) if vocab is not None else None,
                ))

            sa = [sig(d, v) for d, v in room_a]
            sb = [sig(d, v) for d, v in room_b]
            q = sa[8]
            same = max(float(q @ s) for s in sa[:5])
            cross = max(float(q @ s) for s in sb)
            return same - cross

        m_default = margin(retrieval.default_vocabulary())
        m_anchors = margin(None)
        assert m_default > 0, f"default vocab margin {m_default:.3f}"
        assert m_default >= m_anchors - 0.02, (m_default, m_anchors)


@pytest.mark.slow
class TestThresholdCalibration:
    """Data-driven calibration of the loop-closer's ``min_score``
    (VERDICT r3 #9): across several aliased scene pairs and a corridor
    revisit, the default must sit INSIDE the separation band — above
    every false-place score (zero false candidates) and below the true
    revisit scores (true revisits retained). The reference gates
    candidates relative to the covisible-neighbor minimum score
    (KeyFrameDatabase.cc:604-733); this fixed-threshold calibration is
    the equivalent guard for the per-session-trained vocabulary."""

    # The shipped default (models/loop_closing.py LoopCloser): this
    # calibration MOVED it — round-3's 0.15 sat BELOW the measured
    # false-place ceiling (0.254 across the aliased pairs).
    from orb_slam3_ros_tpu.models.loop_closing import LoopCloser as _LC
    DEFAULT_MIN_SCORE = _LC.__init__.__defaults__[1]

    def test_min_score_inside_separation_band(self):
        cfg = orb.default_config(240, 376, n_features=600)
        ext = jax.jit(lambda im: orb.extract(im, cfg))

        def descs(seed, n=12, trajectory="orbit"):
            seq = synth.make_sequence(
                n_frames=n, height=240, width=376, dt=0.1, seed=seed,
                trajectory=trajectory,
            )
            out = []
            for im in seq.images:
                f = ext(jnp.asarray(im, jnp.float32))
                out.append((np.asarray(f.desc_sign), np.asarray(f.valid)))
            return out

        # Three aliased pairs (same trajectory, different room textures)
        # + one long corridor-style revisit (loop trajectory: the end
        # re-observes the start).
        pairs = [(3, 11), (5, 17), (7, 23)]
        rooms = {s: descs(s) for s in {x for p in pairs for x in p}}
        corridor = descs(31, n=40, trajectory="loop")

        true_scores, false_scores = [], []
        for sa, sb in pairs:
            ra, rb = rooms[sa], rooms[sb]
            train = np.concatenate(
                [d[v] for d, v in ra[:6]] + [d[v] for d, v in rb[:6]]
            )
            vocab = jnp.asarray(
                retrieval.train_vocabulary_hier(train, n_words=2048)
            )

            def sig(d, v):
                return np.asarray(retrieval.signature(
                    jnp.asarray(d), jnp.asarray(v), vocab
                ))

            siga = [sig(d, v) for d, v in ra]
            sigb = [sig(d, v) for d, v in rb]
            q = siga[-1]  # late room-A frame
            # True revisit: early same-room frames (enforce temporal gap).
            true_scores.append(max(float(q @ s) for s in siga[:6]))
            # False places: every other-room frame.
            false_scores.append(max(float(q @ s) for s in sigb))
        # Corridor: end-of-loop frame vs its genuine revisit at the start
        # AND vs the (different-looking) middle section.
        train = np.concatenate([d[v] for d, v in corridor[::4]])
        vocab = jnp.asarray(
            retrieval.train_vocabulary_hier(train, n_words=2048)
        )

        def sig(d, v):
            return np.asarray(retrieval.signature(
                jnp.asarray(d), jnp.asarray(v), vocab
            ))

        sigs = [sig(d, v) for d, v in corridor]
        q = sigs[-1]
        true_scores.append(max(float(q @ s) for s in sigs[:5]))

        lo = max(false_scores)  # must stay BELOW threshold
        hi = min(true_scores)  # must stay ABOVE threshold
        assert lo < hi, (
            f"no separation band: false up to {lo:.3f}, true down to {hi:.3f}"
        )
        assert lo < self.DEFAULT_MIN_SCORE < hi, (
            f"min_score={self.DEFAULT_MIN_SCORE} outside data band "
            f"({lo:.3f}, {hi:.3f}) — recalibrate LoopCloser.min_score"
        )

    def test_no_cross_room_candidates(self, two_rooms):
        """detect_candidates with the closure-time score bar must yield
        ZERO candidates from the other room for every query frame, while
        a genuine revisit (same room, disjoint trajectory segment) still
        clears the bar."""
        room_a, room_b = two_rooms
        train = np.concatenate(
            [d[v] for d, v in room_a[:5]] + [d[v] for d, v in room_b[:5]]
        )
        vocab = jnp.asarray(
            retrieval.train_vocabulary_hier(train, n_words=2048)
        )
        sigs_a = jnp.stack([
            retrieval.signature(jnp.asarray(d), jnp.asarray(v), vocab)
            for d, v in room_a
        ])
        sigs_b = jnp.stack([
            retrieval.signature(jnp.asarray(d), jnp.asarray(v), vocab)
            for d, v in room_b
        ])
        db = jnp.concatenate([sigs_a[:5], sigs_b])  # 5 A-frames + 10 B
        valid = jnp.ones((db.shape[0],), bool)
        excl = jnp.zeros((db.shape[0],), bool)
        min_score = self.DEFAULT_MIN_SCORE  # LoopCloser default bar
        hits_b = 0
        revisit_ok = 0
        for qi in range(6, 10):  # late room-A frames as queries
            ids, scores = retrieval.detect_candidates(
                sigs_a[qi], db, valid, excl, min_common_score=min_score
            )
            ids = np.asarray(jax.device_get(ids))
            for c in ids:
                if c >= 5:
                    hits_b += 1
            if any(0 <= c < 5 for c in ids):
                revisit_ok += 1
        assert hits_b == 0, f"{hits_b} cross-room candidates cleared the bar"
        assert revisit_ok >= 3, "true revisit no longer detected"
