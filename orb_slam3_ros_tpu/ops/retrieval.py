"""Place-recognition retrieval: visual-word signatures + similarity
scoring on the MXU.

Role of the reference's DBoW2 vocabulary + ``KeyFrameDatabase`` inverted
file (orb_slam3/Thirdparty/DBoW2/, orb_slam3/src/KeyFrameDatabase.cc:
DetectNBestCandidates :604, DetectRelocalizationCandidates :733). The
reference's ORB vocabulary binary is a missing large blob
(.MISSING_LARGE_BLOBS), and a tree-descent + inverted file is a poor fit
for TPU anyway. TPU-native replacement:

- a **random anchor vocabulary**: A fixed +-1 anchor descriptors; the
  visual word of a descriptor is its nearest anchor, found for ALL
  descriptors of a frame with one [N, 256] x [256, A] matmul (the MXU
  replaces the k-ary tree descent; an anchor = a leaf word).
- a keyframe **signature** is the L2-normalized tf histogram of its
  words; similarity of two signatures is their dot product, so scoring
  one query against every keyframe is one [K, A] @ [A] matvec (the MXU
  replaces the inverted file).
- optionally a **trained vocabulary**: binary k-medians on observed
  descriptors (``train_vocabulary``; the bitwise-median cluster update
  is exactly DBoW2's binary cluster-center rule,
  Thirdparty/DBoW2/DBoW2/FORB.cpp meanValue). The vocabulary is a plain
  [A, 256] +-1 array passed as a TRACED argument, so swapping vocabulary
  values never recompiles.

Self-consistency is all that matters (as with the vocabulary the
reference trains offline); the default anchors are seeded constants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_WORDS = 512


def _make_anchors(seed: int = 7, n_words: int = N_WORDS) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.choice(np.array([-1, 1], np.int8), size=(n_words, 256))


ANCHORS = _make_anchors()

_DEFAULT_VOCAB = None


def default_vocabulary() -> np.ndarray | None:
    """The shipped pretrained vocabulary ([A,256] +-1 int8), trained
    offline on a multi-scene synthetic corpus
    (``scripts/train_default_vocab.py``) — the role of the reference's
    offline ORBvoc loaded at startup (orb_slam3/src/System.cc:114), so
    retrieval/relocalization discriminate from the first keyframe
    instead of waiting for the online retrain at n_kf >= 12. Returns
    None when the data file is absent (seeded-anchor fallback)."""
    global _DEFAULT_VOCAB
    if _DEFAULT_VOCAB is None:
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "default_vocab.npz",
        )
        if not os.path.exists(path):
            return None
        _DEFAULT_VOCAB = np.load(path)["vocab"].astype(np.int8)
    return _DEFAULT_VOCAB


def train_vocabulary(
    desc_sign: np.ndarray,
    n_words: int = N_WORDS,
    iters: int = 12,
    seed: int = 11,
) -> np.ndarray:
    """Binary k-medians over observed +-1 descriptors -> [n_words, 256]
    int8 vocabulary (the TPU-flat counterpart of DBoW2's k-means-trained
    vocabulary tree; the bitwise-median center update mirrors
    FORB::meanValue). Assignment is one [M, 256] x [256, A] matmul per
    iteration; empty clusters re-seed to the worst-represented samples."""
    rng = np.random.default_rng(seed)
    D = np.asarray(desc_sign, np.float32)
    M = D.shape[0]
    if M < n_words:
        pad = _make_anchors(seed, n_words - M).astype(np.float32)
        D_init = np.concatenate([D, pad])
        C = D_init[:n_words].copy()
    else:
        C = D[rng.choice(M, n_words, replace=False)].copy()
    for _ in range(iters):
        corr = D @ C.T  # [M, A]
        assign = np.argmax(corr, axis=1)
        best = corr[np.arange(M), assign]
        sums = np.zeros((n_words, 256), np.float32)
        np.add.at(sums, assign, D)
        counts = np.bincount(assign, minlength=n_words)
        new_C = np.where(sums >= 0, 1.0, -1.0)  # bitwise median of +-1
        empty = counts == 0
        if empty.any():
            # Re-seed empty clusters from the worst-represented samples;
            # with fewer samples than empty slots (tiny fine cells in the
            # hierarchical trainer) the surplus slots keep their previous
            # centers.
            n_res = min(int(empty.sum()), M)
            worst = np.argsort(best)[:n_res]
            idx_empty = np.nonzero(empty)[0][:n_res]
            new_C[empty] = C[empty]
            new_C[idx_empty] = D[worst]
        C = new_C
    return C.astype(np.int8)


MAX_WORDS = 8192  # two-level training budget (DBoW2 tree: k=10, L=6)


def train_vocabulary_hier(
    desc_sign: np.ndarray,
    n_words: int = MAX_WORDS,
    branching: int = 128,
    iters: int = 8,
    seed: int = 11,
) -> np.ndarray:
    """Two-level k-medians -> flat [n_words, 256] vocabulary.

    The reference's DBoW2 vocabulary is a k=10, L=6 TREE (~10^6 leaves,
    TemplatedVocabulary.h:1078) because a CPU must descend log-many
    nodes per descriptor; on the MXU the full [N, A] correlation matmul
    is cheap, so the tree survives only as a TRAINING decomposition:
    coarse k-medians into ``n_words // branching`` cells, then k-medians
    with ``branching`` centers INSIDE each cell — O(M*C + M*F) training
    flops instead of O(M*n_words). Lookup stays the exact flat argmax
    (strictly better quantization than tree descent).

    Empty-sample cells fall back to seeded anchors so the output shape
    is always [n_words, 256].
    """
    rng = np.random.default_rng(seed)
    D = np.asarray(desc_sign, np.float32)
    M = D.shape[0]
    C = max(1, n_words // branching)
    F = n_words // C
    if M < 4 * C:  # too few samples for the hierarchy: flat fallback
        return train_vocabulary(desc_sign, n_words=min(n_words, max(32, M)),
                                iters=iters, seed=seed)
    coarse = train_vocabulary(D, n_words=C, iters=iters, seed=seed)
    assign = np.argmax(D @ coarse.astype(np.float32).T, axis=1)
    out = np.empty((C * F, 256), np.float32)
    for c in range(C):
        Dc = D[assign == c]
        if Dc.shape[0] == 0:
            out[c * F : (c + 1) * F] = _make_anchors(seed + c, F)
            continue
        out[c * F : (c + 1) * F] = train_vocabulary(
            Dc, n_words=F, iters=iters, seed=seed + c
        )
    return out.astype(np.int8)


def _words_of(vocab: jnp.ndarray | None) -> jnp.ndarray:
    return jnp.asarray(ANCHORS) if vocab is None else vocab


def descriptor_words(
    desc_sign: jnp.ndarray, vocab: jnp.ndarray | None = None
) -> jnp.ndarray:
    """[N, 256] int8 -> [N] int32 visual-word ids (nearest word =
    max correlation = min Hamming)."""
    corr = jax.lax.dot_general(
        desc_sign,
        _words_of(vocab),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [N, A]
    return jnp.argmax(corr, axis=-1).astype(jnp.int32)


def signature(
    desc_sign: jnp.ndarray, valid: jnp.ndarray,
    vocab: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[N,256], [N] -> [A] L2-normalized tf histogram."""
    words = descriptor_words(desc_sign, vocab)
    A = _words_of(vocab).shape[0]
    hist = jnp.zeros((A,), jnp.float32).at[words].add(
        valid.astype(jnp.float32)
    )
    return hist / jnp.maximum(jnp.linalg.norm(hist), 1e-9)


def score_against(query_sig: jnp.ndarray, kf_sigs: jnp.ndarray) -> jnp.ndarray:
    """[A] x [K, A] -> [K] cosine similarity scores."""
    return kf_sigs @ query_sig


@jax.jit
def kf_signatures(
    kf_desc_sign: jnp.ndarray, kf_feat_valid: jnp.ndarray,
    vocab: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[K, N, 256], [K, N] -> [K, A] signatures for the whole keyframe DB."""
    return jax.vmap(lambda d, v: signature(d, v, vocab))(
        kf_desc_sign, kf_feat_valid
    )


@partial(jax.jit, static_argnames=("n_best",))
def detect_candidates_grouped(
    query_sig: jnp.ndarray,
    kf_sigs: jnp.ndarray,
    cov: jnp.ndarray,  # [K,K] covisibility weights
    kf_valid: jnp.ndarray,
    exclude: jnp.ndarray,
    min_common_score: float = 0.0,
    n_best: int = 3,
    cov_min: int = 15,
):
    """Covisibility-group score accumulation — the contract of
    ``KeyFrameDatabase::DetectNBestCandidates`` (orb_slam3/src/
    KeyFrameDatabase.cc:604-733): a candidate's score is the SUM of the
    query similarity over its covisible group (weight >= ``cov_min``, the
    reference's GetBestCovisibilityKeyFrames set), groups are ranked by
    accumulated score, and each selected group is represented by its
    best-scoring individual member. One [K, K] masked matmul replaces the
    inverted-file walk + per-group accumulation loops.

    Returns (ids [n_best], acc_scores [n_best]); ids are -1 where the
    group's best member does not clear ``min_common_score``.
    """
    K = kf_sigs.shape[0]
    scores = score_against(query_sig, kf_sigs)
    ok = kf_valid & ~exclude
    s_ok = jnp.where(ok, scores, 0.0)
    # Group = self + the 10 best covisible neighbors (the reference's
    # GetBestCovisibilityKeyFrames(10) accumulation set) — capping the
    # group bounds the size bias on self-similar scenes where every
    # signature scores high against everything.
    n_top = min(10, K - 1)
    w_top, i_top = jax.lax.top_k(jnp.where(cov >= cov_min, cov, -1), n_top)
    group = jnp.zeros((K, K), bool)
    rows = jnp.repeat(jnp.arange(K), n_top)
    group = group.at[rows, i_top.reshape(-1)].set(
        (w_top.reshape(-1) > 0)
    )
    group = group | jnp.eye(K, dtype=bool)
    acc = group.astype(s_ok.dtype) @ s_ok
    acc = jnp.where(ok, acc, -1.0)
    top_acc, top_ids = jax.lax.top_k(acc, n_best)
    member = jnp.where(group[top_ids] & ok[None, :], scores[None, :], -1.0)
    best_member = jnp.argmax(member, axis=1).astype(jnp.int32)
    best_score = jnp.max(member, axis=1)
    good = (top_acc > 0) & (best_score > min_common_score)
    return jnp.where(good, best_member, -1), top_acc


@partial(jax.jit, static_argnames=("n_best",))
def detect_candidates(
    query_sig: jnp.ndarray,
    kf_sigs: jnp.ndarray,
    kf_valid: jnp.ndarray,
    exclude: jnp.ndarray,
    min_common_score: float = 0.0,
    n_best: int = 3,
):
    """Top-N loop/reloc candidates (DetectNBestCandidates contract:
    exclude the connected/recent set, return the best-scoring KFs).

    Returns (ids [n_best], scores [n_best]); ids are -1 where no valid
    candidate clears ``min_common_score``.
    """
    scores = score_against(query_sig, kf_sigs)
    scores = jnp.where(kf_valid & ~exclude, scores, -1.0)
    top_scores, top_ids = jax.lax.top_k(scores, n_best)
    ok = top_scores > min_common_score
    return jnp.where(ok, top_ids, -1), top_scores
