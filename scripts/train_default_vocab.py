"""Train the shipped default retrieval vocabulary (VERDICT r4 #7).

The reference loads an OFFLINE-trained ORB vocabulary at startup
(``ORBVocabulary`` from ORBvoc.txt, orb_slam3/src/System.cc:114) so
place recognition discriminates from the very first keyframe. This
script is the counterpart trainer: it renders a multi-scene,
multi-texture synthetic corpus, extracts ORB descriptors with the
production extractor, trains the two-level k-medians vocabulary, and
writes ``orb_slam3_ros_tpu/data/default_vocab.npz`` — loaded by default
by every System (``retrieval.default_vocabulary``). Online retraining
(``auto_train_vocab``) remains as session-specific refinement.

Run on CPU (deterministic, a few minutes):
    JAX_PLATFORMS=cpu python scripts/train_default_vocab.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orb_slam3_ros_tpu.ops import orb, retrieval
    from orb_slam3_ros_tpu.utils import synth

    H, W = 240, 376
    config = orb.default_config(H, W, n_features=1200)
    ex = jax.jit(lambda im: orb.extract(im, config))
    descs = []
    # 8 scenes (different value-noise textures + trajectories), 10
    # viewpoints each — diversity over scenes matters more than frames
    # per scene for word generality.
    # Seeds 20..27: disjoint from every scene the test suite evaluates
    # retrieval on (3/5/11), so the cold-start tests measure genuine
    # generalization to unseen rooms.
    for seed in range(20, 28):
        seq = synth.make_sequence(
            n_frames=20, height=H, width=W, dt=0.1, seed=seed,
            trajectory="orbit" if seed % 2 == 0 else "loop",
        )
        for i in range(0, 20, 2):
            f = ex(jnp.asarray(seq.images[i]))
            d = np.asarray(f.desc_sign)[np.asarray(f.valid)]
            descs.append(d.astype(np.int8))
        print(f"scene {seed}: {sum(len(d) for d in descs)} descriptors total")
    D = np.concatenate(descs)
    # Cap at 1024: signature scoring is O(K*N*256*A) per detection
    # dispatch, and the CPU test tier pays that too — trained-vs-random
    # is where the discrimination gain is, not vocabulary size.
    n_words = int(np.clip(len(D) // 16, 512, 1024))
    n_words = 1 << int(np.log2(n_words))  # power of two for MXU tiling
    print(f"training: {len(D)} descriptors -> {n_words} words (hier)")
    vocab = retrieval.train_vocabulary_hier(D, n_words=n_words, iters=10)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "orb_slam3_ros_tpu", "data", "default_vocab.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, vocab=vocab.astype(np.int8),
                        n_train=np.asarray(len(D)))
    print(f"wrote {out}: {vocab.shape} int8, "
          f"{os.path.getsize(out) / 1024:.0f} KiB")


if __name__ == "__main__":
    main()
