"""FAST-16 corner detection + grid-bucketed spatial selection, pure JAX.

Role of the reference's per-cell ``cv::FAST`` sweep and quadtree balancing
(``ORBextractor::ComputeKeyPointsOctTree`` orb_slam3/src/ORBextractor.cc:
781-898 and ``DistributeOctTree`` :555-781). TPU-first reformulation:

- the segment test runs on the *whole level image at once* as 16
  ``jnp.roll`` comparisons + bit-mask rotation tricks on the VPU (no
  per-cell scalar loops),
- the two-threshold fallback (ini=20, min=7; ORBextractor.cc:829-838) is a
  per-cell preference instead of a re-detection: a cell keeps its best
  high-threshold corner if it has one, else its best low-threshold corner,
- the quadtree's "spread ~N best corners over the image" contract becomes
  3x3 NMS -> one best corner per fixed cell -> top-K cells by response,
  with a fixed output capacity and validity mask (XLA static shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, OpenCV ordering, as (dy, dx).
CIRCLE_OFFSETS = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ],
    dtype=np.int32,
)

_ARC_LEN = 9  # segment test: >= 9 contiguous pixels (FAST-9/16)


def _circle_stack(img: jnp.ndarray) -> jnp.ndarray:
    """[16, ..., H, W] stack of the circle-neighbor images via rolls
    (rolls act on the trailing two axes, so leading batch dims — e.g. a
    padded pyramid-level axis — pass through)."""
    outs = []
    for dy, dx in CIRCLE_OFFSETS:
        outs.append(jnp.roll(img, (-int(dy), -int(dx)), axis=(-2, -1)))
    return jnp.stack(outs, axis=0)


def _has_arc(mask16: jnp.ndarray) -> jnp.ndarray:
    """True where the 16-bit ring mask contains >= _ARC_LEN contiguous set
    bits (circularly). mask16: uint32 [H, W] with bits 0..15."""
    m = mask16 | (mask16 << 16)  # unroll the ring into 32 bits
    r = m
    for _ in range(_ARC_LEN - 1):
        m = m >> 1
        r = r & m
    return (r & jnp.uint32(0xFFFF)) != 0


def _score_from_diff(diff: jnp.ndarray, threshold: float):
    """(corner_mask, score) from a precomputed circle-difference stack
    ``diff [16, ..., H, W]`` — lets the two-threshold combined map share
    ONE set of rolls/differences between thresholds."""
    brighter = diff > threshold
    darker = diff < -threshold
    bits = jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32)
    bits = bits.reshape((16,) + (1,) * (diff.ndim - 1))
    mb = jnp.sum(jnp.where(brighter, bits, jnp.uint32(0)), axis=0)
    md = jnp.sum(jnp.where(darker, bits, jnp.uint32(0)), axis=0)
    corner = _has_arc(mb) | _has_arc(md)
    excess = jnp.maximum(jnp.abs(diff) - threshold, 0.0)
    score = jnp.sum(jnp.where(brighter | darker, excess, 0.0), axis=0)
    return corner, score


def fast_score_map(img: jnp.ndarray, threshold: float):
    """(corner_mask [H,W] bool, score [H,W] f32) for one threshold.

    Score is the sum of |p_i - c| - t over the circle pixels exceeding the
    threshold (the usual FAST "V" response used for NMS ordering; the
    reference relies on OpenCV's score only to order corners inside
    DistributeOctTree, ORBextractor.cc:443-446)."""
    circ = _circle_stack(img)  # [16, ..., H, W]
    return _score_from_diff(circ - img[None], threshold)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only local maxima of a 3x3 neighborhood."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return score >= mx


def score_map_combined(
    img: jnp.ndarray,
    ini_threshold: float,
    min_threshold: float,
):
    """Combined two-threshold FAST score map: high-threshold corners get a
    +BIG bump so they always outrank low-threshold-only corners (the
    reference re-runs cv::FAST at minThFAST only in cells that found
    nothing at iniThFAST, ORBextractor.cc:829-838). Returns [H, W] f32
    with -inf at non-corners. Works batched over leading dims (rolls act
    on the last two axes). The circle stack (16 rolled copies + the
    center differences — the dominant HBM traffic of FAST) is computed
    ONCE and shared between the two thresholds."""
    diff = _circle_stack(img) - img[None]
    corner_hi, score_hi = _score_from_diff(diff, ini_threshold)
    corner_lo, score_lo = _score_from_diff(diff, min_threshold)
    return jnp.where(
        corner_hi, score_hi + SCORE_BUMP, jnp.where(corner_lo, score_lo, -jnp.inf)
    )


SCORE_BUMP = 1e6  # high-threshold preference offset (scores < 16*255)


def select_grid(
    score: jnp.ndarray,
    post_mask: jnp.ndarray,
    max_kp: int,
    cell: int,
):
    """NMS + one-best-corner-per-cell + top-``max_kp`` cells.

    ``score`` must already be -inf outside the image's true extent (so
    NMS sees the same neighborhood a true-size image would); ``post_mask``
    (e.g. the descriptor border) is applied AFTER NMS, matching the
    reference where border-zone corners still suppress neighbors.

    Returns (xy [max_kp, 2] f32, response [max_kp], valid [max_kp])."""
    h, w = score.shape
    keep = nms3x3(jnp.where(jnp.isfinite(score), score, -jnp.inf))
    score = jnp.where(keep & post_mask, score, -jnp.inf)

    ph = (-h) % cell
    pw = (-w) % cell
    sp = jnp.pad(score, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    hc, wc = (h + ph) // cell, (w + pw) // cell
    cells = sp.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(hc, wc, cell * cell)
    best_in_cell = jnp.argmax(cells, axis=-1)  # [hc, wc]
    best_score = jnp.max(cells, axis=-1)

    flat_scores = best_score.reshape(-1)
    k = min(max_kp, flat_scores.shape[0])
    top_scores, top_cells = jax.lax.top_k(flat_scores, k)
    cy = top_cells // wc
    cx = top_cells % wc
    iy = best_in_cell.reshape(-1)[top_cells] // cell
    ix = best_in_cell.reshape(-1)[top_cells] % cell
    y = cy * cell + iy
    x = cx * cell + ix
    valid = jnp.isfinite(top_scores)
    resp = jnp.where(top_scores >= SCORE_BUMP, top_scores - SCORE_BUMP, top_scores)
    xy = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    xy = jnp.where(valid[:, None], xy, 0.0)
    resp = jnp.where(valid, resp, -jnp.inf)
    if k < max_kp:
        pad = max_kp - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), jnp.float32)])
        resp = jnp.concatenate([resp, jnp.full((pad,), -jnp.inf, jnp.float32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return xy, resp, valid


def detect_grid(
    img: jnp.ndarray,
    max_kp: int,
    cell: int,
    ini_threshold: float = 20.0,
    min_threshold: float = 7.0,
    border: int = 19,
):
    """Detect up to ``max_kp`` well-spread FAST corners on one pyramid level.

    Returns (xy [max_kp, 2] f32 in level pixels, response [max_kp],
    valid [max_kp] bool). Capacity-and-mask discipline: invalid slots have
    response -inf and xy at (0, 0).

    ``border`` masks a margin so descriptor patches stay inside (the
    reference's EDGE_THRESHOLD = 19, ORBextractor.h / ORBextractor.cc:793).
    """
    h, w = img.shape
    score = score_map_combined(img, ini_threshold, min_threshold)

    # Border mask (applied after NMS, inside select_grid).
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)

    return select_grid(score, inb, max_kp, cell)
