"""Pallas TPU kernel: fused projection-guided descriptor matching.

The per-frame hot search (``matching.search_by_projection``) computes,
for every projected landmark, the best and second-best Hamming match
among geometrically compatible frame features. The XLA path materializes
the [P, N] distance matrix, the [P, N] pixel-distance matrix, and the
[P, N] mask in HBM and reads them back across several fused loops. This
kernel instead streams feature chunks through VMEM on a 2-D grid
(landmark tiles x feature chunks), computes the MXU correlation + the
geometric mask in-register, and accumulates running best/second/argbest
in the revisited output block — O(P + N) HBM traffic instead of O(P*N).

Notes for this Mosaic toolchain (v5e): int8/bf16 matmul operands are
rejected ("Bad lhs type") and dynamic lane-dim slices of int8 are
miscompiled — descriptors are cast to f32 in-register and chunking is
done by the grid, not by ``pl.ds``. +-1 descriptor values keep the f32
contraction exact.

Used automatically on TPU backends; the pure-XLA path in
``matching.search_by_projection`` remains the reference implementation
(and the CPU/test path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = 999
N_BITS = 256


def _kernel(
    sign_a_ref,   # [TP, 256] int8  landmark descriptors (tile i)
    uv_ref,       # [TP, 2]  f32
    lvl_a_ref,    # [TP, 1]  i32
    valid_a_ref,  # [TP, 1]  i32
    rad_ref,      # [TP, 1]  f32
    sign_bT_ref,  # [256, CH] int8  feature descriptors (chunk j, transposed)
    xy_ref,       # [CH, 2]  f32
    lvl_b_ref,    # [CH, 1]  i32
    valid_b_ref,  # [CH, 1]  i32
    best_ref,     # [TP, 1] f32   (accumulated across j)
    second_ref,   # [TP, 1] f32
    idx_ref,      # [TP, 1] i32
    *,
    chunk: int,
    level_slack: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, float(INVALID))
        second_ref[:] = jnp.full_like(second_ref, float(INVALID))
        idx_ref[:] = jnp.zeros_like(idx_ref)

    a = sign_a_ref[:].astype(jnp.float32)  # [TP, 256]
    bT = sign_bT_ref[:].astype(jnp.float32)  # [256, CH]
    corr = jax.lax.dot_general(
        a, bT, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TP, CH]
    dist = (N_BITS - corr) * 0.5
    dx = uv_ref[:, 0:1] - xy_ref[:, 0][None, :]
    dy = uv_ref[:, 1:2] - xy_ref[:, 1][None, :]
    d2 = dx * dx + dy * dy
    r = rad_ref[:, 0:1]
    lvl_b = lvl_b_ref[:, 0][None, :]
    lvl_a = lvl_a_ref[:, 0:1]
    ok = (
        (d2 <= r * r)
        & (lvl_b >= lvl_a - level_slack)
        & (lvl_b <= lvl_a + level_slack)
        & (valid_a_ref[:, 0:1] > 0)
        & (valid_b_ref[:, 0][None, :] > 0)
    )
    d = jnp.where(ok, dist, jnp.float32(INVALID))

    chunk_best = jnp.min(d, axis=1, keepdims=True)  # [TP, 1]
    chunk_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None] + j * chunk
    chunk_second = jnp.min(
        jnp.where(d == jnp.broadcast_to(chunk_best, d.shape),
                  jnp.float32(INVALID), d),
        axis=1, keepdims=True,
    )
    best = best_ref[:]
    second = second_ref[:]
    idx = idx_ref[:]
    best_ref[:] = jnp.minimum(best, chunk_best)
    idx_ref[:] = jnp.where(chunk_best < best, chunk_arg, idx)
    second_ref[:] = jnp.minimum(
        jnp.maximum(best, chunk_best),  # loser of the two firsts
        jnp.minimum(second, chunk_second),
    )


def _round_up(x, m):
    return (x + m - 1) // m * m


@partial(jax.jit, static_argnames=("level_slack",))
def project_match_best2(
    proj_uv, proj_valid, proj_level, proj_sign, radius,
    feat_xy, feat_level, feat_valid, feat_sign,
    level_slack: int = 1,
):
    """(best_idx [P], best [P], second [P]) for the projection search.

    Shapes are padded to TPU tiles; padding rows/cols are invalid.
    """
    P = proj_uv.shape[0]
    N = feat_xy.shape[0]
    TP = 128
    CH = 128
    Pp = _round_up(P, TP)
    Np = _round_up(N, CH)

    def pad(x, n, fill=0):
        pads = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pads, constant_values=fill)

    sign_a = pad(proj_sign, Pp)
    uv = pad(proj_uv.astype(jnp.float32), Pp)
    lvl_a = pad(proj_level.astype(jnp.int32)[:, None], Pp)
    val_a = pad(proj_valid.astype(jnp.int32)[:, None], Pp)
    rad = pad(radius.astype(jnp.float32)[:, None], Pp)
    sign_bT = jnp.pad(feat_sign.T, ((0, 0), (0, Np - N)))  # [256, Np]
    xy = pad(feat_xy.astype(jnp.float32), Np, fill=1e9)
    lvl_b = pad(feat_level.astype(jnp.int32)[:, None], Np)
    val_b = pad(feat_valid.astype(jnp.int32)[:, None], Np)

    grid = (Pp // TP, Np // CH)
    row = lambda i, j: (i, 0)
    colT = lambda i, j: (0, j)
    col = lambda i, j: (j, 0)
    best, second, idx = pl.pallas_call(
        partial(_kernel, chunk=CH, level_slack=level_slack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, 256), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((256, CH), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 2), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, 1), col, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TP, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(sign_a, uv, lvl_a, val_a, rad, sign_bT, xy, lvl_b, val_b)
    return (
        idx[:P, 0],
        best[:P, 0].astype(jnp.int32),
        second[:P, 0].astype(jnp.int32),
    )
