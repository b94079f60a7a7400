"""Distributed bundle adjustment over a device mesh.

No reference counterpart — the reference is single-process pthreads
(SURVEY §2.5). This is the TPU-native scale-out layer: BA edge tables are
sharded over an ``obs`` mesh axis (data parallel over observations) and
the landmark-indexed structures over a ``pt`` axis (model parallel over
points). The solver body is the same pure-JAX ``ba.bundle_adjust``;
GSPMD partitions the scatter-adds and Schur einsums and inserts the
``psum``/``all_gather`` collectives over ICI — the "annotate shardings,
let XLA insert collectives" recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ba


def make_mesh(devices=None, n_devices: int | None = None) -> Mesh:
    """2-D mesh (obs, pt). Factors n into (n//b, b) with b=2 when even."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    b = 2 if n % 2 == 0 and n >= 2 else 1
    a = n // b
    arr = np.asarray(devices[: a * b]).reshape(a, b)
    return Mesh(arr, ("obs", "pt"))


def shard_problem(prob: ba.BAProblem, mesh: Mesh) -> ba.BAProblem:
    """Place the problem on the mesh: edge rows over 'obs', point rows
    over 'pt', cameras replicated."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return ba.BAProblem(
        R=put(prob.R, P()),
        t=put(prob.t, P()),
        cam_fixed=put(prob.cam_fixed, P()),
        cam_valid=put(prob.cam_valid, P()),
        X=put(prob.X, P("pt")),
        pt_valid=put(prob.pt_valid, P("pt")),
        cam_idx=put(prob.cam_idx, P("obs")),
        pt_idx=put(prob.pt_idx, P("obs")),
        uv=put(prob.uv, P("obs")),
        inv_sigma2=put(prob.inv_sigma2, P("obs")),
        edge_valid=put(prob.edge_valid, P("obs")),
        cam_params=put(prob.cam_params, P()),
        ur=put(prob.ur, P("obs")),
        bf=put(prob.bf, P()),
    )


def distributed_bundle_adjust(
    prob: ba.BAProblem, mesh: Mesh, n_iters: int = 5, **kw
) -> ba.BAResult:
    """One sharded BA solve (the framework's multi-chip 'training step')."""
    sharded = shard_problem(prob, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        return ba.bundle_adjust(sharded, n_iters=n_iters, **kw)


def distributed_bundle_adjust_pcg(
    prob: ba.BAProblem, mesh: Mesh, n_iters: int = 5, **kw
) -> ba.BAResult:
    """Sharded matrix-free Schur-PCG BA — the global-BA scale-out path.

    Every CG matvec is edge-local contractions + two scatter-adds, so
    GSPMD lowers the point/camera reductions to psum/reduce-scatter over
    the mesh; nothing K^2-sized is ever built or gathered."""
    from ..ops import ba_pcg

    sharded = shard_problem(prob, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        return ba_pcg.bundle_adjust_pcg(sharded, n_iters=n_iters, **kw)
