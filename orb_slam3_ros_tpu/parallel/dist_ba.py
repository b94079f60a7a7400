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


# ---------------------------------------------------------------------------
# Inertial solvers (round-5 / VERDICT r4 #5): the reference's hottest
# post-closure solve on inertial maps is FullInertialBA
# (orb_slam3/src/LoopClosing.cc:3611-3658 -> Optimizer.cc:392). Its
# 15-dim body blocks Schur-reduce exactly like the 6-dim visual ones, so
# the same (obs, pt) sharding applies: visual edge tables over 'obs',
# landmarks over 'pt'; keyframe states and the [Q]~K inertial chain are
# tiny and stay replicated (their psum rides ICI for free).


def shard_vi_problem(prob, mesh: Mesh):
    """Place a ``viba.VIBAProblem`` on the mesh: visual edge rows over
    'obs', landmark rows over 'pt', states/inertial-chain replicated."""
    from ..ops import viba

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def rep(x):
        return jax.tree.map(lambda a: put(a, P()), x)

    ur = prob.ur if prob.ur is not None else None
    return viba.VIBAProblem(
        states=rep(prob.states),
        kf_fixed=put(prob.kf_fixed, P()),
        kf_valid=put(prob.kf_valid, P()),
        X=put(prob.X, P("pt")),
        pt_valid=put(prob.pt_valid, P("pt")),
        cam_idx=put(prob.cam_idx, P("obs")),
        pt_idx=put(prob.pt_idx, P("obs")),
        uv=put(prob.uv, P("obs")),
        inv_sigma2=put(prob.inv_sigma2, P("obs")),
        edge_valid=put(prob.edge_valid, P("obs")),
        ie_i=put(prob.ie_i, P()),
        ie_j=put(prob.ie_j, P()),
        ie_preint=rep(prob.ie_preint),
        ie_valid=put(prob.ie_valid, P()),
        cam_params=put(prob.cam_params, P()),
        R_bc=put(prob.R_bc, P()),
        t_bc=put(prob.t_bc, P()),
        ur=put(ur, P("obs")) if ur is not None else None,
        bf=prob.bf if isinstance(prob.bf, float) else put(
            jnp.asarray(prob.bf), P()
        ),
    )


def distributed_vi_bundle_adjust(prob, mesh: Mesh, n_iters: int = 8, **kw):
    """Sharded FullInertialBA/LocalInertialBA. Uses the generic
    scatter-add visual accumulation (row_n=None): GSPMD partitions the
    per-edge Jacobian contractions over 'obs' and inserts psum /
    reduce-scatter for the landmark and body-block reductions."""
    from ..ops import viba

    sharded = shard_vi_problem(prob, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        return viba.vi_bundle_adjust(sharded, n_iters=n_iters, **kw)


def shard_pgo_problem(prob, mesh: Mesh):
    """Place a ``pgo.PGOProblem`` on the mesh: edge tables over 'obs'
    (the per-edge residual/Jacobian work is the PGO's O(E) part);
    the [K]-sized vertex state replicates — the dense [7K, 7K] normal
    system is MXU-trivial at K <= 256 and not worth sharding."""
    from ..ops import pgo

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return pgo.PGOProblem(
        R=put(prob.R, P()), t=put(prob.t, P()), s=put(prob.s, P()),
        kf_fixed=put(prob.kf_fixed, P()), kf_valid=put(prob.kf_valid, P()),
        e_i=put(prob.e_i, P("obs")), e_j=put(prob.e_j, P("obs")),
        e_R=put(prob.e_R, P("obs")), e_t=put(prob.e_t, P("obs")),
        e_s=put(prob.e_s, P("obs")), e_valid=put(prob.e_valid, P("obs")),
        e_weight=put(prob.e_weight, P("obs")),
    )


def distributed_pose_graph(prob, mesh: Mesh, n_iters: int = 20, **kw):
    """Sharded essential-graph Sim3 PGO (OptimizeEssentialGraph role,
    Optimizer.cc:1504): edge accumulation partitions over 'obs', the
    JT J psum rides ICI, the dense solve replicates."""
    from ..ops import pgo

    sharded = shard_pgo_problem(prob, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        return pgo.optimize_pose_graph(sharded, n_iters=n_iters, **kw)
