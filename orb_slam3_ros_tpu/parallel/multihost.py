"""Multi-host distributed runtime (jax.distributed) for scale-out BA.

No reference counterpart — the reference is a single-process pthread
system with no communication backend (SURVEY §2.5). This is the
framework's `jax.distributed` path: each host process joins a
coordinator rendezvous, the global device set forms one mesh, and the
same GSPMD-sharded solvers from ``dist_ba`` run over it — collectives
ride ICI within a host slice and DCN across slices (on CPU test
fixtures, Gloo over TCP stands in for both).

Usage (one call per process, before building meshes):

    from orb_slam3_ros_tpu.parallel import multihost
    multihost.init(coordinator="10.0.0.1:9999", num_processes=2,
                   process_id=int(os.environ["RANK"]))
    mesh = multihost.global_mesh()
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from . import dist_ba


def init(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_count: int | None = None,
) -> None:
    """Join the distributed runtime. Call exactly once per process,
    before any other JAX API touches the backend.

    ``local_device_count``: for CPU test fixtures, the number of virtual
    host devices each process contributes (sets
    ``xla_force_host_platform_device_count``); leave None on real TPU
    hosts (the local chips are discovered).
    """
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{local_device_count}"
            ).strip()
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """(obs, pt) mesh over the GLOBAL device set — process-major order,
    so the 'obs' axis stripes across hosts (edge-parallel reductions
    cross hosts once per solve; the small 'pt' axis stays host-local
    when the per-host device count is even)."""
    return dist_ba.make_mesh(devices=jax.devices())


def replicated_problem(prob):
    """Place an identical host-side problem (every process must build the
    same arrays) onto the global mesh — host data is process-replicated,
    so device_put with a global NamedSharding is legal from each host."""
    return dist_ba.shard_problem(prob, global_mesh())
