"""Distributed-BA step time for the realistic global-BA shape
(K=64, P=8192, E=65536 — BASELINE.md).

Two modes:
  python scripts/bench_dist.py tpu   # per-iter ms on the real chip
  python scripts/bench_dist.py cpu   # 8-virtual-device CPU mesh: runs
                                     # the sharded program (collective
                                     # validation; wall time NOT an
                                     # efficiency signal on this 2-core
                                     # host)

Prints ms/iter for the explicit-Schur LM solver and the matrix-free
Schur-PCG solver (the global-BA scale-out path).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from orb_slam3_ros_tpu.utils import tpucache as _tpucache
_tpucache.enable_on_tpu()

import sys
import time


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if mode == "cpu":
        _os.environ["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=8 "
            + _os.environ.get("XLA_FLAGS", "")
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    import __graft_entry__ as g
    from orb_slam3_ros_tpu.ops import ba, ba_pcg
    from orb_slam3_ros_tpu.parallel import dist_ba

    prob = g._toy_problem()
    E = int(prob.cam_idx.shape[0])
    print(f"backend={jax.default_backend()} devices={len(jax.devices())} "
          f"shape: K={prob.R.shape[0]} P={prob.X.shape[0]} E={E}",
          flush=True)

    def timeit(name, fn, n_iters, n=5):
        out = fn()
        jax.block_until_ready(out.cost)
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out.cost)
        per_call = (time.time() - t0) / n * 1e3
        print(f"{name:44s} {per_call:9.2f} ms/call  "
              f"{per_call / n_iters:8.2f} ms/iter  cost={float(out.cost):.1f}",
              flush=True)

    if mode == "cpu":
        mesh = dist_ba.make_mesh(n_devices=8)
        timeit("sharded Schur-LM (4 it) @ 8-dev mesh",
               lambda: dist_ba.distributed_bundle_adjust(prob, mesh, n_iters=4),
               4)
        timeit("sharded Schur-PCG (4 it, 30 cg) @ 8-dev mesh",
               lambda: dist_ba.distributed_bundle_adjust_pcg(
                   prob, mesh, n_iters=4, n_cg=30), 4)
    else:
        timeit("Schur-LM GBA (4 it) @ 1 chip",
               lambda: ba.bundle_adjust(prob, n_iters=4), 4)
        timeit("Schur-PCG GBA (4 it, 30 cg) @ 1 chip",
               lambda: ba_pcg.bundle_adjust_pcg(prob, n_iters=4, n_cg=30), 4)
        timeit("Schur-PCG GBA (8 it, 50 cg) @ 1 chip",
               lambda: ba_pcg.bundle_adjust_pcg(prob, n_iters=8, n_cg=50), 8)


if __name__ == "__main__":
    main()
