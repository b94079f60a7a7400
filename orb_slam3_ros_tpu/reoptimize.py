"""Offline pose-graph re-optimization CLI.

Role of the fork's standalone Ceres experiments
(3DCERES/loop_optimization.cpp main :1946-2022, test_op_data.cpp): parse
an optimization-data dump written by the live system (LoopClosing's
SaveOptimizationData equivalent, utils/optdump.py), re-solve the
essential graph with the TPU pose-graph optimizer, and write
before/after TUM trajectories for comparison.

Usage:
  python -m orb_slam3_ros_tpu.reoptimize DUMP_DIR [--four-dof]
      [--iters N] [--out OUT_DIR]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dump_dir")
    ap.add_argument("--four-dof", action="store_true",
                    help="4-dof (yaw+translation) optimization for inertial maps")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--loop-weight", type=float, default=5.0)
    ap.add_argument("--out", default=None, help="output dir (default: dump dir)")
    ap.add_argument("--platform", default=None, choices=["cpu", None])
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .utils import optdump, trajectory

    dump = optdump.load_optimization_data(args.dump_dir)
    out_dir = args.out or args.dump_dir
    os.makedirs(out_dir, exist_ok=True)

    before = optdump.trajectory_from_poses(dump.kf_ts, dump.kf_R, dump.kf_t)
    trajectory.save_tum(os.path.join(out_dir, "trajectory_before.txt"), before)

    R_new, t_new, s_new, cost = optdump.reoptimize(
        dump, n_iters=args.iters, four_dof=args.four_dof,
        loop_weight=args.loop_weight,
    )
    after = optdump.trajectory_from_poses(dump.kf_ts, R_new, t_new)
    trajectory.save_tum(os.path.join(out_dir, "trajectory_after.txt"), after)

    n_loop = int((dump.e_kind == 1).sum())
    print(
        f"reoptimize: K={len(dump.kf_id)} edges={len(dump.e_i)} "
        f"(loop={n_loop}) iters={args.iters} "
        f"mode={'4dof' if args.four_dof else 'sim3'} final_cost={cost:.6f}",
        file=sys.stderr,
    )
    print(os.path.join(out_dir, "trajectory_after.txt"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
