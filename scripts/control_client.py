"""CLI client for a running session's control socket (the
rosservice-call counterpart of src/common.cc's save_map/save_traj).

    python scripts/control_client.py /tmp/slam.sock status
    python scripts/control_client.py /tmp/slam.sock save_traj out.tum --format tum
    python scripts/control_client.py /tmp/slam.sock save_map ckpt
    python scripts/control_client.py /tmp/slam.sock localization_mode --on
    python scripts/control_client.py /tmp/slam.sock subscribe   # stream events
"""

from __future__ import annotations

import argparse
import json
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from orb_slam3_ros_tpu.utils.control import ControlClient


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sock")
    ap.add_argument("cmd")
    ap.add_argument("path", nargs="?")
    ap.add_argument("--format", default="tum")
    ap.add_argument("--on", action="store_true")
    args = ap.parse_args()
    c = ControlClient(args.sock)
    if args.cmd == "subscribe":
        for ev in c.subscribe():
            print(json.dumps(ev), flush=True)
        return
    kw = {}
    if args.cmd in ("save_traj", "save_map"):
        kw["path"] = args.path
    if args.cmd == "save_traj":
        kw["format"] = args.format
    if args.cmd == "localization_mode":
        kw["on"] = args.on
    print(json.dumps(c.call(args.cmd, **kw), indent=1))


if __name__ == "__main__":
    main()
