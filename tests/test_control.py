"""Out-of-process control surface: a client drives a running session
over the JSONL Unix-socket channel and retrieves its trajectory/map —
the service+publisher role of the reference ROS wrapper
(src/common.cc:24-118, srv/SaveMap.srv)."""

import json
import os
import threading

import numpy as np
import pytest

from orb_slam3_ros_tpu.models.system import MonoSlam, OK
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.control import ControlClient, ControlServer


@pytest.fixture(scope="module")
def seq():
    return synth.make_sequence(n_frames=40, height=240, width=376,
                               dt=0.1, seed=3)


class TestControlSurface:
    def test_client_drives_running_session(self, seq, tmp_path):
        slam = MonoSlam(
            height=240, width=376, cam_params=seq.cam_params,
            n_features=1200, max_keyframes=32, max_points=4096,
        )
        sock = str(tmp_path / "ctl.sock")
        server = ControlServer(slam, sock)
        events = []
        stop = threading.Event()

        def subscriber():
            c = ControlClient(sock)
            try:
                for ev in c.subscribe():
                    events.append(ev)
                    if stop.is_set():
                        break
            except Exception:
                pass

        sub_thread = threading.Thread(target=subscriber, daemon=True)
        sub_thread.start()
        client = ControlClient(sock)
        try:
            # Drive the session, polling the command queue between
            # frames (the spin interleaving contract).
            for i in range(24):
                slam.process_frame(seq.images[i], float(seq.timestamps[i]))
                server.poll()
            # Commands execute on the SLAM thread via poll(): issue every
            # call from a worker and poll until it completes (the caller
            # here doubles as the SLAM thread).
            box = {}

            def call_async(name, **kw):
                def run():
                    box[name] = client.call(name, **kw)
                t = threading.Thread(target=run, daemon=True)
                t.start()
                while t.is_alive():
                    server.poll()
                    t.join(timeout=0.01)

            call_async("status")
            st = box["status"]
            assert st["ok"] and st["state"] == OK and st["n_kf"] >= 3

            # save_traj service
            tpath = str(tmp_path / "traj.tum")
            call_async("save_traj", path=tpath, format="tum")
            assert box["save_traj"]["ok"]
            assert box["save_traj"]["n_poses"] >= 20
            assert os.path.getsize(tpath) > 0

            # save_map service (full Atlas checkpoint + md5)
            mpath = str(tmp_path / "map_ckpt")
            call_async("save_map", path=mpath)
            assert box["save_map"]["ok"] and len(box["save_map"]["md5"]) == 32
            assert os.path.exists(mpath + ".npz")
            manifest = json.load(open(mpath + ".json"))
            assert manifest["counters"]["n_kf"] == slam.n_kf

            # localization-mode toggle
            call_async("localization_mode", on=True)
            assert box["localization_mode"]["localization_only"] is True
            n_kf0 = slam.n_kf
            for i in range(24, 32):
                slam.process_frame(seq.images[i], float(seq.timestamps[i]))
                server.poll()
            assert slam.n_kf == n_kf0  # frozen
            call_async("localization_mode", on=False)
            assert box["localization_mode"]["localization_only"] is False

            # unknown command errors without killing the session
            call_async("warp_drive")
            bad = box["warp_drive"]
            assert not bad["ok"] and "unknown" in bad["error"]

            # the event stream carried per-frame publishes
            stop.set()
            assert any(e.get("event") == "frame" for e in events)
            assert any(e.get("event") == "keyframe" for e in events)
        finally:
            client.close()
            server.close()
