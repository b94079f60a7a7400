"""Out-of-process control surface: JSONL over a Unix-domain socket.

Role of the reference ROS wrapper's service + topic surface —
``save_map``/``save_traj`` services and the pose/point publishers
(src/common.cc:24-118, srv/SaveMap.srv:1-3) — without a ROS dependency:
an external client connects to the socket, sends one JSON command per
line, and receives one JSON reply per line. ``subscribe`` upgrades the
connection to a live JSONL event stream (the publisher role, fed from
the same ``on_frame`` events ``utils.obslog`` logs).

Threading contract: socket accept/read runs on a background thread, but
commands EXECUTE on the SLAM thread — the driving loop calls
``server.poll()`` between frames (the way rclcpp spinning interleaves
service callbacks with the node's own work). The SLAM object is never
touched from the server thread.

Commands:
  {"cmd": "status"}                                -> counters/state
  {"cmd": "save_map",  "path": p}                  -> full Atlas checkpoint
  {"cmd": "save_traj", "path": p, "format": f}     -> tum|euroc|kitti
  {"cmd": "localization_mode", "on": true|false}   -> toggle frozen map
  {"cmd": "subscribe"}                             -> live event stream
"""

from __future__ import annotations

import json
import os
import queue
import socket
import threading


class ControlServer:
    """JSONL command server bound to a Unix socket path."""

    def __init__(self, slam, sock_path: str):
        self.slam = slam
        self.sock_path = sock_path
        self._cmds: queue.Queue = queue.Queue()
        self._subscribers: list[socket.socket] = []
        self._lock = threading.Lock()
        self._closing = False
        if os.path.exists(sock_path):
            os.unlink(sock_path)
        self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._srv.bind(sock_path)
        self._srv.listen(4)
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()
        # Chain onto an existing on_frame hook rather than replacing it.
        prev = slam.on_frame

        def hook(ev):
            if prev is not None:
                prev(ev)
            self._publish(ev)

        slam.on_frame = hook

    # -- server thread ---------------------------------------------------
    def _accept_loop(self):
        while not self._closing:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._client_loop, args=(conn,), daemon=True
            ).start()

    def _client_loop(self, conn: socket.socket):
        f = conn.makefile("r")
        try:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    cmd = json.loads(line)
                except json.JSONDecodeError as e:
                    self._send(conn, {"ok": False, "error": f"bad json: {e}"})
                    continue
                if cmd.get("cmd") == "subscribe":
                    with self._lock:
                        self._subscribers.append(conn)
                    self._send(conn, {"ok": True, "subscribed": True})
                    continue
                done = threading.Event()
                box: dict = {}
                self._cmds.put((cmd, box, done))
                done.wait(timeout=60.0)
                self._send(conn, box or {"ok": False, "error": "timeout"})
        except (OSError, ValueError):
            pass
        finally:
            with self._lock:
                if conn in self._subscribers:
                    self._subscribers.remove(conn)

    def _send(self, conn, obj) -> bool:
        try:
            conn.sendall((json.dumps(obj) + "\n").encode())
            return True
        except OSError:
            return False

    def _publish(self, ev: dict):
        """Forward an on_frame event to subscribers (numpy -> lists;
        bulky payloads summarized, like the reference publishing point
        counts at frame rate and full clouds at a slower cadence)."""
        with self._lock:
            subs = list(self._subscribers)
        if not subs:
            return
        out = {}
        for k, v in ev.items():
            if hasattr(v, "tolist"):
                v = v.tolist() if getattr(v, "size", 0) <= 16 else None
            out[k] = v
        out = {k: v for k, v in out.items() if v is not None}
        dead = [s for s in subs if not self._send(s, out)]
        if dead:
            with self._lock:
                self._subscribers = [
                    s for s in self._subscribers if s not in dead
                ]

    # -- SLAM thread -----------------------------------------------------
    def poll(self):
        """Execute queued commands on the caller's (SLAM) thread. Call
        between frames, like the reference's spin interleaving."""
        while True:
            try:
                cmd, box, done = self._cmds.get_nowait()
            except queue.Empty:
                return
            try:
                box.update(self._execute(cmd))
            except Exception as e:  # reply rather than kill the session
                box.update({"ok": False, "error": repr(e)})
            done.set()

    def _execute(self, cmd: dict) -> dict:
        from . import checkpoint, trajectory

        slam = self.slam
        name = cmd.get("cmd")
        if name == "status":
            return {
                "ok": True, "state": int(slam.state),
                "n_kf": int(slam.n_kf), "n_pts": int(slam.n_pts),
                "frame_id": int(slam.frame_id),
                "localization_only": bool(slam.localization_only),
                "n_closures": len(slam.loop_closer.closures)
                if slam.loop_closer is not None else 0,
            }
        if name == "save_map":
            digest = checkpoint.save_atlas(cmd["path"], slam)
            return {"ok": True, "path": cmd["path"], "md5": digest}
        if name == "save_traj":
            fmt = cmd.get("format", "tum")
            traj = slam.get_trajectory()
            writer = {
                "tum": trajectory.save_tum,
                "euroc": trajectory.save_euroc,
                "kitti": trajectory.save_kitti,
            }.get(fmt)
            if writer is None:
                return {"ok": False, "error": f"unknown format {fmt!r}"}
            writer(cmd["path"], traj)
            return {"ok": True, "path": cmd["path"], "n_poses": len(traj)}
        if name == "localization_mode":
            if cmd.get("on"):
                slam.activate_localization_mode()
            else:
                slam.deactivate_localization_mode()
            return {"ok": True, "localization_only": bool(slam.localization_only)}
        return {"ok": False, "error": f"unknown cmd {name!r}"}

    def close(self):
        self._closing = True
        try:
            self._srv.close()
        finally:
            if os.path.exists(self.sock_path):
                os.unlink(self.sock_path)


class ControlClient:
    """Line-oriented client for ``ControlServer`` (the rosservice-call
    counterpart; also usable from any language — it is just JSONL)."""

    def __init__(self, sock_path: str, timeout: float = 60.0):
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.settimeout(timeout)
        self._sock.connect(sock_path)
        self._f = self._sock.makefile("r")

    def call(self, cmd: str, **kw) -> dict:
        self._sock.sendall((json.dumps({"cmd": cmd, **kw}) + "\n").encode())
        return json.loads(self._f.readline())

    def subscribe(self):
        """Generator of live events (call after ``call('subscribe')``-
        style handshake is done internally)."""
        self._sock.sendall((json.dumps({"cmd": "subscribe"}) + "\n").encode())
        ack = json.loads(self._f.readline())
        if not ack.get("ok"):
            raise RuntimeError(f"subscribe refused: {ack}")
        for line in self._f:
            yield json.loads(line)

    def close(self):
        self._sock.close()
