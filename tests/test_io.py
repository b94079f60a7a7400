"""Tests for checkpointing, settings parsing, and trajectory export."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_ros_tpu.models import map_state
from orb_slam3_ros_tpu.utils import checkpoint, config, trajectory


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, rng):
        m = map_state.empty_map(K=8, N=64, P=256)
        m = m._replace(
            kf_valid=m.kf_valid.at[0].set(True),
            pt_X=jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32)),
            pt_valid=m.pt_valid.at[:100].set(True),
        )
        path = str(tmp_path / "map")
        digest = checkpoint.save_map(path, m, {"n_kf": 1, "n_pts": 100})
        assert len(digest) == 32
        m2, counters = checkpoint.load_map(path)
        assert counters["n_kf"] == 1
        for f in m._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(m, f)), np.asarray(getattr(m2, f)), err_msg=f
            )

    def test_checksum_detects_corruption(self, tmp_path, rng):
        m = map_state.empty_map(K=4, N=32, P=64)
        path = str(tmp_path / "map")
        checkpoint.save_map(path, m, {})
        with open(path + ".npz", "r+b") as f:
            f.seek(50)
            f.write(b"XX")
        with pytest.raises(ValueError, match="checksum"):
            checkpoint.load_map(path)

    def test_system_roundtrip(self, tmp_path):
        from orb_slam3_ros_tpu.models.system import MonoSlam

        cam = np.asarray([200.0, 200.0, 96.0, 64.0, 0, 0, 0, 0, 0], np.float32)
        s1 = MonoSlam(height=128, width=192, cam_params=cam, n_features=200,
                      max_keyframes=8, max_points=256)
        s1.n_kf = 3; s1.n_pts = 42; s1.state = 1
        s1.R_cur = np.asarray(np.diag([1., -1., -1.]), np.float32)
        path = str(tmp_path / "sys")
        checkpoint.save_system(path, s1)
        s2 = MonoSlam(height=128, width=192, cam_params=cam, n_features=200,
                      max_keyframes=8, max_points=256)
        checkpoint.load_system(path, s2)
        assert s2.n_kf == 3 and s2.n_pts == 42 and s2.state == 1
        np.testing.assert_allclose(s2.R_cur, s1.R_cur)


EUROC_YAML = """
%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
IMU.NoiseGyro: 1.7e-04
IMU.NoiseAcc: 2.0e-03
IMU.GyroWalk: 1.9e-05
IMU.AccWalk: 3.0e-03
IMU.Frequency: 200.0
IMU.T_b_c1: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


class TestSettings:
    def test_parse_euroc_schema(self):
        s = config.load_settings(EUROC_YAML)
        assert s.camera_type == "PinHole"
        np.testing.assert_allclose(s.cam_params[0], 458.654)
        np.testing.assert_allclose(s.cam_params[4], -0.28340811)
        assert s.width == 752 and s.height == 480
        assert s.has_imu and s.imu_freq == 200.0
        assert s.T_b_c1.shape == (4, 4)
        np.testing.assert_allclose(s.T_b_c1[1, 0], 0.999557249008)
        assert s.n_features == 1000

    def test_imu_calib_scaling(self):
        s = config.load_settings(EUROC_YAML)
        calib = config.imu_calib_from_settings(s)
        sf = np.sqrt(200.0)
        np.testing.assert_allclose(float(calib.sigma_g[0]), 1.7e-4 * sf, rtol=1e-5)
        np.testing.assert_allclose(float(calib.sigma_gw[0]), 1.9e-5 / sf, rtol=1e-5)
        assert calib.R_bc.shape == (3, 3)

    def test_missing_required_raises(self):
        s = config.load_settings("Camera.fx: 100.0\n")
        with pytest.raises(KeyError):
            s.require("Camera.fy")


class TestTrajectory:
    def test_tum_roundtrip(self, tmp_path, rng):
        from orb_slam3_ros_tpu.ops import lie

        traj = []
        for i in range(5):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3).astype(np.float32) * 0.5)))
            T[:3, 3] = rng.normal(size=3)
            traj.append((float(i) * 0.1, T))
        p = str(tmp_path / "traj.txt")
        trajectory.save_tum(p, traj)
        ts, pos, quat = trajectory.load_tum(p)
        assert len(ts) == 5
        np.testing.assert_allclose(pos[2], traj[2][1][:3, 3], atol=1e-6)
        nrm = np.linalg.norm(quat, axis=1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-5)

    def test_kitti_format(self, tmp_path):
        T = np.eye(4, dtype=np.float32)
        p = str(tmp_path / "k.txt")
        trajectory.save_kitti(p, [(0.0, T), (0.1, T)])
        rows = np.loadtxt(p)
        assert rows.shape == (2, 12)


class TestVizAndEvalCLI:
    def test_draw_map_renders(self, tmp_path):
        from orb_slam3_ros_tpu.models.system import MonoSlam
        from orb_slam3_ros_tpu.utils import viz

        cam = np.asarray([200.0, 200.0, 96.0, 64.0, 0, 0, 0, 0, 0], np.float32)
        slam = MonoSlam(height=128, width=192, cam_params=cam, n_features=200,
                        max_keyframes=8, max_points=256)
        p = str(tmp_path / "map.png")
        viz.draw_map(slam, p)
        assert os.path.getsize(p) > 1000

    def test_evaluate_cli(self, tmp_path, rng):
        from orb_slam3_ros_tpu import evaluate
        from orb_slam3_ros_tpu.utils import trajectory as tr

        traj = []
        for i in range(10):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [i * 0.1, 0, 0]
            traj.append((i * 0.1, T))
        est = str(tmp_path / "est.txt"); gt = str(tmp_path / "gt.txt")
        tr.save_tum(est, traj)
        # gt = est scaled by 2 and shifted
        traj_g = [(ts, T.copy()) for ts, T in traj]
        for ts, T in traj_g:
            T[:3, 3] = T[:3, 3] * 2.0 + np.asarray([1, 2, 3], np.float32)
        tr.save_tum(gt, traj_g)
        rc = evaluate.main([est, gt])
        assert rc == 0


class TestAtlasCheckpoint:
    """Whole-session checkpoint (System::SaveAtlas role,
    System.cc:1417-1533): active map + archived Atlas maps + loop edges
    survive a save/load round-trip."""

    def _populated_system(self, rng):
        from orb_slam3_ros_tpu.models.atlas import ArchivedMap
        from orb_slam3_ros_tpu.models.system import MonoSlam

        cam = np.asarray([200.0, 200.0, 96.0, 64.0, 0, 0, 0, 0, 0], np.float32)
        s = MonoSlam(height=128, width=192, cam_params=cam, n_features=200,
                     max_keyframes=8, max_points=256,
                     enable_atlas=True, enable_loop_closing=True)
        s.map = s.map._replace(
            kf_valid=s.map.kf_valid.at[:3].set(True),
            pt_X=jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32)),
            pt_valid=s.map.pt_valid.at[:50].set(True),
        )
        s.n_kf, s.n_pts, s.state = 3, 50, 1
        # two archived maps with distinct content
        for k in range(2):
            m = map_state.empty_map(8, s.N, 256)
            m = m._replace(
                kf_valid=m.kf_valid.at[: 2 + k].set(True),
                pt_X=jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32)),
            )
            s.atlas.maps.append(ArchivedMap(
                m=m, n_kf=2 + k, n_pts=10 * (k + 1),
                sigs=jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32)),
            ))
        # a persistent loop edge
        s.loop_closer._record_loop_edge(
            2, 0, np.eye(3, dtype=np.float32),
            np.asarray([0.1, 0, 0], np.float32), 1.0,
        )
        return s

    def test_atlas_roundtrip(self, tmp_path, rng):
        from orb_slam3_ros_tpu.models.system import MonoSlam

        s1 = self._populated_system(rng)
        path = str(tmp_path / "atlas")
        digest = checkpoint.save_atlas(path, s1)
        assert len(digest) == 32

        cam = np.asarray([200.0, 200.0, 96.0, 64.0, 0, 0, 0, 0, 0], np.float32)
        s2 = MonoSlam(height=128, width=192, cam_params=cam, n_features=200,
                      max_keyframes=8, max_points=256,
                      enable_atlas=True, enable_loop_closing=True)
        checkpoint.load_atlas(path, s2)
        assert s2.n_kf == 3 and s2.n_pts == 50 and s2.state == 1
        assert len(s2.atlas.maps) == 2
        for am1, am2 in zip(s1.atlas.maps, s2.atlas.maps):
            assert am1.n_kf == am2.n_kf and am1.n_pts == am2.n_pts
            np.testing.assert_array_equal(
                np.asarray(am1.m.pt_X), np.asarray(am2.m.pt_X))
            np.testing.assert_array_equal(
                np.asarray(am1.sigs), np.asarray(am2.sigs))
        np.testing.assert_array_equal(
            np.asarray(s1.map.pt_X), np.asarray(s2.map.pt_X))
        assert s2.loop_closer._n_edges == 1
        np.testing.assert_allclose(
            s2.loop_closer._edge_t[0], [0.1, 0, 0], atol=1e-7)

    def test_atlas_checksum(self, tmp_path, rng):
        s1 = self._populated_system(rng)
        path = str(tmp_path / "atlas")
        checkpoint.save_atlas(path, s1)
        with open(path + ".npz", "r+b") as f:
            f.seek(60)
            f.write(b"ZZ")
        from orb_slam3_ros_tpu.models.system import MonoSlam

        cam = np.asarray([200.0, 200.0, 96.0, 64.0, 0, 0, 0, 0, 0], np.float32)
        s2 = MonoSlam(height=128, width=192, cam_params=cam, n_features=200,
                      max_keyframes=8, max_points=256, enable_atlas=True)
        with pytest.raises(ValueError, match="checksum"):
            checkpoint.load_atlas(path, s2)


@pytest.mark.slow
class TestPointCloudEvents:
    def test_points_every_emits_cloud_and_markers(self):
        """The points_every cadence must emit tracked_points/map_points/
        kf_markers events through on_frame (the headless shape of the
        reference's point-cloud + marker publishers, src/common.cc:
        273-369)."""
        from orb_slam3_ros_tpu.models.system import MonoSlam, OK
        from orb_slam3_ros_tpu.utils import synth

        seq = synth.make_sequence(n_frames=20, height=240, width=376,
                                  dt=0.1, seed=3)
        events = []
        slam = MonoSlam(height=240, width=376, cam_params=seq.cam_params,
                        n_features=1200, max_keyframes=16, max_points=2048,
                        points_every=4)
        slam.on_frame = events.append
        for i in range(20):
            slam.process_frame(seq.images[i], float(seq.timestamps[i]))
        slam.flush()
        assert slam.state == OK
        kinds = {e["event"] for e in events}
        assert {"frame", "map_points", "kf_markers",
                "tracked_points"} <= kinds, kinds
        mp = [e for e in events if e["event"] == "map_points"][-1]
        assert mp["n"] > 50 and mp["points"].shape == (mp["n"], 3)
        km = [e for e in events if e["event"] == "kf_markers"][-1]
        assert km["n"] >= 2
