"""Tests for the native C++ measurement-sync runtime."""

import threading
import time

import numpy as np
import pytest

from orb_slam3_ros_tpu.native import MeasurementSync


class TestMeasurementSync:
    def test_bundle_pairing(self, rng):
        ms = MeasurementSync(height=8, width=10)
        # 3 frames at t=0.1, 0.2, 0.3; IMU at 100 Hz from 0.0
        imgs = [rng.integers(0, 255, (8, 10)).astype(np.uint8) for _ in range(3)]
        for k in range(35):
            t = 0.005 + k * 0.01
            ms.push_imu(t, np.full(3, k, np.float32), np.full(3, -k, np.float32))
        for i, im in enumerate(imgs):
            ms.push_frame(0.1 * (i + 1), im)
        got = []
        while True:
            b = ms.pop_bundle()
            if b is None:
                break
            got.append(b)
        assert len(got) == 3
        # frame 1 gets samples with ts <= 0.1 (k=0..9), frame 2 k=10..19...
        ts0, gray0, acc0, gyro0, its0 = got[0]
        assert ts0 == pytest.approx(0.1)
        assert (its0 <= 0.1 + 1e-9).all()
        assert len(its0) == 10
        np.testing.assert_allclose(acc0[:, 0], np.arange(10))
        ts1, _, acc1, _, its1 = got[1]
        assert (its1 > 0.1).all() and (its1 <= 0.2 + 1e-9).all()
        np.testing.assert_allclose(acc1[:, 0], np.arange(10, 20))
        # grayscale conversion preserved uint8 values
        np.testing.assert_allclose(gray0, imgs[0].astype(np.float32))

    def test_rgb_to_gray(self, rng):
        ms = MeasurementSync(height=4, width=4)
        rgb = rng.integers(0, 255, (4, 4, 3)).astype(np.uint8)
        ms.push_imu(0.05, np.zeros(3), np.zeros(3))
        ms.push_frame(0.1, rgb)
        ts, gray, *_ = ms.pop_bundle()
        expect = 0.114 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.299 * rgb[..., 2]
        np.testing.assert_allclose(gray, expect, atol=0.01)

    def test_ring_overflow_drops(self, rng):
        ms = MeasurementSync(height=2, width=2, frame_cap_log2=2)  # cap 4
        im = np.zeros((2, 2), np.uint8)
        results = [ms.push_frame(0.1 * i, im) for i in range(8)]
        assert sum(results) == 4 and not all(results)

    def test_threaded_producer(self, rng):
        """Producer thread feeding while consumer drains — the ROS
        callback-thread / tracking-thread topology."""
        ms = MeasurementSync(height=16, width=16)
        n_frames = 40

        def produce():
            for i in range(n_frames):
                t = 0.02 * (i + 1)
                for k in range(4):
                    ms.push_imu(t - 0.02 + 0.005 * (k + 1),
                                np.zeros(3), np.zeros(3))
                while not ms.push_frame(t, np.full((16, 16), i, np.uint8)):
                    time.sleep(0.0005)

        th = threading.Thread(target=produce)
        th.start()
        got = 0
        deadline = time.time() + 10
        while got < n_frames and time.time() < deadline:
            b = ms.pop_bundle()
            if b is None:
                time.sleep(0.0002)
                continue
            ts, gray, acc, gyro, its = b
            assert gray[0, 0] == pytest.approx(got)  # in order
            assert len(its) == 4
            got += 1
        th.join()
        assert got == n_frames
