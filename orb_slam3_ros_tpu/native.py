"""ctypes bindings for the native measurement-sync runtime.

The sensor-ingestion layer (role of the reference's ROS callback queues +
SyncWithImu thread, src/ros_mono_inertial.cc:97-184) is C++
(native/measurement_sync.cpp): lock-free SPSC rings per stream, a
synchronizing bundle pop, and uint8->float32 grayscale conversion. The
.so is built on demand with g++ (no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO = os.path.join(_DIR, "libmeasurement_sync.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True)
    lib = ctypes.CDLL(_SO)
    lib.msync_create.restype = ctypes.c_void_p
    lib.msync_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.msync_destroy.argtypes = [ctypes.c_void_p]
    lib.msync_push_frame_u8.restype = ctypes.c_int
    lib.msync_push_frame_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.msync_push_imu.restype = ctypes.c_int
    lib.msync_push_imu.argtypes = [
        ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.msync_pop_bundle.restype = ctypes.c_int
    lib.msync_pop_bundle.argtypes = [
        ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.msync_n_frames.restype = ctypes.c_int
    lib.msync_n_frames.argtypes = [ctypes.c_void_p]
    lib.msync_n_imu.restype = ctypes.c_int
    lib.msync_n_imu.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class MeasurementSync:
    """Lock-free frame+IMU synchronizer (producer thread -> SLAM loop)."""

    def __init__(self, height: int, width: int, frame_cap_log2: int = 5,
                 imu_cap_log2: int = 12, max_imu_per_frame: int = 64):
        lib = _load()
        self._lib = lib
        self._h = lib.msync_create(frame_cap_log2, imu_cap_log2)
        self.height, self.width = height, width
        self.max_imu = max_imu_per_frame
        self._gray = np.empty(height * width, np.float32)
        self._acc = np.empty((max_imu_per_frame, 3), np.float32)
        self._gyro = np.empty((max_imu_per_frame, 3), np.float32)
        self._imu_ts = np.empty(max_imu_per_frame, np.float64)

    def __del__(self):
        try:
            self._lib.msync_destroy(self._h)
        except Exception:
            pass

    # producer ---------------------------------------------------------
    def push_frame(self, ts: float, img: np.ndarray) -> bool:
        img = np.ascontiguousarray(img)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        ch = 1 if img.ndim == 2 else img.shape[2]
        r = self._lib.msync_push_frame_u8(
            self._h, ts, img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.height, self.width, ch,
        )
        return r == 0

    def push_imu(self, ts: float, acc, gyro) -> bool:
        a = np.ascontiguousarray(acc, np.float32)
        g = np.ascontiguousarray(gyro, np.float32)
        r = self._lib.msync_push_imu(
            self._h, ts, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return r == 0

    # consumer ---------------------------------------------------------
    def pop_bundle(self, imu_latency_slack: float = 0.0):
        """Returns (ts, gray [H,W] f32, acc [M,3], gyro [M,3], imu_ts [M])
        or None when not ready."""
        ts = ctypes.c_double()
        n_imu = ctypes.c_int()
        r = self._lib.msync_pop_bundle(
            self._h, imu_latency_slack,
            self._gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._gray.size, ctypes.byref(ts),
            self._acc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._gyro.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._imu_ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.max_imu, ctypes.byref(n_imu),
        )
        if r != 1:
            return None
        m = n_imu.value
        return (
            ts.value,
            self._gray.reshape(self.height, self.width).copy(),
            self._acc[:m].copy(),
            self._gyro[:m].copy(),
            self._imu_ts[:m].copy(),
        )

    @property
    def n_frames(self):
        return self._lib.msync_n_frames(self._h)

    @property
    def n_imu(self):
        return self._lib.msync_n_imu(self._h)
