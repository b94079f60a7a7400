"""Numeric kernels: Lie groups, cameras, IMU, features, matching, solvers."""
