"""TPU-native visual-inertial SLAM engine.

A from-scratch re-design of the capabilities of ORB-SLAM3 (reference:
/root/reference, giltchcity/orb_slam3_ros) for TPU hardware:

- the feature front-end (ORB pyramid / FAST / oriented-BRIEF, reference
  ``orb_slam3/src/ORBextractor.cc``) is a set of batched JAX/Pallas kernels
  with fixed-capacity outputs,
- descriptor matching (reference ``orb_slam3/src/ORBmatcher.cc``) is an MXU
  matmul over sign-expanded binary descriptors,
- bundle adjustment / pose-graph optimization (reference
  ``orb_slam3/src/Optimizer.cc`` + vendored g2o) is a batched
  Levenberg-Marquardt solver with an explicit Schur complement,
- the map (reference ``Atlas/Map/KeyFrame/MapPoint`` pointer graph) is an
  immutable fixed-capacity array-of-structs ``MapState`` updated by pure
  functions,
- multi-chip scale-out shards BA edge tables over a ``jax.sharding.Mesh``
  and reduces normal equations with ``psum`` over ICI (no reference
  counterpart; the reference is single-process pthreads).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/solver math is f32 3x3/6x6 linear algebra; TPU's default bf16
# matmul precision is far too coarse for pose optimization (the reference
# even runs its g2o solves in f64, Optimizer.cc:1220). Hot large matmuls
# (e.g. the MXU Hamming matcher) opt back into bf16 explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")
