"""Persistent XLA compilation cache for TPU runs.

Measured on the axon TPU tunnel: a 2048x2048 einsum+sin program costs
57.9 s to compile cold and 1.47 s with a warm cache — the pipeline's
full warmup (chunk loops, VI-BA ladder, closure + GBA programs) drops
from ~6-8 minutes to seconds on every run after the first. The cache is
DELIBERATELY NOT enabled for CPU runs: XLA:CPU AOT cache entries record
compile-machine features (+prefer-no-scatter/+prefer-no-gather) that the
loader rejects on reload (SIGILL risk — see tests/conftest.py).
"""

from __future__ import annotations

import os


def enable_on_tpu(path: str | None = None) -> bool:
    """Enable the persistent compilation cache iff the default backend
    is a real accelerator. Call BEFORE the first jit compilation (import
    time of the benchmark/driver scripts). Returns True if enabled."""
    import jax

    try:
        plat = jax.default_backend()
    except Exception:
        return False
    if plat == "cpu":
        return False
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".xla_cache",
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return True
