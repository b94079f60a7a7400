"""Robust-loss reweighting (IRLS) — role of g2o's RobustKernelHuber etc.

The reference attaches Huber kernels to every BA edge
(orb_slam3/Thirdparty/g2o/g2o/core/robust_kernel_impl.h, used e.g. at
Optimizer.cc:1216 with delta = sqrt(5.991)). In an IRLS formulation the
kernel becomes a per-edge weight multiplying the information matrix.
"""

from __future__ import annotations

import jax.numpy as jnp

# Chi-square 95% quantiles used throughout the reference.
CHI2_MONO = 5.991  # 2 DoF (Optimizer.cc:1213)
CHI2_STEREO = 7.815  # 3 DoF (Optimizer.cc:1260)


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber loss given squared error ``chi2``.

    rho(s) = s                     for s <= delta^2
           = 2 delta sqrt(s) - delta^2  otherwise
    => weight = drho/ds = min(1, delta / sqrt(s)).
    """
    s = jnp.maximum(chi2, 1e-12)
    return jnp.minimum(1.0, jnp.sqrt(delta2 / s))


def cauchy_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    return 1.0 / (1.0 + chi2 / delta2)


def tukey_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    r = chi2 / delta2
    w = jnp.where(r < 1.0, (1.0 - r) ** 2, 0.0)
    return w
