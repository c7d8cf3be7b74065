"""Robust losses for iteratively-reweighted least squares.

The reference uses g2o's Huber kernel with delta = sqrt(5.991) for 2-DoF
residuals and sqrt(7.815) for 3-DoF (`/root/reference/src/Optimizer.cc:98-101`,
`src/OptimizerBirdview.cc:207-211`). We express the kernels as IRLS weights:
w(r) = rho'(r^2) applied multiplicatively to the squared residual in the
normal equations.
"""
from __future__ import annotations

import jax.numpy as jnp

# chi-square 95% quantiles used throughout the reference
CHI2_2DOF = 5.991
CHI2_3DOF = 7.815


def huber_weight(chi2, delta2):
    """IRLS weight for Huber on squared error: 1 if chi2<=delta2 else
    delta/sqrt(chi2)."""
    safe = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, jnp.ones_like(chi2), delta / safe)


def huber_rho(chi2, delta2):
    """Huber robust cost of a squared error."""
    delta = jnp.sqrt(delta2)
    r = jnp.sqrt(jnp.maximum(chi2, 0.0))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * r - delta2)


def cauchy_weight(chi2, delta2):
    return 1.0 / (1.0 + chi2 / delta2)
