"""Covariance functions (cf. `gplite/gplite_covfun.m`).

Gram matrices are computed as one large matmul plus elementwise transform —
the shape XLA fuses well on TPU (MXU for the distance matmul, VPU for the
exp). All functions are dense over padded shapes; masking happens in
`core.py`.
"""

from __future__ import annotations

import jax.numpy as jnp

from vbmc_tpu.gp.config import GPConfig, COV_SEARD, COV_MATERN5
from vbmc_tpu.utils.math import sq_dist


def kernel_cross(cfg: GPConfig, hyp: jnp.ndarray, Xa: jnp.ndarray,
                 Xb: jnp.ndarray) -> jnp.ndarray:
    """k(Xa, Xb) for a single hyperparameter vector. (n,m) output."""
    ell = jnp.exp(hyp[cfg.sl_log_ell])
    sf2 = jnp.exp(2.0 * hyp[cfg.idx_log_sf])
    A = Xa / ell
    B = Xb / ell
    d2 = sq_dist(A, B)
    if cfg.covfun == COV_SEARD:
        return sf2 * jnp.exp(-0.5 * d2)
    elif cfg.covfun == COV_MATERN5:
        t = jnp.sqrt(5.0 * jnp.maximum(d2, 0.0))
        return sf2 * (1.0 + t + t * t / 3.0) * jnp.exp(-t)
    raise ValueError(f"unsupported covfun {cfg.covfun}")


def kernel_diag(cfg: GPConfig, hyp: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """k(x,x) for each row of X: constant sf^2 for stationary kernels."""
    sf2 = jnp.exp(2.0 * hyp[cfg.idx_log_sf])
    return jnp.full(X.shape[0], sf2, dtype=X.dtype)
