"""GP observation-noise functions (cf. `gplite/gplite_noisefun.m`).

Total noise variance at each training point is the sum of independent
features: base constant noise, user-provided (optionally rescaled) noise,
and rectified-linear output-dependent noise.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vbmc_tpu.gp.config import GPConfig


def noise_variance(cfg: GPConfig, hyp_noise: jnp.ndarray, X: jnp.ndarray,
                   y=None, s2=None) -> jnp.ndarray:
    """Per-point noise variance (N,). hyp_noise: (Nnoise,)."""
    n = X.shape[0]
    dtype = X.dtype
    sn2 = jnp.zeros(n, dtype=dtype)
    idx = 0
    if cfg.const_noise == 1:
        sn2 = sn2 + jnp.exp(2.0 * hyp_noise[idx])
        idx += 1
    else:
        sn2 = sn2 + jnp.finfo(dtype).eps
    if cfg.user_noise == 1:
        sn2 = sn2 + (s2 if s2 is not None else 0.0)
    elif cfg.user_noise == 2:
        sn2 = sn2 + jnp.exp(hyp_noise[idx]) * (s2 if s2 is not None else 0.0)
        idx += 1
    if cfg.output_noise == 1:
        ythresh = hyp_noise[idx]
        w2 = jnp.exp(2.0 * hyp_noise[idx + 1])
        zz = jnp.maximum(0.0, ythresh - (y if y is not None else 0.0))
        sn2 = sn2 + w2 * zz * zz
        idx += 2
    return sn2


def noise_info(cfg: GPConfig, y: np.ndarray):
    """Bounds / plausible box / x0 for noise hyperparameters (host-side)."""
    nn = cfg.nnoise
    ToL = 1e-6
    lb = np.full(nn, -np.inf)
    ub = np.full(nn, np.inf)
    plb = np.full(nn, -np.inf)
    pub = np.full(nn, np.inf)
    x0 = np.full(nn, np.nan)
    if nn == 0:
        return dict(lb=lb, ub=ub, plb=plb, pub=pub, x0=x0)
    if y.size <= 1:
        y = np.array([0.0, 1.0])
    height = max(y.max() - y.min(), 1e-10)
    idx = 0
    if cfg.const_noise == 1:
        lb[idx] = np.log(ToL)
        ub[idx] = np.log(height)
        plb[idx] = 0.5 * np.log(ToL)
        pub[idx] = np.log(max(np.std(y, ddof=1), 1e-10))
        x0[idx] = np.log(1e-3)
        idx += 1
    if cfg.user_noise == 2:
        lb[idx] = np.log(1e-3)
        ub[idx] = np.log(1e3)
        plb[idx] = np.log(0.5)
        pub[idx] = np.log(2.0)
        x0[idx] = np.log(1.0)
        idx += 1
    if cfg.output_noise == 1:
        miny, maxy = y.min(), y.max()
        D_guess = 1  # caller overrides bounds for output-dependent noise
        lb[idx] = miny
        ub[idx] = maxy
        plb[idx] = miny
        pub[idx] = max(maxy - 5 * D_guess, miny)
        x0[idx] = max(maxy - 10 * D_guess, miny)
        idx += 1
        lb[idx] = np.log(1e-3)
        ub[idx] = np.log(0.1)
        plb[idx] = np.log(0.01)
        pub[idx] = np.log(0.1)
        x0[idx] = np.log(0.1)
        idx += 1
    nan = np.isnan(x0)
    x0[nan] = 0.5 * (plb[nan] + pub[nan])
    return dict(lb=lb, ub=ub, plb=plb, pub=pub, x0=x0)
