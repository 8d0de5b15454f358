"""Sampling from the GP surrogate (cf. `gplite/gplite_sample.m`,
`misc/gpsample_vbmc.m`): MCMC draws from the density proportional to
exp(posterior mean) — used for the GP-based sampling mode of `vp_rnd`,
plotting, and diagnostics — plus joint prior/posterior function draws
(cf. `gplite/gplite_rnd.m`)."""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vbmc_tpu.gp.config import GPConfig
from vbmc_tpu.gp.gp import GP
from vbmc_tpu.gp import core
from vbmc_tpu.gp.fit import get_hpd
from vbmc_tpu.samplers.ensemble import ensemble_slice_sample


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def _gp_mcmc(cfg: GPConfig, gp: GP, key, x0s, lb, ub, n_steps: int,
             beta: float = 0.0):
    """Ensemble-slice MCMC on log density = posterior mean (+ beta * SD)."""
    def logpdf(x):
        fmu, fs2 = jax.vmap(
            lambda hyp, alpha, L, Binv, sn2, betabar, HBinv, Ainv:
            core.predict_one(
                cfg, hyp,
                core.Posterior(alpha, L, Binv, sn2, jnp.asarray(True),
                               betabar=betabar, HBinv=HBinv, Ainv=Ainv),
                gp.X, gp.y, gp.mask, x[None, :])
        )(gp.hyp, gp.alpha, gp.L, gp.Binv, gp.sn2, gp.betabar, gp.HBinv,
          gp.Ainv)
        m = gp.hyp_mask.astype(x.dtype)
        ns = jnp.maximum(jnp.sum(m), 1.0)
        fbar = jnp.sum(fmu[:, 0] * m) / ns
        sbar = jnp.sqrt(jnp.maximum(jnp.sum(fs2[:, 0] * m) / ns, 0.0))
        return fbar + beta * sbar

    return ensemble_slice_sample(key, logpdf, x0s, lb, ub, n_steps)


def gp_sample(cfg: GPConfig, gp: GP, n_samples: int, key=None,
              x0: Optional[np.ndarray] = None, beta: float = 0.0,
              bounds=None) -> np.ndarray:
    """Draw ~n_samples points from exp(GP posterior mean) via ensemble-slice
    MCMC with HPD starting walkers (`gplite_sample.m:52-103`)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    D = gp.D
    dtype = gp.X.dtype
    mask = np.asarray(gp.mask, bool)
    X = np.asarray(gp.X)[mask]
    y = np.asarray(gp.y)[mask]
    W = 2 * (D + 1)
    X_hpd, _ = get_hpd(X, y, 0.25)
    idx = np.resize(np.arange(X_hpd.shape[0]), W)
    x0s = X_hpd[idx] + 1e-3 * np.random.default_rng(0).standard_normal((W, D))
    if x0 is not None:
        x0s[0] = x0
    if bounds is None:
        span = X.max(0) - X.min(0)
        lb = X.min(0) - 0.5 * span
        ub = X.max(0) + 0.5 * span
    else:
        lb, ub = bounds
    n_steps = int(np.ceil(n_samples / W)) + 5
    walkers, _ = _gp_mcmc(cfg, gp, key, jnp.asarray(x0s, dtype=dtype),
                          jnp.asarray(lb, dtype=dtype),
                          jnp.asarray(ub, dtype=dtype), n_steps, beta)
    flat = np.asarray(walkers)[5:].reshape(-1, D)   # drop burn-in sweeps
    return flat[:n_samples]


def gp_rnd(cfg: GPConfig, gp: GP, Xstar: np.ndarray, key=None,
           n_draws: int = 1, posterior: bool = True) -> np.ndarray:
    """Joint function draws at Xstar from the GP prior or posterior
    (cf. `gplite/gplite_rnd.m`), using the first active hyp sample."""
    from vbmc_tpu.gp.kernels import kernel_cross
    from vbmc_tpu.gp.means import mean_function
    from jax.scipy.linalg import solve_triangular

    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = gp.X.dtype
    Xs = jnp.asarray(Xstar, dtype=dtype)
    hyp = gp.hyp[0]
    M = Xs.shape[0]
    Kss = kernel_cross(cfg, hyp, Xs, Xs)
    m = mean_function(cfg, hyp[cfg.sl_mean], Xs)
    if posterior:
        ks = kernel_cross(cfg, hyp, gp.X, Xs) * gp.mask.astype(dtype)[:, None]
        fmu = m + ks.T @ gp.alpha[0]
        V = solve_triangular(gp.L[0], ks, lower=True)
        cov = Kss - V.T @ V
    else:
        fmu = m
        cov = Kss
    L = jnp.linalg.cholesky(cov + 1e-10 * jnp.eye(M, dtype=dtype)
                            * jnp.max(jnp.diagonal(Kss)))
    eps = jax.random.normal(key, (n_draws, M), dtype=dtype)
    return np.asarray(fmu[None, :] + eps @ L.T)


def gp_fmin(cfg: GPConfig, gp: GP, maximize: bool = False, n_starts: int = 8):
    """Optimum of the GP posterior mean via multi-start L-BFGS from the best
    training points (cf. `gplite/gplite_fmin.m`). Returns (x_opt, f_opt)."""
    from vbmc_tpu.optim import minimize_lbfgs_bounded
    from vbmc_tpu.gp.predict import gp_predict

    mask = np.asarray(gp.mask, bool)
    X = np.asarray(gp.X)[mask]
    y = np.asarray(gp.y)[mask]
    sign = -1.0 if maximize else 1.0
    order = np.argsort(sign * y)[:n_starts]
    dtype = gp.X.dtype
    span = X.max(0) - X.min(0)
    lb = jnp.asarray(X.min(0) - 0.5 * span, dtype=dtype)
    ub = jnp.asarray(X.max(0) + 0.5 * span, dtype=dtype)

    def obj(x):
        fbar, _, _, _ = gp_predict(cfg, gp, x[None, :])
        return sign * fbar[0]

    def run(x0):
        return minimize_lbfgs_bounded(obj, x0, lb, ub, maxiter=60)

    xs, fs = jax.vmap(run)(jnp.asarray(X[order], dtype=dtype))
    best = int(jnp.argmin(fs))
    return np.asarray(xs[best]), float(sign * fs[best])


def gp_quantile_pred(cfg: GPConfig, gp: GP, Xstar,
                     quantiles=(0.025, 0.5, 0.975)):
    """Quantiles of the predictive mixture over hyperparameter samples
    (cf. `gplite/gplite_qpred.m`): mixture-CDF inversion on a grid."""
    from vbmc_tpu.gp.predict import gp_predict_full

    fmu, fs2 = gp_predict_full(cfg, gp, jnp.asarray(Xstar, dtype=gp.X.dtype))
    m = np.asarray(gp.hyp_mask, bool)
    fmu = np.asarray(fmu)[m]
    fsd = np.sqrt(np.maximum(np.asarray(fs2)[m], 1e-24))
    zs = np.linspace(1e-4, 1 - 1e-4, 2001)
    out = np.empty((len(quantiles), fmu.shape[1]))
    for j in range(fmu.shape[1]):
        grid = np.sort(np.concatenate(
            [fmu[:, j] + fsd[:, j] * q for q in (-3, -1, 0, 1, 3)]))
        grid = np.linspace(grid[0] - 2 * fsd[:, j].max(),
                           grid[-1] + 2 * fsd[:, j].max(), 2001)
        cdf = np.mean(_norm_cdf((grid[None, :] - fmu[:, j][:, None])
                                / fsd[:, j][:, None]), axis=0)
        for qi, q in enumerate(quantiles):
            out[qi, j] = np.interp(q, cdf, grid)
    return out


def _norm_cdf(x):
    from math import erf
    return 0.5 * (1.0 + np.vectorize(erf)(x / np.sqrt(2.0)))
