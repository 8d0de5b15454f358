"""Masked GP core math: posterior factorization, marginal likelihood,
hyperpriors.

TPU-native design notes (vs `gplite/private/gplite_core.m`):

- All shapes are static: the training set lives in padded buffers of bucketed
  size N_max with a boolean mask, so the whole fit pipeline is jit-compiled
  once per bucket instead of recompiling as points accrue.  Masked-out rows
  are replaced by identity rows in the Gram matrix, contributing exactly zero
  to the likelihood and posterior.
- Gradients of the marginal likelihood come from autodiff through the
  Cholesky (replacing the 250-line hand-derived gradient in
  `gplite_core.m:200-274`).
- Batching over hyperparameter samples is a `vmap` axis; there is no loop
  over samples anywhere downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, solve_triangular
from jax.scipy.special import gammaln

from vbmc_tpu.gp.config import GPConfig
from vbmc_tpu.gp.kernels import kernel_cross
from vbmc_tpu.gp.means import mean_function
from vbmc_tpu.gp.noise import noise_variance

_LOG2PI = 1.8378770664093453


class Posterior(NamedTuple):
    alpha: jnp.ndarray   # (N,)  B^{-1} (y - m), zero on padded rows
    L: jnp.ndarray       # (N,N) lower Cholesky of masked B = K + diag(sn2)
    Binv: jnp.ndarray    # (N,N) B^{-1} — hot paths become GEMMs on the MXU
    sn2: jnp.ndarray     # (N,)  per-point noise variance
    chol_ok: jnp.ndarray  # () bool — Cholesky succeeded without escalation


def gram_matrix(cfg: GPConfig, hyp: jnp.ndarray, X: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """Masked Gram matrix: identity rows/cols for padded entries."""
    K = kernel_cross(cfg, hyp, X, X)
    m = mask.astype(K.dtype)
    Mo = m[:, None] * m[None, :]
    return K * Mo


def _system_matrix(cfg: GPConfig, hyp: jnp.ndarray, X, y, s2, mask):
    K = gram_matrix(cfg, hyp, X, mask)
    m = mask.astype(K.dtype)
    sn2 = noise_variance(cfg, hyp[cfg.sl_noise], X, y=y, s2=s2)
    diag = sn2 * m + (1.0 - m)  # unit diagonal on padded rows
    B = K + jnp.diag(diag)
    return B, sn2


def robust_cholesky(B: jnp.ndarray):
    """Cholesky with jitter escalation (cf. `gplite_core.m:78-95`).

    Non-differentiable (uses `lax.while_loop`); for final posterior builds.
    Returns (L, ok_first_try).
    """
    n = B.shape[0]
    scale = jnp.mean(jnp.abs(jnp.diag(B)))
    eye = jnp.eye(n, dtype=B.dtype)

    def ok(L):
        return jnp.all(jnp.isfinite(jnp.diagonal(L)))

    L0 = jnp.linalg.cholesky(B)
    first_ok = ok(L0)

    def cond(c):
        t, L = c
        return (~ok(L)) & (t < 12)

    def body(c):
        t, _ = c
        jitter = scale * (10.0 ** (t - 12))  # starts at ~1e-12 * scale
        return t + 1, jnp.linalg.cholesky(B + jitter * eye)

    _, L = jax.lax.while_loop(cond, body, (jnp.array(1), L0))
    return L, first_ok


def build_posterior(cfg: GPConfig, hyp: jnp.ndarray, X, y, s2, mask,
                    robust: bool = True) -> Posterior:
    """Posterior factorization for one hyperparameter vector."""
    B, sn2 = _system_matrix(cfg, hyp, X, y, s2, mask)
    m = mask.astype(X.dtype)
    r = (y - mean_function(cfg, hyp[cfg.sl_mean], X)) * m
    if robust:
        L, ok = robust_cholesky(B)
    else:
        L = jnp.linalg.cholesky(B)
        ok = jnp.all(jnp.isfinite(jnp.diagonal(L)))
    alpha = cho_solve((L, True), r) * m
    # Explicit inverse: downstream quadratic forms (prediction variance,
    # quadrature covariance, IS precomputes) become batched matmuls —
    # MXU-shaped — instead of triangular solves. The Cholesky (with jitter
    # escalation) keeps the factorization stable; the inverse is only used
    # inside clamped quadratic forms.
    eye = jnp.eye(B.shape[0], dtype=B.dtype)
    Binv = cho_solve((L, True), eye)
    return Posterior(alpha=alpha, L=L, Binv=Binv, sn2=sn2, chol_ok=ok)


def neg_log_marginal_likelihood(cfg: GPConfig, hyp: jnp.ndarray, X, y, s2,
                                mask) -> jnp.ndarray:
    """Masked negative log marginal likelihood (differentiable).

    Padded rows contribute 0: their residual is zero and their Cholesky
    diagonal is one.
    """
    B, _ = _system_matrix(cfg, hyp, X, y, s2, mask)
    m = mask.astype(X.dtype)
    r = (y - mean_function(cfg, hyp[cfg.sl_mean], X)) * m
    L = jnp.linalg.cholesky(B)
    a = cho_solve((L, True), r)
    n_real = jnp.sum(m)
    nlZ = (0.5 * jnp.dot(r, a)
           + jnp.sum(jnp.log(jnp.diagonal(L)) * m)
           + 0.5 * n_real * _LOG2PI)
    return nlZ


def hyperprior_logpdf(prior, hyp: jnp.ndarray) -> jnp.ndarray:
    """Log prior over hyperparameters (cf. `gplite/gplite_hypprior.m`).

    Per-hyperparameter: Student-t(df) if df in (0, inf), Gaussian if df <= 0
    or infinite, flat where sigma is non-finite. Bounds are enforced by the
    optimizer/sampler, not here.
    """
    mu, sigma, df = prior.mu, prior.sigma, prior.df
    has_prior = jnp.isfinite(sigma)
    sigma_s = jnp.where(has_prior, sigma, 1.0)
    z = (hyp - jnp.where(has_prior, mu, 0.0)) / sigma_s

    df_s = jnp.where((df > 0) & jnp.isfinite(df), df, 1.0)
    lp_t = (gammaln(0.5 * (df_s + 1.0)) - gammaln(0.5 * df_s)
            - 0.5 * jnp.log(jnp.pi * df_s) - jnp.log(sigma_s)
            - 0.5 * (df_s + 1.0) * jnp.log1p(z * z / df_s))
    lp_g = -0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(sigma_s) - 0.5 * z * z

    use_t = (df > 0) & jnp.isfinite(df)
    lp = jnp.where(use_t, lp_t, lp_g)
    return jnp.sum(jnp.where(has_prior, lp, 0.0))


def gp_log_posterior(cfg: GPConfig, prior, hyp, X, y, s2, mask):
    """Unnormalized log posterior of hyperparameters (sampling target)."""
    return (-neg_log_marginal_likelihood(cfg, hyp, X, y, s2, mask)
            + hyperprior_logpdf(prior, hyp))


def solve_K(post: Posterior, v: jnp.ndarray) -> jnp.ndarray:
    """B^{-1} v given the posterior factorization."""
    return cho_solve((post.L, True), v)


def predict_one(cfg: GPConfig, hyp: jnp.ndarray, post: Posterior, X, y, mask,
                Xstar):
    """Latent mean/variance at Xstar for one hyperparameter sample.

    GEMM-shaped: k(X,X*) products against the stored B^{-1} instead of
    triangular solves. Returns (fmu (M,), fs2 (M,)).
    """
    m = mask.astype(X.dtype)
    ks = kernel_cross(cfg, hyp, X, Xstar) * m[:, None]     # (N, M)
    fmu = mean_function(cfg, hyp[cfg.sl_mean], Xstar) + ks.T @ post.alpha
    qf = jnp.sum(ks * (post.Binv @ ks), axis=0)            # (M,)
    kss = jnp.exp(2.0 * hyp[cfg.idx_log_sf])
    fs2 = jnp.maximum(kss - qf, 0.0)
    return fmu, fs2
