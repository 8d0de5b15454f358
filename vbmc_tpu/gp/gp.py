"""The GP surrogate container: a pytree of padded, masked arrays.

Everything downstream (prediction, Bayesian quadrature, acquisition sweeps)
treats the hyperparameter-sample axis as a leading `vmap`/shard dimension.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from vbmc_tpu.gp.config import GPConfig
from vbmc_tpu.gp import core


class HypPrior(NamedTuple):
    mu: jnp.ndarray      # (Nhyp,)
    sigma: jnp.ndarray   # (Nhyp,)  non-finite => flat prior
    df: jnp.ndarray      # (Nhyp,)  >0 finite => Student-t, else Gaussian
    lb: jnp.ndarray      # (Nhyp,)  hard bounds
    ub: jnp.ndarray
    plb: jnp.ndarray     # (Nhyp,)  plausible box (init design / widths)
    pub: jnp.ndarray


class GP(NamedTuple):
    """Trained GP surrogate with S hyperparameter samples (padded to S_max)."""

    X: jnp.ndarray         # (N_max, D) training inputs (transformed space)
    y: jnp.ndarray         # (N_max,)
    s2: jnp.ndarray        # (N_max,) user-provided noise variance (0 if none)
    mask: jnp.ndarray      # (N_max,) bool
    hyp: jnp.ndarray       # (S_max, Nhyp)
    hyp_mask: jnp.ndarray  # (S_max,) bool
    alpha: jnp.ndarray     # (S_max, N_max)
    L: jnp.ndarray         # (S_max, N_max, N_max)
    Binv: jnp.ndarray      # (S_max, N_max, N_max) explicit inverse (GEMM paths)
    sn2: jnp.ndarray       # (S_max, N_max)
    # Integrated-mean extras (None unless cfg.intmean > 0):
    betabar: jnp.ndarray = None   # (S_max, Nb)
    HBinv: jnp.ndarray = None     # (S_max, Nb, N_max)
    Ainv: jnp.ndarray = None      # (S_max, Nb, Nb)

    @property
    def n_max(self) -> int:
        return self.X.shape[0]

    @property
    def s_max(self) -> int:
        return self.hyp.shape[0]

    @property
    def D(self) -> int:
        return self.X.shape[1]

    def n_train(self) -> jnp.ndarray:
        return jnp.sum(self.mask)

    def n_samples(self) -> jnp.ndarray:
        return jnp.sum(self.hyp_mask)


def build_gp(cfg: GPConfig, X, y, s2, mask, hyp_samples, hyp_mask) -> GP:
    """Build posterior factorizations for all hyperparameter samples.

    ``hyp_samples``: (S_max, Nhyp); masked samples still get factorized (the
    buffers must be dense) but are excluded from all averaged quantities via
    ``hyp_mask``.
    """
    posts = jax.vmap(
        lambda h: core.build_posterior(cfg, h, X, y, s2, mask, robust=True)
    )(hyp_samples)
    return GP(X=X, y=y, s2=s2, mask=mask, hyp=hyp_samples, hyp_mask=hyp_mask,
              alpha=posts.alpha, L=posts.L, Binv=posts.Binv, sn2=posts.sn2,
              betabar=posts.betabar, HBinv=posts.HBinv, Ainv=posts.Ainv)


def gp_from_host(cfg: GPConfig, X: np.ndarray, y: np.ndarray,
                 s2: Optional[np.ndarray], hyp_samples: np.ndarray,
                 n_bucket: int, s_bucket: int) -> GP:
    """Pad host-side data to buckets and build the GP (convenience/testing)."""
    from vbmc_tpu.utils.math import pad_to

    n = X.shape[0]
    s = hyp_samples.shape[0]
    dtype = jnp.zeros(0).dtype
    Xp = jnp.asarray(pad_to(np.asarray(X, dtype=np.float64), n_bucket), dtype=dtype)
    yp = jnp.asarray(pad_to(np.asarray(y, dtype=np.float64).ravel(), n_bucket), dtype=dtype)
    if s2 is None:
        s2p = jnp.zeros(n_bucket, dtype=dtype)
    else:
        s2p = jnp.asarray(pad_to(np.asarray(s2, dtype=np.float64).ravel(), n_bucket), dtype=dtype)
    mask = jnp.asarray(np.arange(n_bucket) < n)
    hs = jnp.asarray(pad_to(np.asarray(hyp_samples, dtype=np.float64), s_bucket), dtype=dtype)
    # Padded hyperparameter slots replicate the first sample so their
    # factorization stays well-conditioned.
    hs = jnp.where(jnp.arange(s_bucket)[:, None] < s, hs, hs[0][None, :])
    hmask = jnp.asarray(np.arange(s_bucket) < s)
    return build_gp(cfg, Xp, yp, s2p, mask, hs, hmask)
