"""Batched GP prediction over hyperparameter samples
(cf. `gplite/gplite_pred.m`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vbmc_tpu.gp.config import GPConfig
from vbmc_tpu.gp import core
from vbmc_tpu.gp.gp import GP
from vbmc_tpu.gp.noise import noise_variance


def gp_predict_full(cfg: GPConfig, gp: GP, Xstar: jnp.ndarray):
    """Latent mean/variance per hyperparameter sample.

    Returns (fmu (S_max, M), fs2 (S_max, M)); masked samples included in the
    buffers — use ``gp.hyp_mask`` to reduce.
    """
    def one(hyp, alpha, L, Binv, _sn2, betabar, HBinv, Ainv):
        post = core.Posterior(alpha=alpha, L=L, Binv=Binv, sn2=_sn2,
                              chol_ok=jnp.asarray(True), betabar=betabar,
                              HBinv=HBinv, Ainv=Ainv)
        return core.predict_one(cfg, hyp, post, gp.X, gp.y, gp.mask, Xstar)

    fmu, fs2 = jax.vmap(one)(gp.hyp, gp.alpha, gp.L, gp.Binv, gp.sn2,
                             gp.betabar, gp.HBinv, gp.Ainv)
    return fmu, fs2


from functools import partial


@partial(jax.jit, static_argnames=("cfg", "add_noise"))
def gp_predict_jit(cfg: GPConfig, gp: GP, Xstar: jnp.ndarray,
                   add_noise: bool = False):
    """Jitted predictive summary; pad Xstar to a bucketed size to bound the
    number of compiled variants."""
    return gp_predict(cfg, gp, Xstar, add_noise=add_noise)


def gp_predict(cfg: GPConfig, gp: GP, Xstar: jnp.ndarray,
               add_noise: bool = False):
    """Moment-matched predictive summary across hyperparameter samples.

    Returns (fbar (M,), vtot (M,), fmu (S,M), fs2 (S,M)) where
    vtot = mean variance + between-sample variance of the mean
    (`gplite_pred.m:153-165`).
    """
    fmu, fs2 = gp_predict_full(cfg, gp, Xstar)
    if add_noise:
        def noise_at(hyp):
            return noise_variance(cfg, hyp[cfg.sl_noise], Xstar, y=None, s2=None)
        fs2 = fs2 + jax.vmap(noise_at)(gp.hyp)

    m = gp.hyp_mask.astype(fmu.dtype)[:, None]          # (S,1)
    ns = jnp.maximum(jnp.sum(m), 1.0)
    fbar = jnp.sum(fmu * m, axis=0) / ns
    vbar = jnp.sum(fs2 * m, axis=0) / ns
    vf = jnp.where(
        ns > 1,
        jnp.sum(((fmu - fbar) ** 2) * m, axis=0) / jnp.maximum(ns - 1.0, 1.0),
        jnp.zeros_like(fbar),
    )
    return fbar, vf + vbar, fmu, fs2
