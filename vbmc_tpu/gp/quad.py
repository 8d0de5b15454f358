"""Bayesian quadrature of the GP against Gaussian smoothing kernels
(cf. `gplite/gplite_quad.m`): closed-form E[f] and Var[f] under
N(x*, diag(delta^2)) for the SE-ard kernel with zero/const/negquad/SE means.
Used for acquisition smoothing when options.bandwidth > 0."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from vbmc_tpu.gp.config import (GPConfig, MEAN_ZERO, MEAN_CONST,
                                MEAN_NEGQUAD, MEAN_SE, MEAN_NEGQUADSE,
                                MEAN_NEGQUADONLY, MEAN_NEGQUADLINONLY,
                                MEAN_NEGQUADFIXISO, MEAN_NEGQUADFIX,
                                MEAN_NEGQUADSEFIX, MEAN_NEGQUADFIXONLY,
                                MEAN_NEGQUADMIX)
from vbmc_tpu.gp.gp import GP


@partial(jax.jit, static_argnames=("cfg", "compute_var"))
def gp_quad(cfg: GPConfig, gp: GP, Xstar: jnp.ndarray, delta: jnp.ndarray,
            compute_var: bool = True):
    """Per-hyp-sample quadrature mean/variance at smoothing kernels centered
    on rows of Xstar with per-dim SD delta (D,).

    Returns (fmu (S, M), fs2 (S, M) or None).
    """
    from vbmc_tpu.gp.config import COV_SEARD
    if cfg.covfun != COV_SEARD:
        raise ValueError(
            "gp_quad closed forms require the SE-ard kernel (covfun=1), "
            "as in the reference (`gplite_quad.m:37-40`)")
    D = cfg.D
    M = Xstar.shape[0]
    dtype = Xstar.dtype
    log_ell = gp.hyp[:, :D]                           # (S, D)
    ell2 = jnp.exp(2.0 * log_ell)
    ln_sf2 = 2.0 * gp.hyp[:, D]
    sum_lnell = jnp.sum(log_ell, axis=-1)

    d2 = delta ** 2                                    # (D,)
    tau2 = d2[None, :] + ell2                          # (S, D)
    lnnf = ln_sf2 + sum_lnell - 0.5 * jnp.sum(jnp.log(tau2), -1)  # (S,)

    inv_tau2 = 1.0 / tau2                              # (S, D)
    X = gp.X                                           # (N, D)
    x2_star = jnp.einsum("sd,md->sm", inv_tau2, Xstar * Xstar)
    x2_train = jnp.einsum("sd,nd->sn", inv_tau2, X * X)
    cross = jnp.einsum("md,sd,nd->smn", Xstar, inv_tau2, X)
    quad = x2_star[:, :, None] - 2.0 * cross + x2_train[:, None, :]
    z = jnp.exp(lnnf[:, None, None] - 0.5 * quad)      # (S, M, N)
    z = z * gp.mask.astype(dtype)[None, None, :]

    fmu = jnp.einsum("smn,sn->sm", z, gp.alpha)

    hyp_mean = gp.hyp[:, cfg.sl_mean]
    if cfg.meanfun == MEAN_CONST:
        fmu = fmu + hyp_mean[:, 0][:, None]
    elif cfg.meanfun == MEAN_NEGQUAD:
        xm = hyp_mean[:, 1:D + 1]
        omega2 = jnp.exp(2.0 * hyp_mean[:, D + 1:2 * D + 1])
        q = ((Xstar[None, :, :] - xm[:, None, :]) ** 2
             + d2[None, None, :]) / omega2[:, None, :]
        fmu = fmu + hyp_mean[:, 0][:, None] - 0.5 * jnp.sum(q, -1)
    elif cfg.meanfun == MEAN_SE:
        xm = hyp_mean[:, 1:D + 1]
        omega2 = jnp.exp(2.0 * hyp_mean[:, D + 1:2 * D + 1])
        h = jnp.exp(hyp_mean[:, 2 * D + 1])
        t2 = d2[None, None, :] + omega2[:, None, :]
        s2 = ((Xstar[None, :, :] - xm[:, None, :]) ** 2) / t2
        lognf = 0.5 * jnp.sum(jnp.log(omega2[:, None, :]) - jnp.log(t2), -1)
        fmu = fmu + hyp_mean[:, 0][:, None] + \
            h[:, None] * jnp.exp(lognf - 0.5 * jnp.sum(s2, -1))
    elif cfg.meanfun == MEAN_NEGQUADSE:
        xm = hyp_mean[:, 1:D + 1]
        omega2 = jnp.exp(2.0 * hyp_mean[:, D + 1:2 * D + 1])
        q = ((Xstar[None, :, :] - xm[:, None, :]) ** 2
             + d2[None, None, :]) / omega2[:, None, :]
        xm_se = hyp_mean[:, 2 * D + 1:3 * D + 1]
        omega2_se = jnp.exp(2.0 * hyp_mean[:, 3 * D + 1:4 * D + 1])
        h_se = hyp_mean[:, 4 * D + 1]
        t2 = d2[None, None, :] + omega2_se[:, None, :]
        s2m = ((Xstar[None, :, :] - xm_se[:, None, :]) ** 2) / t2
        lognf = 0.5 * jnp.sum(jnp.log(omega2_se[:, None, :]) - jnp.log(t2),
                              -1)
        fmu = (fmu + hyp_mean[:, 0][:, None] - 0.5 * jnp.sum(q, -1)
               + h_se[:, None] * jnp.exp(lognf - 0.5 * jnp.sum(s2m, -1)))
    elif cfg.meanfun == MEAN_NEGQUADONLY:
        omega2 = jnp.exp(2.0 * hyp_mean[:, :D])
        q = (Xstar[None, :, :] ** 2 + d2[None, None, :]) / omega2[:, None, :]
        fmu = fmu - 0.5 * jnp.sum(q, -1)
    elif cfg.meanfun == MEAN_NEGQUADLINONLY:
        xm = hyp_mean[:, :D]
        omega2 = jnp.exp(2.0 * hyp_mean[:, D:2 * D])
        q = ((Xstar[None, :, :] - xm[:, None, :]) ** 2
             + d2[None, None, :]) / omega2[:, None, :]
        fmu = fmu - 0.5 * jnp.sum(q, -1)
    elif cfg.meanfun in (MEAN_NEGQUADFIXISO, MEAN_NEGQUADFIX,
                         MEAN_NEGQUADSEFIX, MEAN_NEGQUADFIXONLY):
        # Fixed-center families: center is the static cfg.fix_center
        # (`gplite_meanfun.m:485-544`; quadrature as `gplogjoint.m` with the
        # component covariance replaced by the smoothing delta^2).
        from vbmc_tpu.gp.means import _center
        S = hyp_mean.shape[0]
        xm = _center(cfg, dtype)                           # (D,)
        if cfg.meanfun == MEAN_NEGQUADFIXISO:
            omega2 = jnp.broadcast_to(
                jnp.exp(2.0 * hyp_mean[:, 1])[:, None], (S, D))
        elif cfg.meanfun == MEAN_NEGQUADFIXONLY:
            omega2 = jnp.exp(2.0 * hyp_mean[:, :D])
        else:
            omega2 = jnp.exp(2.0 * hyp_mean[:, 1:D + 1])
        q = ((Xstar[None, :, :] - xm[None, None, :]) ** 2
             + d2[None, None, :]) / omega2[:, None, :]
        fmu = fmu - 0.5 * jnp.sum(q, -1)
        if cfg.meanfun != MEAN_NEGQUADFIXONLY:
            fmu = fmu + hyp_mean[:, 0][:, None]
        if cfg.meanfun == MEAN_NEGQUADSEFIX:
            alpha2 = jnp.exp(2.0 * hyp_mean[:, D + 1])
            h_se = jnp.exp(hyp_mean[:, D + 2])
            o2_se = alpha2[:, None] * omega2               # (S, D)
            t2 = d2[None, None, :] + o2_se[:, None, :]
            s2m = ((Xstar[None, :, :] - xm[None, None, :]) ** 2) / t2
            lognf_se = 0.5 * jnp.sum(jnp.log(o2_se[:, None, :])
                                     - jnp.log(t2), -1)
            fmu = (fmu - h_se[:, None]
                   + h_se[:, None] * jnp.exp(lognf_se
                                             - 0.5 * jnp.sum(s2m, -1)))
    elif cfg.meanfun == MEAN_NEGQUADMIX:
        # Quadratic-mixture mean under the smoothing kernel: Gaussian-tilted
        # moments as `gplogjoint.m:181-195` with s2lam2 -> delta^2.
        xm = hyp_mean[:, 1:D + 1]
        omega2 = jnp.exp(2.0 * hyp_mean[:, D + 1:2 * D + 1])
        hm = hyp_mean[:, 2 * D + 1]
        rho2 = jnp.exp(2.0 * hyp_mean[:, 2 * D + 2])
        beta2 = jnp.exp(2.0 * hyp_mean[:, 2 * D + 3])
        dx2 = (Xstar[None, :, :] - xm[:, None, :]) ** 2    # (S, M, D)
        q = (dx2 + d2[None, None, :]) / omega2[:, None, :]
        nu1 = -0.5 * jnp.sum(q, -1) / beta2[:, None]
        t2 = d2[None, None, :] + (rho2[:, None, None]
                                  * omega2[:, None, :])    # (S, 1|M, D)
        atil = jnp.exp(0.5 * jnp.sum(
            jnp.log(rho2[:, None, None] * omega2[:, None, :])
            - jnp.log(t2), -1) - 0.5 * jnp.sum(dx2 / t2, -1))
        mutil_minus_xm = (Xstar[None, :, :] - xm[:, None, :]) \
            * (rho2[:, None, None] * omega2[:, None, :]) / t2
        vartil = d2[None, None, :] * rho2[:, None, None] \
            * omega2[:, None, :] / t2
        qtil = jnp.sum((vartil + mutil_minus_xm ** 2)
                       / omega2[:, None, :], -1)
        fmu = (fmu + (hyp_mean[:, 0] + hm)[:, None] + nu1
               - hm[:, None] * atil
               - 0.5 * (1.0 - 1.0 / beta2)[:, None] * atil * qtil)
    elif cfg.meanfun != MEAN_ZERO:
        raise ValueError("gp_quad supports zero/const/negquad/se/negquadse/"
                         "negquad(fix/fixiso/sefix/fixonly)/negquadonly/"
                         "negquadlinonly/negquadmix means")

    r_int = None
    if cfg.nint > 0:
        # Integrated-mean correction: E_{N(x*,delta^2)}[h] is closed-form
        # for the polynomial basis (diagonal smoothing covariance).
        from vbmc_tpu.gp.config import (INTMEAN_LINEAR, INTMEAN_QUAD,
                                        INTMEAN_FULLQUAD)
        import numpy as np
        cols = [jnp.ones((M, 1), dtype=dtype)]
        if cfg.intmean >= INTMEAN_LINEAR:
            cols.append(Xstar)
        if cfg.intmean >= INTMEAN_QUAD:
            cols.append(Xstar * Xstar + d2[None, :])
        if cfg.intmean >= INTMEAN_FULLQUAD:
            iu, ju = np.triu_indices(D, k=1)
            cols.append(Xstar[:, iu] * Xstar[:, ju])
        hbar = jnp.concatenate(cols, axis=1)               # (M, Nb)
        r_int = hbar[None, :, :] - jnp.einsum("sbn,smn->smb", gp.HBinv, z)
        fmu = fmu + jnp.einsum("smb,sb->sm", r_int, gp.betabar)

    if not compute_var:
        return fmu, None

    # Var: nf_kk - z B^{-1} z with tau_kk^2 = 2*delta^2 + ell^2.
    tau2_kk = 2.0 * d2[None, :] + ell2
    lnnf_kk = ln_sf2 + sum_lnell - 0.5 * jnp.sum(jnp.log(tau2_kk), -1)

    t_zb = jnp.einsum("smn,snk->smk", z, gp.Binv)
    data = jnp.einsum("smn,smn->sm", t_zb, z)
    fs2 = jnp.exp(lnnf_kk)[:, None] - data
    if r_int is not None:
        fs2 = fs2 + jnp.einsum("smb,sbc,smc->sm", r_int, gp.Ainv, r_int)
    fs2 = jnp.maximum(fs2, jnp.finfo(dtype).eps)
    return fmu, fs2
