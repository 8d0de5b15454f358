"""Importance-sampling machinery for information-based acquisitions
(VIQR / IMIQR, cf. `acq/acqviqr_vbmc.m`, `acq/acqimiqr_vbmc.m`,
`private/activeimportancesampling_vbmc.m`) and the kernel-integral
cross-covariance used by EIG (cf. `misc/intkernel.m`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from vbmc_tpu.gp.config import GPConfig
from vbmc_tpu.gp.gp import GP
from vbmc_tpu.gp.kernels import kernel_cross
from vbmc_tpu.gp.predict import gp_predict_full
from vbmc_tpu.vp import VariationalPosterior, vp_rnd, vp_log_pdf_trans


@partial(jax.jit, static_argnames=("cfg",))
def int_kernel(cfg: GPConfig, gp: GP, vp: VariationalPosterior,
               Xs: jnp.ndarray) -> jnp.ndarray:
    """Posterior cross-covariance Cov(f(x_m), \\int q f) per hyp sample:
    E_q[k(x_m, .)] - k(x_m, X) B^{-1} E_q[k(X, .)]  (`intkernel.m:55-80`).

    Returns (S_max, M)."""
    from vbmc_tpu.elbo import _z_matrix
    z, _, _ = _z_matrix(cfg, gp, vp.mu, vp.sigma, vp.lam)   # (S, K, N)
    wk = vp.w * vp.kmask.astype(vp.w.dtype)
    zbar = jnp.einsum("k,skn->sn", wk, z)                   # (S, N)

    # E_q[k(x_m, .)] for candidate points: same closed form with X -> Xs.
    z_cand, _, _ = _z_matrix(cfg, gp._replace(X=Xs,
                                              mask=jnp.ones(Xs.shape[0],
                                                            dtype=bool)),
                             vp.mu, vp.sigma, vp.lam)       # (S, K, M)
    Ez = jnp.einsum("k,skm->sm", wk, z_cand)

    def corr(hyp, Binv, zb):
        ks = kernel_cross(cfg, hyp, gp.X, Xs) * gp.mask.astype(Xs.dtype)[:, None]
        return (Binv @ zb) @ ks                             # (M,)

    correction = jax.vmap(corr)(gp.hyp, gp.Binv, zbar)
    return Ez - correction


# ----------------------------------------------------------------------
# VIQR / IMIQR
# ----------------------------------------------------------------------

class ISState(NamedTuple):
    """Precomputed importance-sample set for VIQR/IMIQR.

    Xa: (Na, D) integration points; ln_weights: (S_max, Na) log importance
    weights (including the f-dependent part); invKzk: (S_max, N_max, Na)
    B^{-1} k(X, Xa) per hyp sample.
    """
    Xa: jnp.ndarray
    ln_weights: jnp.ndarray
    invKzk: jnp.ndarray
    f_s2: jnp.ndarray        # (S_max, Na) predictive variance at Xa


_U_IQR = 0.6744897501960817  # norminv(0.75)


def build_is_state(key, cfg: GPConfig, acq_name: str,
                   vp: VariationalPosterior, gp: GP, options) -> ISState:
    """Assemble the importance-sampling set (simplified TPU-native version of
    `activeimportancesampling_vbmc.m`); thin host wrapper around the fully
    traceable `build_is_state_core`."""
    return build_is_state_core(
        key, cfg, acq_name, vp, gp,
        int(options.active_importance_sampling_vp_samples),
        int(options.active_importance_sampling_box_samples),
        int(options.active_importance_sampling_mcmc_samples))


@partial(jax.jit, static_argnames=("cfg", "acq_name", "n_vp", "n_box",
                                   "n_mcmc"))
def build_is_state_core(key, cfg: GPConfig, acq_name: str,
                        vp: VariationalPosterior, gp: GP, n_vp: int,
                        n_box: int, n_mcmc: int) -> ISState:
    """Importance-sample set as one device program: proposals from the
    smoothed variational posterior (3 widening scales) plus box-uniform
    draws around training inputs; weights from the current GP.

    The MCMC-refresh path of the reference is replaced by a larger
    stratified proposal set — one batched GP predict instead of per-sample
    chains (same estimand, better device utilization).
    """
    D = vp.D
    dtype = gp.X.dtype

    k1, k2, k3 = jax.random.split(key, 3)
    parts = []
    # Smoothed VP proposals at 3 widening scales (ais:116-126).
    scales = (1.0, np.sqrt(2.0), 2.0)
    n_each = max((n_vp + n_mcmc) // len(scales), 1)
    for i, sc in enumerate(scales):
        vp_s = vp._replace(sigma=vp.sigma * sc)
        parts.append(vp_rnd(vp_s, jax.random.fold_in(k1, i), n_each,
                            orig_flag=False, balance_flag=True))
    # Box-uniform around training points (ais:138-146), masked device
    # min/max so the whole build stays inside one jit.
    m = gp.mask.astype(dtype)
    big = jnp.finfo(dtype).max
    Xmin = jnp.min(jnp.where(m[:, None] > 0, gp.X, big), axis=0)
    Xmax = jnp.max(jnp.where(m[:, None] > 0, gp.X, -big), axis=0)
    diam = Xmax - Xmin
    lo = Xmin - 0.5 * diam
    hi = Xmax + 0.5 * diam
    u = jax.random.uniform(k2, (max(n_box, 1), D), dtype=dtype)
    parts.append(lo + u * (hi - lo))
    Xa = jnp.concatenate(parts, axis=0)
    Na = Xa.shape[0]

    # Proposal density (mixture of the pieces above, approximated by the
    # smoothed vp at the middle scale + uniform box component).
    vp_mid = vp._replace(sigma=vp.sigma * np.sqrt(2.0))
    log_prop_vp = vp_log_pdf_trans(vp_mid, Xa)
    log_box = -jnp.sum(jnp.log(hi - lo))
    in_box = jnp.all((Xa >= lo) & (Xa <= hi), axis=1)
    frac_box = max(n_box, 1) / Na
    log_prop = jnp.logaddexp(
        jnp.log(1 - frac_box) + log_prop_vp,
        jnp.where(in_box, jnp.log(frac_box) + log_box, -jnp.inf))

    fmu, fs2 = gp_predict_full(cfg, gp, Xa)            # (S, Na)

    if acq_name == "viqr":
        # Variational IQR: weights ~ q(x) / proposal; the f-dependent part
        # enters through the sinh term at evaluation time.
        logq = vp_log_pdf_trans(vp, Xa)
        lnw = logq[None, :] - log_prop[None, :] + jnp.zeros_like(fmu)
    else:
        # IMIQR: weights ~ exp(fmu + u*sqrt(fs2)) * sinh-term density.
        lnw = (fmu + _U_IQR * jnp.sqrt(jnp.maximum(fs2, 0.0))
               - log_prop[None, :])

    # Normalize per sample (log-mean-exp).
    lnw = lnw - jax.scipy.special.logsumexp(
        lnw, axis=1, keepdims=True)

    # Precompute B^{-1} k(X, Xa) per sample (ais:247-278).
    def pre(hyp, Binv):
        ks = kernel_cross(cfg, hyp, gp.X, Xa) * \
            gp.mask.astype(dtype)[:, None]
        return Binv @ ks                               # (N, Na)

    invKzk = jax.vmap(pre)(gp.hyp, gp.Binv)
    return ISState(Xa=Xa, ln_weights=lnw, invKzk=invKzk, f_s2=fs2)


@partial(jax.jit, static_argnames=("cfg", "name"))
def evaluate_is_acquisition(cfg: GPConfig, name: str, Xs: jnp.ndarray,
                            vp: VariationalPosterior, gp: GP, state,
                            ais: ISState) -> jnp.ndarray:
    """VIQR/IMIQR acquisition for candidate batch Xs (M, D): negative
    expected reduction of the integrated median IQR
    (`acqviqr_vbmc.m:60-121`). Lower is better.
    """
    from vbmc_tpu.acquisitions import _nearest_noise
    from vbmc_tpu.gp.predict import gp_predict

    dtype = Xs.dtype
    fbar, vtot, fmu, fs2 = gp_predict(cfg, gp, Xs)
    sn2 = _nearest_noise(cfg, gp, Xs, state)            # (M,)

    # Posterior covariance between candidates and integration points, per
    # hyp sample: cov_m,a = k(x_m, x_a) - k(x_m, X) B^{-1} k(X, x_a).
    def cov_one(hyp, L, invK):
        kma = kernel_cross(cfg, hyp, Xs, ais.Xa)        # (M, Na)
        kmx = kernel_cross(cfg, hyp, Xs, gp.X) * \
            gp.mask.astype(dtype)[None, :]              # (M, N)
        return kma - kmx @ invK                         # (M, Na)

    cov = jax.vmap(cov_one)(gp.hyp, gp.L, ais.invKzk)   # (S, M, Na)

    # Variance reduction at integration points after observing x_m:
    # s2_new(a) = s2(a) - cov^2 / (fs2(m) + sn2(m)).
    denom = fs2 + sn2[None, :]                          # (S, M)
    red = cov ** 2 / denom[:, :, None]                  # (S, M, Na)
    s2_post = jnp.maximum(ais.f_s2[:, None, :] - red, 1e-12)

    # IQR factor: 2*sinh(u * s) integrated under the IS weights
    # (`acqviqr_vbmc.m:100-108`); minimizing the post-observation integrated
    # IQR maximizes information about the posterior mass.
    ln_sinh_post = jnp.log(2.0) + _log_sinh(_U_IQR * jnp.sqrt(s2_post))
    lnw = ais.ln_weights[:, None, :]                    # (S, 1, Na)
    ln_integral = jax.scipy.special.logsumexp(lnw + ln_sinh_post, axis=2)

    # Average over hyperparameter samples in log space
    # (`acqviqr_vbmc.m:111-114`), masked log-mean-exp.
    m = gp.hyp_mask.astype(dtype)
    ns = jnp.maximum(jnp.sum(m), 1.0)
    neg_big = jnp.finfo(dtype).min
    ln_masked = jnp.where(m[:, None] > 0, ln_integral, neg_big)
    acq = (jax.scipy.special.logsumexp(ln_masked, axis=0)
           - jnp.log(ns))                               # (M,) log-domain

    low = vtot < state.tol_var
    ratio = state.tol_var / jnp.maximum(vtot, jnp.finfo(vtot.dtype).tiny)
    acq = jnp.where(state.regularize & low, acq + ratio - 1.0, acq)

    from vbmc_tpu.transforms import inverse
    X_orig = inverse(vp.trinfo, Xs)
    out = (jnp.any(X_orig < state.lb_eps_orig[None, :], axis=1)
           | jnp.any(X_orig > state.ub_eps_orig[None, :], axis=1))
    return jnp.where(out, jnp.inf, acq)


def _log_sinh(x):
    """Numerically stable log(sinh(x)) for x >= 0."""
    return x + jnp.log1p(-jnp.exp(-2.0 * x)) - jnp.log(2.0)
