"""Pallas TPU kernels for the hottest fused paths.

`fused_prospective_acq`: the full prospective-uncertainty-search acquisition
sweep (`acqf_vbmc` + the GP predictive summary it needs) as ONE kernel.
For every candidate tile it computes, entirely in VMEM:

    per hyp sample s:  ks = k_SE(X, C)            (MXU matmul)
                       fmu_s = m(C) + ks^T alpha_s
                       fs2_s = sf2 - sum(ks * (Binv_s ks))   (MXU matmul)
    across samples:    fbar, total variance (mean var + between-sample var)
    mixture density:   log q(C) over K components
    acquisition:       -vtot * exp(fbar - ymax) * q(C)  (+ regularization)

The XLA version materializes (S, N, M) and (S, M) intermediates in HBM; the
fused kernel streams one (N, TILE_M) block per sample through VMEM. The
grid is (m_tiles, S) with S innermost so VMEM accumulators carry across the
sample axis (TPU grids execute sequentially).

Gradients are not needed (acquisition sweeps are argmin-only), so no VJP is
defined. The XLA path (`acquisitions.evaluate_acquisition`) remains the
reference implementation and the fallback for other acquisitions.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vbmc_tpu.gp.config import GPConfig, MEAN_NEGQUAD, MEAN_CONST, MEAN_ZERO

_TILE_M = 256
_LOG2PI = 1.8378770664093453


def _sample_predict(cfg: GPConfig, s, cand_ref, X_ref, nmask_ref, hyp_ref,
                    alpha_ref, binv_ref):
    """Per-sample GP predictive (fmu, fs2, ks) for one candidate tile,
    entirely in VMEM. hyp/alpha ride as full (S, 1, width) blocks; the
    sample row is selected by a dynamic index on the LEADING dim (legal on
    TPU — Mosaic's tiling constraints only bind the last two dims, so
    (1, nhyp)-shaped per-row blocks cannot be used as block specs)."""
    D = cfg.D
    dtype = cand_ref.dtype
    hyp = hyp_ref[s, 0, :]
    inv_ell = jnp.exp(-hyp[:D])                       # (D,)
    sf2 = jnp.exp(2.0 * hyp[D])

    C = cand_ref[:, :]                                # (Mt, D)
    X = X_ref[:, :]                                   # (N, D)
    nmask = nmask_ref[:, 0]                           # (N,)

    Xe = X * inv_ell[None, :]
    Ce = C * inv_ell[None, :]
    x2 = jnp.sum(Xe * Xe, axis=1)                     # (N,)
    c2 = jnp.sum(Ce * Ce, axis=1)                     # (Mt,)
    cross = jax.lax.dot_general(
        Xe, Ce, (((1,), (1,)), ((), ())),
        preferred_element_type=dtype)                 # (N, Mt)
    d2 = jnp.maximum(x2[:, None] + c2[None, :] - 2.0 * cross, 0.0)
    ks = sf2 * jnp.exp(-0.5 * d2) * nmask[:, None]    # (N, Mt)

    # Mean function at candidates.
    i_m = cfg.ncov + cfg.nnoise
    if cfg.meanfun == MEAN_NEGQUAD:
        m0 = hyp[i_m]
        xm = hyp[i_m + 1:i_m + 1 + D]
        inv_om = jnp.exp(-hyp[i_m + 1 + D:i_m + 1 + 2 * D])
        zz = (C - xm[None, :]) * inv_om[None, :]
        mean_c = m0 - 0.5 * jnp.sum(zz * zz, axis=1)
    elif cfg.meanfun == MEAN_CONST:
        mean_c = jnp.full((C.shape[0],), hyp[i_m], dtype=dtype)
    else:
        mean_c = jnp.zeros((C.shape[0],), dtype=dtype)

    alpha = alpha_ref[s, 0, :]                        # (N,)
    fmu = mean_c + jax.lax.dot_general(
        ks, alpha[:, None], (((0,), (0,)), ((), ())),
        preferred_element_type=dtype)[:, 0]           # (Mt,)

    BK = jax.lax.dot_general(
        binv_ref[0, :, :], ks, (((1,), (0,)), ((), ())),
        preferred_element_type=dtype)                 # (N, Mt)
    qf = jnp.sum(ks * BK, axis=0)                     # (Mt,)
    fs2 = jnp.maximum(sf2 - qf, 0.0)
    return fmu, fs2, ks


def _acq_kernel(cfg: GPConfig,
                # scalar-prefetch
                smask_ref,
                # tensor inputs
                cand_ref, X_ref, nmask_ref, hyp_ref, alpha_ref, binv_ref,
                mu_ref, sigma_ref, lam_ref, logw_ref, consts_ref,
                # output
                acq_ref,
                # scratch
                acc_ref):
    D = cfg.D
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    dtype = cand_ref.dtype

    @pl.when(s == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    C = cand_ref[:, :]                                # (Mt, D)
    fmu, fs2, _ = _sample_predict(cfg, s, cand_ref, X_ref, nmask_ref,
                                  hyp_ref, alpha_ref, binv_ref)

    w_s = smask_ref[s].astype(dtype)
    acc_ref[0, :] += w_s * fmu
    acc_ref[1, :] += w_s * fmu * fmu
    acc_ref[2, :] += w_s * fs2

    @pl.when(s == n_s - 1)
    def _finalize():
        ns = consts_ref[0, 2]
        fbar = acc_ref[0, :] / ns
        vbar = acc_ref[2, :] / ns
        vf = jnp.maximum(
            (acc_ref[1, :] - acc_ref[0, :] * acc_ref[0, :] / ns)
            / jnp.maximum(ns - 1.0, 1.0), 0.0)
        vtot = vbar + vf

        # Mixture log density over K_max components (K static, unrolled).
        lam = lam_ref[0, :]                            # (D,)
        K_max = mu_ref.shape[0]
        logq = jnp.full((C.shape[0],), -jnp.inf, dtype=dtype)
        for k in range(K_max):
            sk = sigma_ref[k, 0]
            zk = (C - mu_ref[k, :][None, :]) / (sk * lam)[None, :]
            comp = (logw_ref[k, 0] - 0.5 * D * _LOG2PI
                    - D * jnp.log(sk) - jnp.sum(jnp.log(lam))
                    - 0.5 * jnp.sum(zk * zk, axis=1))
            mx = jnp.maximum(logq, comp)
            both_inf = mx == -jnp.inf
            logq = jnp.where(
                both_inf, -jnp.inf,
                mx + jnp.log(jnp.exp(logq - mx) + jnp.exp(comp - mx)))

        ymax = consts_ref[0, 0]
        tol_var = consts_ref[0, 1]
        acq = -vtot * jnp.exp(fbar - ymax + logq)
        low = vtot < tol_var
        ratio = tol_var / jnp.maximum(vtot, jnp.finfo(dtype).tiny)
        acq = jnp.where(low, acq * jnp.exp(-(ratio - 1.0)), acq)
        acq_ref[0, 0, :] = acq


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_prospective_acq(cfg: GPConfig, Xs, gp, vp, ymax, tol_var,
                          interpret: bool = False):
    """Fused prospective acquisition for candidates Xs (M, D).

    Returns raw acquisition values (M,) — hard-bound rejection (original-
    space check) is applied by the caller.
    """
    assert cfg.covfun == 1, "Pallas kernels hard-code the SE-ard kernel"
    M, D = Xs.shape
    N = gp.n_max
    S = gp.s_max
    dtype = Xs.dtype
    Mt = min(_TILE_M, M)
    assert M % Mt == 0, (M, Mt)

    smask = gp.hyp_mask.astype(jnp.int32)
    n_active = jnp.sum(gp.hyp_mask)
    # ns enters as a static mean divisor: padded samples replicate a real
    # sample, so use the true active count computed on the host side of jit:
    # pass it via consts instead of a Python int.
    logw = jnp.where(vp.kmask, jnp.log(jnp.maximum(
        vp.w, jnp.finfo(dtype).tiny)), -jnp.inf)

    consts = jnp.stack([jnp.asarray(ymax, dtype=dtype),
                        jnp.asarray(tol_var, dtype=dtype),
                        n_active.astype(dtype)])[None, :]

    grid = (M // Mt, S)
    out = pl.pallas_call(
        partial(_acq_kernel, cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Mt, D), lambda m, s, *_: (m, 0),
                             memory_space=pltpu.VMEM),      # candidates
                pl.BlockSpec((N, D), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # X
                pl.BlockSpec((N, 1), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # n mask
                # hyp/alpha ride as full (S, 1, width) blocks: Mosaic allows
                # dynamic per-sample indexing only on leading dims, so the
                # row selection happens inside the kernel.
                pl.BlockSpec((S, 1, cfg.nhyp), lambda m, s, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),      # hyp (all rows)
                pl.BlockSpec((S, 1, N), lambda m, s, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),      # alpha (all rows)
                pl.BlockSpec((1, N, N), lambda m, s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),      # Binv slice
                pl.BlockSpec((vp.k_max, D), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # mu
                pl.BlockSpec((vp.k_max, 1), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # sigma
                pl.BlockSpec((1, D), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # lambda
                pl.BlockSpec((vp.k_max, 1), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # log w
                pl.BlockSpec((1, 3), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # consts
            ],
            out_specs=pl.BlockSpec((1, 1, Mt), lambda m, s, *_: (m, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((3, Mt), dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((M // Mt, 1, Mt), dtype),
        interpret=interpret,
    )(smask, Xs, gp.X, gp.mask.astype(dtype)[:, None], gp.hyp[:, None, :],
      gp.alpha[:, None, :], gp.Binv, vp.mu, vp.sigma[:, None],
      vp.lam[None, :], logw[:, None], consts)
    return out.reshape(M)


# ----------------------------------------------------------------------
# Fused VIQR/IMIQR sweep (`acqviqr_vbmc.m:60-121`): the XLA path
# materializes (S, M, Na) HBM temporaries (posterior cross-covariance,
# variance reduction, post-observation IQR) — ~150 MB each at bench
# shapes. This kernel streams one (Mt, Na) block per (tile, sample)
# through VMEM with a running log-sum-exp across the sample axis.
# ----------------------------------------------------------------------

def _viqr_kernel(cfg: GPConfig,
                 # scalar-prefetch
                 smask_ref,
                 # tensor inputs
                 cand_ref, X_ref, nmask_ref, hyp_ref, alpha_ref, binv_ref,
                 xa_ref, lnw_ref, fs2a_ref, invk_ref, sn2c_ref, consts_ref,
                 # output
                 acq_ref,
                 # scratch
                 acc_ref):
    D = cfg.D
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    dtype = cand_ref.dtype
    neg_big = jnp.asarray(-3.0e38, dtype=dtype)

    @pl.when(s == 0)
    def _():
        acc_ref[0, :] = jnp.zeros_like(acc_ref[0, :])   # sum fmu
        acc_ref[1, :] = jnp.zeros_like(acc_ref[1, :])   # sum fmu^2
        acc_ref[2, :] = jnp.zeros_like(acc_ref[2, :])   # sum fs2
        acc_ref[3, :] = jnp.full_like(acc_ref[3, :], neg_big)  # running max
        acc_ref[4, :] = jnp.zeros_like(acc_ref[4, :])   # running sum

    C = cand_ref[:, :]                                  # (Mt, D)
    fmu, fs2, ks = _sample_predict(cfg, s, cand_ref, X_ref, nmask_ref,
                                   hyp_ref, alpha_ref, binv_ref)

    hyp = hyp_ref[s, 0, :]
    inv_ell = jnp.exp(-hyp[:D])
    sf2 = jnp.exp(2.0 * hyp[D])

    # Cross kernel k(C, Xa): (Mt, Na).
    Xa = xa_ref[:, :]                                   # (Na, D)
    Ce = C * inv_ell[None, :]
    Ae = Xa * inv_ell[None, :]
    c2 = jnp.sum(Ce * Ce, axis=1)
    a2 = jnp.sum(Ae * Ae, axis=1)
    cross = jax.lax.dot_general(
        Ce, Ae, (((1,), (1,)), ((), ())),
        preferred_element_type=dtype)                   # (Mt, Na)
    kma = sf2 * jnp.exp(-0.5 * jnp.maximum(
        c2[:, None] + a2[None, :] - 2.0 * cross, 0.0))

    # Posterior cross-covariance: kma - k(C, X) B^{-1} k(X, Xa); the
    # B^{-1} k(X, Xa) factor is the precomputed IS state (ais.invKzk).
    corr = jax.lax.dot_general(
        ks, invk_ref[0, :, :], (((0,), (0,)), ((), ())),
        preferred_element_type=dtype)                   # (Mt, Na)
    cov = kma - corr

    # Variance reduction at integration points after observing C.
    sn2c = sn2c_ref[0, :]                               # (Mt,)
    denom = jnp.maximum(fs2 + sn2c, 1e-30)
    red = cov * cov / denom[:, None]
    fs2a = fs2a_ref[s, 0, :]                            # (Na,)
    s2_post = jnp.maximum(fs2a[None, :] - red, 1e-12)

    # 2*sinh(u * s) under the IS weights, log domain.
    u = consts_ref[0, 3]
    x = u * jnp.sqrt(s2_post)
    ln_sinh = x + jnp.log1p(-jnp.exp(-2.0 * x))         # log(2 sinh x)
    lnw = lnw_ref[s, 0, :]                              # (Na,), -inf padded
    terms = jnp.maximum(lnw[None, :] + ln_sinh, neg_big)
    tmax = jnp.max(terms, axis=1)                       # (Mt,)
    val = tmax + jnp.log(jnp.sum(jnp.exp(terms - tmax[:, None]), axis=1))

    # Accumulate: moments for vtot; streaming log-sum-exp across samples.
    w_s = smask_ref[s].astype(dtype)
    acc_ref[0, :] += w_s * fmu
    acc_ref[1, :] += w_s * fmu * fmu
    acc_ref[2, :] += w_s * fs2
    x_s = jnp.where(w_s > 0, val, neg_big)
    m_old = acc_ref[3, :]
    m_new = jnp.maximum(m_old, x_s)
    acc_ref[4, :] = (acc_ref[4, :] * jnp.exp(m_old - m_new)
                     + w_s * jnp.exp(x_s - m_new))
    acc_ref[3, :] = m_new

    @pl.when(s == n_s - 1)
    def _finalize():
        ns = consts_ref[0, 2]
        fbar = acc_ref[0, :] / ns
        vbar = acc_ref[2, :] / ns
        vf = jnp.maximum(
            (acc_ref[1, :] - acc_ref[0, :] * acc_ref[0, :] / ns)
            / jnp.maximum(ns - 1.0, 1.0), 0.0)
        vtot = vbar + vf
        # log-mean-exp across samples (`acqviqr_vbmc.m:111-114`).
        acq = acc_ref[3, :] + jnp.log(
            jnp.maximum(acc_ref[4, :], 1e-30)) - jnp.log(ns)
        # Variance regularization, log domain (`acqwrapper_vbmc.m:35-45`).
        tol_var = consts_ref[0, 1]
        regularize = consts_ref[0, 0]
        low = (vtot < tol_var) & (regularize > 0)
        ratio = tol_var / jnp.maximum(vtot, jnp.finfo(dtype).tiny)
        acq_ref[0, 0, :] = jnp.where(low, acq + ratio - 1.0, acq)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_viqr_acq(cfg: GPConfig, Xs, gp, Xa, lnw, fs2a, invk, sn2c,
                   tol_var, regularize, interpret: bool = False):
    """Fused VIQR/IMIQR sweep for candidates Xs (M, D) against the
    IS state (Xa padded to a 128-multiple, lnw = -inf on padded slots).

    Returns raw log-domain acquisition values (M,); hard-bound rejection
    is applied by the caller."""
    M, D = Xs.shape
    N = gp.n_max
    S = gp.s_max
    Na = Xa.shape[0]
    dtype = Xs.dtype
    # Wider tiles than the prospective kernel: the per-step cost here is
    # dominated by re-fetching the (N, Na) invKzk block, so fewer, larger
    # steps win.
    Mt = min(1024, M)
    assert M % Mt == 0 and Na % 128 == 0, (M, Mt, Na)

    smask = gp.hyp_mask.astype(jnp.int32)
    n_active = jnp.sum(gp.hyp_mask)
    consts = jnp.stack([
        jnp.asarray(regularize, dtype=dtype),
        jnp.asarray(tol_var, dtype=dtype),
        n_active.astype(dtype),
        jnp.asarray(0.6744897501960817, dtype=dtype),   # norminv(0.75)
    ])[None, :]

    grid = (M // Mt, S)
    out = pl.pallas_call(
        partial(_viqr_kernel, cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Mt, D), lambda m, s, *_: (m, 0),
                             memory_space=pltpu.VMEM),      # candidates
                pl.BlockSpec((N, D), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # X
                pl.BlockSpec((N, 1), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # n mask
                pl.BlockSpec((S, 1, cfg.nhyp), lambda m, s, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),      # hyp (all rows)
                pl.BlockSpec((S, 1, N), lambda m, s, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),      # alpha
                pl.BlockSpec((1, N, N), lambda m, s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),      # Binv slice
                pl.BlockSpec((Na, D), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # Xa
                pl.BlockSpec((S, 1, Na), lambda m, s, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),      # ln weights
                pl.BlockSpec((S, 1, Na), lambda m, s, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),      # f_s2 at Xa
                pl.BlockSpec((1, N, Na), lambda m, s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),      # invKzk slice
                pl.BlockSpec((1, Mt), lambda m, s, *_: (0, m),
                             memory_space=pltpu.VMEM),      # sn2 at C
                pl.BlockSpec((1, 4), lambda m, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),      # consts
            ],
            out_specs=pl.BlockSpec((1, 1, Mt), lambda m, s, *_: (m, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((5, Mt), dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((M // Mt, 1, Mt), dtype),
        interpret=interpret,
    )(smask, Xs, gp.X, gp.mask.astype(dtype)[:, None], gp.hyp[:, None, :],
      gp.alpha[:, None, :], gp.Binv, Xa, lnw[:, None, :],
      fs2a[:, None, :], invk, sn2c[None, :], consts)
    return out.reshape(M)
