"""GP mean functions and their hyperparameter info.

Supports the subset the Bayesian-quadrature ELBO admits (cf.
`misc/gplogjoint.m:47-50`): zero, constant, negative quadratic (the VBMC
default), and squared-exponential. Formulas follow
`gplite/gplite_meanfun.m:399-455`; hyperparameter bounds/starting points
follow the `info` branch (`gplite_meanfun.m:136-290`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vbmc_tpu.gp.config import (
    GPConfig, MEAN_ZERO, MEAN_CONST, MEAN_NEGQUAD, MEAN_SE,
    MEAN_NEGQUADSE, MEAN_NEGQUADONLY, MEAN_NEGQUADLINONLY,
    MEAN_NEGQUADFIXISO, MEAN_NEGQUADFIX, MEAN_NEGQUADSEFIX,
    MEAN_NEGQUADFIXONLY, MEAN_NEGQUADMIX, FIXED_CENTER_MEANFUNS,
    INTMEAN_NONE, INTMEAN_CONST, INTMEAN_LINEAR, INTMEAN_QUAD,
    INTMEAN_FULLQUAD,
)


def fix_center_from_data(X, y) -> tuple:
    """The reference default for the fixed-center families: the incumbent
    (training input with the highest observed value), `gplite_meanfun.m:
    334-341`. Returns a hashable tuple for `GPConfig.fix_center`."""
    X = np.asarray(X, float)
    y = np.asarray(y, float).ravel()
    return tuple(float(v) for v in X[int(np.argmax(y))])


def _center(cfg: GPConfig, dtype):
    if len(cfg.fix_center) != cfg.D:
        raise ValueError(
            f"meanfun {cfg.meanfun} requires GPConfig.fix_center of length "
            f"D={cfg.D} (got {len(cfg.fix_center)}); compute it with "
            "gp.means.fix_center_from_data(X, y)")
    return jnp.asarray(cfg.fix_center, dtype=dtype)


def int_mean_basis(cfg: GPConfig, X: jnp.ndarray) -> jnp.ndarray:
    """Basis functions h(x) of the integrated Bayesian-linear mean,
    evaluated at rows of X. Returns (N, Nb) (cf. `gplite_intmeanfun.m`,
    which builds the transposed (Nb, N) layout).

    Basis: [1 | x_1..x_D | x_1^2..x_D^2 | x_i * x_j (i<j)] truncated per
    the `cfg.intmean` level.
    """
    if cfg.intmean == INTMEAN_NONE:
        return jnp.zeros((X.shape[0], 0), dtype=X.dtype)
    cols = [jnp.ones((X.shape[0], 1), dtype=X.dtype)]
    if cfg.intmean >= INTMEAN_LINEAR:
        cols.append(X)
    if cfg.intmean >= INTMEAN_QUAD:
        cols.append(X * X)
    if cfg.intmean >= INTMEAN_FULLQUAD:
        D = cfg.D
        iu, ju = np.triu_indices(D, k=1)
        cols.append(X[:, iu] * X[:, ju])
    return jnp.concatenate(cols, axis=1)


def mean_function(cfg: GPConfig, hyp_mean: jnp.ndarray, X: jnp.ndarray):
    """Evaluate the mean function at rows of X. hyp_mean: (Nmean,)."""
    D = cfg.D
    if cfg.meanfun == MEAN_ZERO:
        return jnp.zeros(X.shape[0], dtype=X.dtype)
    if cfg.meanfun == MEAN_CONST:
        return jnp.full(X.shape[0], hyp_mean[0], dtype=X.dtype)
    if cfg.meanfun == MEAN_NEGQUAD:
        m0 = hyp_mean[0]
        xm = hyp_mean[1:D + 1]
        omega = jnp.exp(hyp_mean[D + 1:2 * D + 1])
        z2 = ((X - xm) / omega) ** 2
        return m0 - 0.5 * jnp.sum(z2, axis=-1)
    if cfg.meanfun == MEAN_SE:
        m0 = hyp_mean[0]
        xm = hyp_mean[1:D + 1]
        omega = jnp.exp(hyp_mean[D + 1:2 * D + 1])
        h = jnp.exp(hyp_mean[2 * D + 1])
        z2 = ((X - xm) / omega) ** 2
        return m0 + h * jnp.exp(-0.5 * jnp.sum(z2, axis=-1))
    if cfg.meanfun == MEAN_NEGQUADSE:
        # Negative quadratic plus an SE bump with its own location/scale;
        # the bump height h_se is a RAW hyperparameter (can be negative),
        # unlike MEAN_SE (`gplite_meanfun.m:456-480`).
        m0 = hyp_mean[0]
        xm = hyp_mean[1:D + 1]
        omega = jnp.exp(hyp_mean[D + 1:2 * D + 1])
        xm_se = hyp_mean[2 * D + 1:3 * D + 1]
        omega_se = jnp.exp(hyp_mean[3 * D + 1:4 * D + 1])
        h_se = hyp_mean[4 * D + 1]
        z2 = ((X - xm) / omega) ** 2
        z2_se = ((X - xm_se) / omega_se) ** 2
        return (m0 - 0.5 * jnp.sum(z2, axis=-1)
                + h_se * jnp.exp(-0.5 * jnp.sum(z2_se, axis=-1)))
    if cfg.meanfun == MEAN_NEGQUADONLY:
        omega = jnp.exp(hyp_mean[:D])
        return -0.5 * jnp.sum((X / omega) ** 2, axis=-1)
    if cfg.meanfun == MEAN_NEGQUADLINONLY:
        xm = hyp_mean[:D]
        omega = jnp.exp(hyp_mean[D:2 * D])
        return -0.5 * jnp.sum(((X - xm) / omega) ** 2, axis=-1)
    if cfg.meanfun == MEAN_NEGQUADFIXISO:
        # Fixed center, single isotropic scale (`gplite_meanfun.m:485-495`).
        xm = _center(cfg, X.dtype)
        m0 = hyp_mean[0]
        omega = jnp.exp(hyp_mean[1])
        z2 = ((X - xm) / omega) ** 2
        return m0 - 0.5 * jnp.sum(z2, axis=-1)
    if cfg.meanfun == MEAN_NEGQUADFIX:
        # Fixed center, per-dim scales (`gplite_meanfun.m:496-506`).
        xm = _center(cfg, X.dtype)
        m0 = hyp_mean[0]
        omega = jnp.exp(hyp_mean[1:D + 1])
        z2 = ((X - xm) / omega) ** 2
        return m0 - 0.5 * jnp.sum(z2, axis=-1)
    if cfg.meanfun == MEAN_NEGQUADSEFIX:
        # Fixed-center quadratic plus an SE bump constrained to the same
        # center, omega_se = alpha*omega, h_se > 0 (`gplite_meanfun.m:
        # 507-526`): m = (m0 - h_se) - 1/2 sum z2 + h_se exp(-sum z2/
        # (2 alpha^2)).
        xm = _center(cfg, X.dtype)
        m0 = hyp_mean[0]
        omega = jnp.exp(hyp_mean[1:D + 1])
        alpha = jnp.exp(hyp_mean[D + 1])
        h_se = jnp.exp(hyp_mean[D + 2])
        sumz2 = jnp.sum(((X - xm) / omega) ** 2, axis=-1)
        return (m0 - h_se) - 0.5 * sumz2 \
            + h_se * jnp.exp(-0.5 * sumz2 / alpha ** 2)
    if cfg.meanfun == MEAN_NEGQUADFIXONLY:
        # Fixed center, no offset (`gplite_meanfun.m:536-544`).
        xm = _center(cfg, X.dtype)
        omega = jnp.exp(hyp_mean[:D])
        return -0.5 * jnp.sum(((X - xm) / omega) ** 2, axis=-1)
    if cfg.meanfun == MEAN_NEGQUADMIX:
        # Mixture of an inner (scaled by 1/beta near the center) and outer
        # quadratic blended by a Gaussian window of radius rho
        # (`gplite_meanfun.m:552-572`):
        #   q = sum ((x-xm)/omega)^2,  a = exp(-q/(2 rho^2))
        #   m = m0 + hm + q/(2 beta^2)*(-1) - a*(hm + (1-1/beta^2) q/2)
        # (sgn = -1, the 'negquadmix' branch).
        m0 = hyp_mean[0]
        xm = hyp_mean[1:D + 1]
        omega = jnp.exp(hyp_mean[D + 1:2 * D + 1])
        hm = hyp_mean[2 * D + 1]
        rho2 = jnp.exp(2.0 * hyp_mean[2 * D + 2])
        beta2 = jnp.exp(2.0 * hyp_mean[2 * D + 3])
        sumz2 = jnp.sum(((X - xm) / omega) ** 2, axis=-1)
        alpham = jnp.exp(-0.5 * sumz2 / rho2)
        kkm = alpham * (hm + 0.5 * (1.0 - 1.0 / beta2) * sumz2)
        return m0 + hm - (0.5 / beta2) * sumz2 - kkm
    raise ValueError(f"unsupported meanfun {cfg.meanfun}")


def mean_info(cfg: GPConfig, X: np.ndarray, y: np.ndarray):
    """Bounds / plausible box / starting point for mean hyperparameters.

    Host-side (numpy) — computed once per GP fit from (typically) the HPD
    subset of training data. Returns dict of (Nmean,) arrays.
    """
    D = cfg.D
    nm = cfg.nmean
    ToL, Big = 1e-6, np.exp(3.0)
    lb = np.full(nm, -np.inf)
    ub = np.full(nm, np.inf)
    plb = np.full(nm, -np.inf)
    pub = np.full(nm, np.inf)
    x0 = np.full(nm, np.nan)

    if nm == 0:
        return dict(lb=lb, ub=ub, plb=plb, pub=pub, x0=x0)

    if y.size <= 1:
        y = np.array([0.0, 1.0])
    w = np.maximum(X.max(axis=0) - X.min(axis=0), 1e-10)
    h = max(y.max() - y.min(), 1e-10)

    def _omega_block(sl):
        lb[sl] = np.log(w) + np.log(ToL)
        ub[sl] = np.log(w) + np.log(Big)
        plb[sl] = np.log(w) + 0.5 * np.log(ToL)
        pub[sl] = np.log(w)
        x0[sl] = np.log(np.maximum(X.std(axis=0, ddof=1), 1e-10))

    def _xm_block(sl):
        lb[sl] = X.min(axis=0) - 0.5 * w
        ub[sl] = X.max(axis=0) + 0.5 * w
        plb[sl] = X.min(axis=0)
        pub[sl] = X.max(axis=0)
        x0[sl] = np.median(X, axis=0)

    if cfg.meanfun in (MEAN_NEGQUADONLY, MEAN_NEGQUADFIXONLY):
        _omega_block(slice(0, D))             # omega only, no offset
        return dict(lb=lb, ub=ub, plb=plb, pub=pub, x0=x0)
    if cfg.meanfun == MEAN_NEGQUADLINONLY:    # xm + omega, no offset
        _xm_block(slice(0, D))
        _omega_block(slice(D, 2 * D))
        return dict(lb=lb, ub=ub, plb=plb, pub=pub, x0=x0)

    # m0
    lb[0] = y.min() - 0.5 * h
    ub[0] = y.max() + 0.5 * h
    plb[0] = np.quantile(y, 0.1)
    pub[0] = np.quantile(y, 0.9)
    x0[0] = np.median(y)

    if cfg.meanfun in (MEAN_NEGQUADFIXISO, MEAN_NEGQUADFIX,
                       MEAN_NEGQUADMIX):
        # m0 bounds shared with MEAN_NEGQUAD (`gplite_meanfun.m:189-194`,
        # cases {4,10,12,22}).
        lb[0] = y.min()
        ub[0] = y.max() + h
        plb[0] = np.median(y)
        pub[0] = y.max()
        x0[0] = np.quantile(y, 0.9)
        if cfg.meanfun == MEAN_NEGQUADFIXISO:
            # Single isotropic log-omega (`gplite_meanfun.m:265-271`).
            lw = np.log(w)
            lb[1] = lw.min() + np.log(ToL)
            ub[1] = lw.max() + np.log(Big)
            plb[1] = lw.min() + 0.5 * np.log(ToL)
            pub[1] = lw.max()
            x0[1] = float(np.mean(np.log(
                np.maximum(X.std(axis=0, ddof=1), 1e-10))))
        elif cfg.meanfun == MEAN_NEGQUADFIX:
            _omega_block(slice(1, D + 1))     # (:273-279)
        else:  # MEAN_NEGQUADMIX (:313-331)
            _xm_block(slice(1, D + 1))
            _omega_block(slice(D + 1, 2 * D + 1))
            lb[2 * D + 1], ub[2 * D + 1] = -3 * h, 3 * h        # hm
            plb[2 * D + 1], pub[2 * D + 1] = -h, h
            x0[2 * D + 1] = 0.0
            for j in (2 * D + 2, 2 * D + 3):  # log rho, log beta
                lb[j], ub[j] = np.log(1e-3), np.log(1e3)
                plb[j], pub[j] = np.log(0.1), np.log(10.0)
                x0[j] = 0.0
        return dict(lb=lb, ub=ub, plb=plb, pub=pub, x0=x0)

    if cfg.meanfun == MEAN_NEGQUADSEFIX:
        # m0 (`gplite_meanfun.m:226-231`, case {14,15}) + per-dim omega +
        # the SE rescale alpha_se and height h_se (:281-291).
        lb[0], ub[0] = y.min() - h, y.max() + h
        plb[0], pub[0] = y.min(), y.max()
        x0[0] = np.median(y)
        _omega_block(slice(1, D + 1))
        lb[D + 1], ub[D + 1] = np.log(0.01), np.log(10.0)   # alpha_se
        plb[D + 1], pub[D + 1] = np.log(0.1), np.log(1.0)
        x0[D + 1] = np.log(0.5)
        lb[D + 2], ub[D + 2] = np.log(1e-3), np.log(1e4)    # h_se
        plb[D + 2], pub[D + 2] = np.log(0.1), np.log(100.0)
        x0[D + 2] = 0.0
        return dict(lb=lb, ub=ub, plb=plb, pub=pub, x0=x0)

    if cfg.meanfun == MEAN_NEGQUAD:
        lb[0] = y.min()
        ub[0] = y.max() + h
        plb[0] = np.median(y)
        pub[0] = y.max()
        x0[0] = np.quantile(y, 0.9)
        # xm
        lb[1:D + 1] = X.min(axis=0) - 0.5 * w
        ub[1:D + 1] = X.max(axis=0) + 0.5 * w
        plb[1:D + 1] = X.min(axis=0)
        pub[1:D + 1] = X.max(axis=0)
        x0[1:D + 1] = np.median(X, axis=0)
        # log omega
        lb[D + 1:2 * D + 1] = np.log(w) + np.log(ToL)
        ub[D + 1:2 * D + 1] = np.log(w) + np.log(Big)
        plb[D + 1:2 * D + 1] = np.log(w) + 0.5 * np.log(ToL)
        pub[D + 1:2 * D + 1] = np.log(w)
        x0[D + 1:2 * D + 1] = np.log(np.maximum(X.std(axis=0, ddof=1), 1e-10))
    elif cfg.meanfun == MEAN_SE:
        lb[0] = y.min() - h
        ub[0] = y.max()
        plb[0] = y.min()
        pub[0] = np.median(y)
        x0[0] = np.quantile(y, 0.1)
        lb[1:D + 1] = X.min(axis=0) - 0.5 * w
        ub[1:D + 1] = X.max(axis=0) + 0.5 * w
        plb[1:D + 1] = X.min(axis=0)
        pub[1:D + 1] = X.max(axis=0)
        x0[1:D + 1] = np.median(X, axis=0)
        lb[D + 1:2 * D + 1] = np.log(w) + np.log(ToL)
        ub[D + 1:2 * D + 1] = np.log(w) + np.log(Big)
        plb[D + 1:2 * D + 1] = np.log(w) + 0.5 * np.log(ToL)
        pub[D + 1:2 * D + 1] = np.log(w)
        x0[D + 1:2 * D + 1] = np.log(np.maximum(X.std(axis=0, ddof=1), 1e-10))
        lb[2 * D + 1] = np.log(h) + np.log(ToL)
        ub[2 * D + 1] = np.log(h) + np.log(Big)
        plb[2 * D + 1] = np.log(h) + 0.5 * np.log(ToL)
        pub[2 * D + 1] = np.log(h)
        x0[2 * D + 1] = np.log(max(np.std(y, ddof=1), 1e-10))
    elif cfg.meanfun == MEAN_NEGQUADSE:
        # m0 + negquad block as for MEAN_NEGQUAD...
        lb[0] = y.min()
        ub[0] = y.max() + h
        plb[0] = np.median(y)
        pub[0] = y.max()
        x0[0] = np.quantile(y, 0.9)
        _xm_block(slice(1, D + 1))
        _omega_block(slice(D + 1, 2 * D + 1))
        # ...plus the SE-bump location/scale and raw height
        # (`gplite_meanfun.m:244-263`).
        _xm_block(slice(2 * D + 1, 3 * D + 1))
        x0[2 * D + 1:3 * D + 1] = X[np.argmax(y)]
        _omega_block(slice(3 * D + 1, 4 * D + 1))
        lb[4 * D + 1] = -Big * h
        ub[4 * D + 1] = Big * h
        plb[4 * D + 1] = -h
        pub[4 * D + 1] = h
        x0[4 * D + 1] = min(np.std(y, ddof=1), h)

    nan = np.isnan(x0)
    x0[nan] = 0.5 * (plb[nan] + pub[nan])
    return dict(lb=lb, ub=ub, plb=plb, pub=pub, x0=x0)
