"""Covariance-function families beyond the SE-ard default
(cf. `gplite/gplite_covfun.m:77-91`): seiso (id 0, single length scale) and
Matérn ard with nu in {1,3,5} (id 3). nlZ parity vs a dense NumPy
reference, autodiff gradients vs finite differences, and the clear-error
guard on the SE-only Bayesian-quadrature paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.gp import GPConfig, neg_log_marginal_likelihood, gp_predict
from vbmc_tpu.gp.config import (COV_SEISO, COV_SEARD, COV_MATERN,
                                MEAN_NEGQUAD, MEAN_ZERO)
from vbmc_tpu.gp.gp import gp_from_host
from vbmc_tpu.gp.means import mean_function


def _naive_gram(cfg, hyp, X):
    ne = cfg.n_ell
    ell = np.exp(hyp[:ne])             # (1,) broadcasts for iso
    sf2 = np.exp(2 * hyp[cfg.idx_log_sf])
    Xs = X / ell
    d2 = ((Xs[:, None, :] - Xs[None, :, :]) ** 2).sum(-1)
    if cfg.covfun in (COV_SEARD, COV_SEISO):
        return sf2 * np.exp(-0.5 * d2)
    t = np.sqrt(np.maximum(cfg.cov_nu * d2, 0.0))
    f = {1: np.ones_like(t), 3: 1 + t, 5: 1 + t * (1 + t / 3)}[cfg.cov_nu]
    return sf2 * f * np.exp(-t)


def _naive_nlz(cfg, hyp, X, y):
    K = _naive_gram(cfg, hyp, X) + np.exp(2 * hyp[cfg.ncov]) * np.eye(len(y))
    m = np.asarray(mean_function(cfg, jnp.asarray(hyp[cfg.sl_mean]),
                                 jnp.asarray(X)))
    r = y - m
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(K, r)
    return (0.5 * r @ a + np.log(np.diag(L)).sum()
            + 0.5 * len(y) * np.log(2 * np.pi))


FAMILIES = [
    GPConfig(D=3, covfun=COV_SEISO, meanfun=MEAN_NEGQUAD),
    GPConfig(D=3, covfun=COV_MATERN, cov_nu=1, meanfun=MEAN_NEGQUAD),
    GPConfig(D=3, covfun=COV_MATERN, cov_nu=3, meanfun=MEAN_NEGQUAD),
    GPConfig(D=3, covfun=COV_MATERN, cov_nu=5, meanfun=MEAN_NEGQUAD),
]


@pytest.mark.parametrize("cfg", FAMILIES,
                         ids=["seiso", "matern1", "matern3", "matern5"])
def test_nlz_matches_naive(cfg, rng):
    n, D = 17, cfg.D
    assert cfg.ncov == (2 if cfg.covfun == COV_SEISO else D + 1)
    X = rng.standard_normal((n, D))
    y = np.sin(X).sum(1) + 0.01 * rng.standard_normal(n)
    hyp = 0.3 * rng.standard_normal(cfg.nhyp)
    hyp[cfg.ncov] = np.log(0.1)

    expected = _naive_nlz(cfg, hyp, X, y)
    nb = 32
    Xp = np.zeros((nb, D)); Xp[:n] = X
    yp = np.zeros(nb); yp[:n] = y
    mask = jnp.asarray(np.arange(nb) < n)
    got = neg_log_marginal_likelihood(
        cfg, jnp.asarray(hyp), jnp.asarray(Xp), jnp.asarray(yp),
        jnp.zeros(nb), mask)
    np.testing.assert_allclose(float(got), expected, rtol=1e-8)


@pytest.mark.parametrize("cfg", FAMILIES,
                         ids=["seiso", "matern1", "matern3", "matern5"])
def test_nlz_grad_vs_finite_differences(cfg, rng):
    # Matérn nu=1/3 are not C^2 at coincident points, but autodiff through
    # the masked Gram math is still exact for distinct training inputs.
    n, nb, D = 12, 32, cfg.D
    X = rng.standard_normal((n, D))
    y = -np.sum(X ** 2, 1)
    hyp = 0.1 * rng.standard_normal(cfg.nhyp)
    hyp[cfg.ncov] = np.log(0.2)

    Xp = np.zeros((nb, D)); Xp[:n] = X
    yp = np.zeros(nb); yp[:n] = y
    mask = jnp.asarray(np.arange(nb) < n)

    f = lambda h: neg_log_marginal_likelihood(
        cfg, h, jnp.asarray(Xp), jnp.asarray(yp), jnp.zeros(nb), mask)
    g = np.asarray(jax.grad(f)(jnp.asarray(hyp)))

    # nu=1 (OU) is only C^0 in the distance: central differences carry
    # larger truncation error there, so the check is correspondingly looser.
    rtol = 1e-3 if (cfg.covfun == COV_MATERN and cfg.cov_nu == 1) else 2e-5
    eps = 1e-6
    for i in range(cfg.nhyp):
        hp = hyp.copy(); hp[i] += eps
        hm = hyp.copy(); hm[i] -= eps
        fd = (float(f(jnp.asarray(hp))) - float(f(jnp.asarray(hm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=rtol, atol=1e-6)


@pytest.mark.parametrize("cfg", FAMILIES,
                         ids=["seiso", "matern1", "matern3", "matern5"])
def test_predict_interpolates(cfg, rng):
    cfg = GPConfig(D=2, covfun=cfg.covfun, cov_nu=cfg.cov_nu,
                   meanfun=MEAN_ZERO)
    n = 48
    X = rng.uniform(-2, 2, (n, 2))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1])
    hyp = np.zeros(cfg.nhyp)
    hyp[cfg.sl_log_ell] = np.log(0.7)
    hyp[cfg.idx_log_sf] = 0.0
    hyp[cfg.ncov] = np.log(1e-3)

    gp = gp_from_host(cfg, X, y, None, hyp[None, :], n_bucket=64, s_bucket=1)
    Xstar = rng.uniform(-1.5, 1.5, (40, 2))
    fbar, vtot, _, _ = gp_predict(cfg, gp, jnp.asarray(Xstar))
    truth = np.sin(Xstar[:, 0]) * np.cos(Xstar[:, 1])
    # Matérn-1 (Ornstein-Uhlenbeck) interpolates much more roughly.
    tol = 0.25 if (cfg.covfun == COV_MATERN and cfg.cov_nu == 1) else 0.08
    assert np.sqrt(np.mean((np.asarray(fbar) - truth) ** 2)) < tol
    assert np.all(np.asarray(vtot) >= -1e-12)


def test_train_gp_runs_with_matern(rng):
    from vbmc_tpu.gp import train_gp, TrainOptions
    D, n = 2, 24
    cfg = GPConfig(D=D, covfun=COV_MATERN, cov_nu=3, meanfun=MEAN_NEGQUAD)
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum(X ** 2, 1)
    opts = TrainOptions(ns_samples=0, ninit=64, nopts=1, lbfgs_iters=20)
    gp, info = train_gp(jax.random.PRNGKey(0), cfg, X, y, None,
                        np.full(D, -2.0), np.full(D, 2.0), opts)
    fbar, _, _, _ = gp_predict(cfg, gp, jnp.asarray(X[:8]))
    assert np.all(np.isfinite(np.asarray(fbar)))
    assert np.sqrt(np.mean((np.asarray(fbar) - y[:8]) ** 2)) < 0.5


def test_train_gp_runs_with_seiso(rng):
    from vbmc_tpu.gp import train_gp, TrainOptions
    D, n = 2, 24
    cfg = GPConfig(D=D, covfun=COV_SEISO, meanfun=MEAN_NEGQUAD)
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum(X ** 2, 1)
    opts = TrainOptions(ns_samples=0, ninit=64, nopts=1, lbfgs_iters=20)
    gp, info = train_gp(jax.random.PRNGKey(0), cfg, X, y, None,
                        np.full(D, -2.0), np.full(D, 2.0), opts)
    fbar, _, _, _ = gp_predict(cfg, gp, jnp.asarray(X[:8]))
    assert np.all(np.isfinite(np.asarray(fbar)))


def test_bq_elbo_rejects_non_se_kernel(rng):
    from vbmc_tpu import elbo as eb
    cfg = GPConfig(D=2, covfun=COV_MATERN, cov_nu=5)
    X = rng.uniform(-1, 1, (8, 2))
    y = -np.sum(X ** 2, 1)
    hyp = np.zeros((1, cfg.nhyp))
    gp = gp_from_host(cfg, X, y, None, hyp, n_bucket=8, s_bucket=1)
    mu = jnp.zeros((2, 2)); sigma = jnp.ones(2)
    lam = jnp.ones(2); kmask = jnp.ones(2, dtype=bool)
    with pytest.raises(ValueError, match="SE-ard"):
        eb.gplogjoint_I(cfg, gp, mu, sigma, lam)
