"""GP core tests: masked marginal likelihood vs dense reference computation,
padding invariance, autodiff gradients vs finite differences, prediction
accuracy, and the full training pipeline on a known function."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.gp import (
    GPConfig, GP, gram_matrix, build_posterior, neg_log_marginal_likelihood,
    gp_predict, train_gp, TrainOptions,
)
from vbmc_tpu.gp.config import MEAN_ZERO, MEAN_CONST, MEAN_NEGQUAD
from vbmc_tpu.gp import core
from vbmc_tpu.gp.gp import gp_from_host
from vbmc_tpu.gp.means import mean_function


def _naive_nlz(cfg, hyp, X, y):
    """Dense numpy reference for the (unpadded) negative log marginal lik."""
    D = cfg.D
    ell = np.exp(hyp[:D])
    sf2 = np.exp(2 * hyp[D])
    sn2 = np.exp(2 * hyp[cfg.ncov])
    Xs = X / ell
    d2 = ((Xs[:, None, :] - Xs[None, :, :]) ** 2).sum(-1)
    K = sf2 * np.exp(-0.5 * d2) + sn2 * np.eye(X.shape[0])
    m = np.asarray(mean_function(cfg, jnp.asarray(hyp[cfg.sl_mean]),
                                 jnp.asarray(X)))
    r = y - m
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(K, r)
    return (0.5 * r @ a + np.log(np.diag(L)).sum()
            + 0.5 * len(y) * np.log(2 * np.pi))


@pytest.mark.parametrize("meanfun", [MEAN_ZERO, MEAN_CONST, MEAN_NEGQUAD])
def test_nlz_matches_naive_and_padding_invariant(meanfun, rng):
    D, n = 3, 17
    cfg = GPConfig(D=D, meanfun=meanfun)
    X = rng.standard_normal((n, D))
    y = np.sin(X).sum(1) + 0.01 * rng.standard_normal(n)
    hyp = 0.3 * rng.standard_normal(cfg.nhyp)
    hyp[cfg.ncov] = np.log(0.1)  # noise

    expected = _naive_nlz(cfg, hyp, X, y)

    for nb in (n, 32, 64):
        Xp = np.zeros((nb, D)); Xp[:n] = X
        yp = np.zeros(nb); yp[:n] = y
        mask = jnp.asarray(np.arange(nb) < n)
        got = neg_log_marginal_likelihood(
            cfg, jnp.asarray(hyp), jnp.asarray(Xp), jnp.asarray(yp),
            jnp.zeros(nb), mask)
        np.testing.assert_allclose(float(got), expected, rtol=1e-9)


def test_nlz_grad_vs_finite_differences(rng):
    D, n, nb = 2, 12, 32
    cfg = GPConfig(D=D, meanfun=MEAN_NEGQUAD)
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

    eps = 1e-6
    for i in range(cfg.nhyp):
        hp = hyp.copy(); hp[i] += eps
        hm = hyp.copy(); hm[i] -= eps
        fd = (float(f(jnp.asarray(hp))) - float(f(jnp.asarray(hm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-5, atol=1e-7)


def test_predict_interpolates(rng):
    D, n = 2, 40
    cfg = GPConfig(D=D, meanfun=MEAN_ZERO)
    X = rng.uniform(-2, 2, (n, D))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1])
    hyp = np.zeros(cfg.nhyp)
    hyp[:D] = np.log(0.7)
    hyp[D] = np.log(1.0)
    hyp[cfg.ncov] = np.log(1e-3)

    gp = gp_from_host(cfg, X, y, None, hyp[None, :], n_bucket=64, s_bucket=1)
    Xstar = rng.uniform(-1.5, 1.5, (50, D))
    fbar, vtot, _, _ = gp_predict(cfg, gp, jnp.asarray(Xstar))
    truth = np.sin(Xstar[:, 0]) * np.cos(Xstar[:, 1])
    assert np.sqrt(np.mean((np.asarray(fbar) - truth) ** 2)) < 0.05
    assert np.all(np.asarray(vtot) >= 0)


def test_robust_cholesky_escalates():
    # Singular matrix: plain Cholesky fails, robust version recovers.
    B = jnp.ones((4, 4)) + 0.0
    L, ok = core.robust_cholesky(B)
    assert not bool(ok)
    assert bool(jnp.all(jnp.isfinite(L)))


def test_train_gp_recovers_function(rng):
    D, n = 2, 60
    cfg = GPConfig(D=D, meanfun=MEAN_NEGQUAD)
    X = rng.uniform(-3, 3, (n, D))
    y = -0.5 * np.sum(X ** 2, 1)  # quadratic bowl: negquad mean can nail it

    opts = TrainOptions(ns_samples=8, ninit=128, nopts=2, thin=2)
    key = jax.random.PRNGKey(0)
    gp, info = train_gp(key, cfg, X, y, None,
                        plb_tr=np.full(D, -3.0), pub_tr=np.full(D, 3.0),
                        opts=opts)
    assert int(gp.n_samples()) == 8
    Xstar = rng.uniform(-2, 2, (30, D))
    fbar, vtot, _, _ = gp_predict(cfg, gp, jnp.asarray(Xstar))
    truth = -0.5 * np.sum(Xstar ** 2, 1)
    rmse = np.sqrt(np.mean((np.asarray(fbar) - truth) ** 2))
    assert rmse < 0.1, rmse

    # MAP-only path
    opts0 = TrainOptions(ns_samples=0, ninit=64, nopts=2)
    gp0, _ = train_gp(key, cfg, X, y, None, np.full(D, -3.0), np.full(D, 3.0),
                      opts0)
    fbar0, _, _, _ = gp_predict(cfg, gp0, jnp.asarray(Xstar))
    assert np.sqrt(np.mean((np.asarray(fbar0) - truth) ** 2)) < 0.1
