"""Fixed-center and mixture GP mean families (gplite_meanfun.m ids
10/12/14/18/22): pointwise formulas, autodiff gradients, Bayesian-quadrature
integrals vs Monte Carlo, smoothing quadrature vs point prediction, and the
training pipeline end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.gp import (
    GPConfig, neg_log_marginal_likelihood, gp_predict, train_gp, TrainOptions,
)
from vbmc_tpu.gp.config import (
    MEAN_NEGQUADFIXISO, MEAN_NEGQUADFIX, MEAN_NEGQUADSEFIX,
    MEAN_NEGQUADFIXONLY, MEAN_NEGQUADMIX,
)
from vbmc_tpu.gp.gp import gp_from_host
from vbmc_tpu.gp.means import mean_function, mean_info, fix_center_from_data
from vbmc_tpu.gp.quad import gp_quad
from vbmc_tpu import elbo as eb

FAMILIES = [MEAN_NEGQUADFIXISO, MEAN_NEGQUADFIX, MEAN_NEGQUADSEFIX,
            MEAN_NEGQUADFIXONLY, MEAN_NEGQUADMIX]


def _cfg(meanfun, D=2):
    center = (0.3, -0.2) if meanfun != MEAN_NEGQUADMIX else ()
    return GPConfig(D=D, meanfun=meanfun, fix_center=center)


def _mean_hyp(cfg, rng):
    """Modest random mean hyperparameters (log-scales near 0)."""
    h = 0.2 * rng.standard_normal(cfg.nmean)
    if cfg.meanfun == MEAN_NEGQUADMIX:
        h[2 * cfg.D + 2] = 0.3    # log rho: keep the window non-degenerate
        h[2 * cfg.D + 3] = 0.2    # log beta
    return h


def _make_gp(rng, meanfun, n=20, n_hyp=2):
    cfg = _cfg(meanfun)
    D = cfg.D
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum(X ** 2, 1) + 0.1 * np.sin(3 * X[:, 0])
    hyps = np.zeros((n_hyp, cfg.nhyp))
    for s in range(n_hyp):
        hyps[s, :D] = np.log(0.8) + 0.1 * rng.standard_normal(D)
        hyps[s, D] = np.log(1.5) + 0.1 * rng.standard_normal()
        hyps[s, cfg.ncov] = np.log(0.05)
        hyps[s, cfg.sl_mean] = _mean_hyp(cfg, rng)
    gp = gp_from_host(cfg, X, y, None, hyps, n_bucket=32, s_bucket=2)
    return cfg, gp


@pytest.mark.parametrize("meanfun", FAMILIES)
def test_nlz_padding_invariant_and_grad(meanfun, rng):
    D, n = 2, 14
    cfg = _cfg(meanfun, D)
    X = rng.uniform(-2, 2, (n, D))
    y = np.sin(X).sum(1)
    hyp = 0.2 * rng.standard_normal(cfg.nhyp)
    hyp[cfg.ncov] = np.log(0.1)
    hyp[cfg.sl_mean] = _mean_hyp(cfg, rng)

    vals = []
    for nb in (n, 32):
        Xp = np.zeros((nb, D)); Xp[:n] = X
        yp = np.zeros(nb); yp[:n] = y
        mask = jnp.asarray(np.arange(nb) < n)
        vals.append(float(neg_log_marginal_likelihood(
            cfg, jnp.asarray(hyp), jnp.asarray(Xp), jnp.asarray(yp),
            jnp.zeros(nb), mask)))
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-9)

    # Autodiff gradient vs central finite differences.
    nb = 32
    Xp = np.zeros((nb, D)); Xp[:n] = X
    yp = np.zeros(nb); yp[:n] = y
    mask = jnp.asarray(np.arange(nb) < n)
    f = lambda h: neg_log_marginal_likelihood(
        cfg, h, jnp.asarray(Xp), jnp.asarray(yp), jnp.zeros(nb), mask)
    g = np.asarray(jax.grad(f)(jnp.asarray(hyp)))
    eps = 1e-6
    for i in range(cfg.nhyp):
        hp, hm = hyp.copy(), hyp.copy()
        hp[i] += eps; hm[i] -= eps
        fd = (float(f(jnp.asarray(hp))) - float(f(jnp.asarray(hm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("meanfun", FAMILIES)
def test_gplogjoint_vs_monte_carlo(meanfun, rng):
    """The closed-form quadrature of the new mean families must match MC
    over the GP posterior mean (which goes through `mean_function`)."""
    cfg, gp = _make_gp(rng, meanfun)
    K, k_max = 2, 2
    mu = rng.uniform(-1, 1, (k_max, cfg.D))
    sigma = 0.5 * np.exp(0.2 * rng.standard_normal(k_max))
    lam = np.ones(cfg.D)
    w = np.full(k_max, 1.0 / K)
    kmask = np.arange(k_max) < K
    G, *_ = eb.gplogjoint(cfg, gp, jnp.asarray(mu), jnp.asarray(sigma),
                          jnp.asarray(lam), jnp.asarray(w),
                          jnp.asarray(kmask), compute_var=1)
    nmc = 40000
    fmu_w = 0.0
    for k in range(K):
        eps = rng.standard_normal((nmc, cfg.D))
        xs = mu[k] + sigma[k] * lam * eps
        _, _, fmu, _ = gp_predict(cfg, gp, jnp.asarray(xs))
        m = np.asarray(gp.hyp_mask, bool)
        fmu_w += w[k] * np.asarray(fmu)[m].mean(axis=0).mean()
    np.testing.assert_allclose(float(G), fmu_w, rtol=0.0, atol=0.03)


@pytest.mark.parametrize("meanfun", FAMILIES)
def test_gp_quad_tiny_delta_matches_predict(meanfun, rng):
    """With a vanishing smoothing bandwidth the quadrature collapses to the
    pointwise posterior mean — checks the gp_quad mean branches."""
    cfg, gp = _make_gp(rng, meanfun)
    Xs = rng.uniform(-1.5, 1.5, (6, cfg.D))
    fq, _ = gp_quad(cfg, gp, jnp.asarray(Xs),
                    jnp.full(cfg.D, 1e-7), compute_var=False)
    _, _, fmu, _ = gp_predict(cfg, gp, jnp.asarray(Xs))
    m = np.asarray(gp.hyp_mask, bool)
    np.testing.assert_allclose(np.asarray(fq)[m], np.asarray(fmu)[m],
                               rtol=1e-5, atol=1e-6)


def test_missing_center_raises(rng):
    cfg = GPConfig(D=2, meanfun=MEAN_NEGQUADFIX)   # no fix_center
    with pytest.raises(ValueError, match="fix_center"):
        mean_function(cfg, jnp.zeros(cfg.nmean), jnp.zeros((3, 2)))


def test_fix_center_from_data():
    X = np.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]])
    y = np.array([0.1, 0.9, 0.4])
    assert fix_center_from_data(X, y) == (2.0, 3.0)


@pytest.mark.slow
def test_vbmc_run_with_negquadfix(rng):
    """End-to-end smoke: vbmc() with the fixed-center quadratic mean family
    (the center follows the incumbent per GP train, `gplite_meanfun.m:
    334-341` via `main._recenter_cfg`)."""
    from vbmc_tpu import vbmc, VBMCOptions

    sd = np.array([1.0, 0.8])

    def logp(x):
        return float(-0.5 * np.sum((x / sd) ** 2) - np.log(2 * np.pi)
                     - np.sum(np.log(sd)))

    opts = VBMCOptions(display="off", max_fun_evals=35, seed=3,
                       min_final_components=10, gp_mean_fun="negquadfix")
    res = vbmc(logp, x0=np.zeros(2), plb=np.full(2, -3.0),
               pub=np.full(2, 3.0), options=opts)
    assert np.isfinite(res.elbo)
    assert abs(res.elbo) < 1.0


def test_train_gp_negquadfix_recovers_function(rng):
    """End-to-end fit with a fixed-center quadratic mean: predictions and
    the `mean_info` bounds path (`assemble_hyp_prior`)."""
    D, n = 2, 40
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum((X - 0.3) ** 2, 1)
    cfg = GPConfig(D=D, meanfun=MEAN_NEGQUADFIX,
                   fix_center=fix_center_from_data(X, y))
    minfo = mean_info(cfg, X, y)
    assert np.all(minfo["lb"] <= minfo["x0"]) and \
        np.all(minfo["x0"] <= minfo["ub"])
    opts = TrainOptions(ninit=64, nopts=1, ns_samples=0, lbfgs_iters=60)
    gp, _ = train_gp(jax.random.PRNGKey(0), cfg, X, y, None,
                     np.full(D, -2.0), np.full(D, 2.0), opts)
    Xt = rng.uniform(-1.5, 1.5, (12, D))
    fbar, _, _, _ = gp_predict(cfg, gp, jnp.asarray(Xt))
    ytrue = -0.5 * np.sum((Xt - 0.3) ** 2, 1)
    np.testing.assert_allclose(np.asarray(fbar).ravel(), ytrue, atol=0.1)
