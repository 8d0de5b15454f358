"""Bayesian-quadrature ELBO tests: closed forms vs Monte Carlo, entropy
estimators vs analytic values, and autodiff gradients vs finite differences
(the reference's hand-derived gradients in `gplogjoint.m`/`entlb_vbmc.m` are
replaced by autodiff; these tests are the correctness oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.gp import GPConfig
from vbmc_tpu.gp.config import MEAN_NEGQUAD, MEAN_ZERO
from vbmc_tpu.gp.gp import gp_from_host
from vbmc_tpu.gp.predict import gp_predict
from vbmc_tpu import elbo as eb


def _make_gp(rng, D=2, n=25, meanfun=MEAN_NEGQUAD, n_hyp=3):
    cfg = GPConfig(D=D, meanfun=meanfun)
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum(X ** 2, 1) + 0.1 * np.sin(3 * X[:, 0])
    hyps = np.zeros((n_hyp, cfg.nhyp))
    for s in range(n_hyp):
        hyps[s, :D] = np.log(0.8) + 0.1 * rng.standard_normal(D)
        hyps[s, D] = np.log(1.5) + 0.1 * rng.standard_normal()
        hyps[s, cfg.ncov] = np.log(0.05)
        if meanfun == MEAN_NEGQUAD:
            hyps[s, cfg.ncov + cfg.nnoise] = 0.5          # m0
            hyps[s, cfg.ncov + cfg.nnoise + 1:cfg.ncov + cfg.nnoise + 1 + D] = 0.1
            hyps[s, cfg.ncov + cfg.nnoise + 1 + D:] = np.log(1.2)
    gp = gp_from_host(cfg, X, y, None, hyps, n_bucket=32, s_bucket=4)
    return cfg, gp


def _vp_arrays(rng, D=2, K=3, k_max=4):
    mu = np.zeros((k_max, D))
    mu[:K] = rng.uniform(-1, 1, (K, D))
    sigma = np.ones(k_max)
    sigma[:K] = np.exp(0.2 * rng.standard_normal(K)) * 0.6
    lam = np.exp(0.1 * rng.standard_normal(D))
    lam = lam * np.sqrt(D / np.sum(lam ** 2))
    w = np.zeros(k_max)
    w[:K] = rng.random(K) + 0.5
    w[:K] /= w[:K].sum()
    kmask = np.arange(k_max) < K
    return (jnp.asarray(mu), jnp.asarray(sigma), jnp.asarray(lam),
            jnp.asarray(w), jnp.asarray(kmask))


def test_gplogjoint_vs_monte_carlo(rng):
    cfg, gp = _make_gp(rng)
    mu, sigma, lam, w, kmask = _vp_arrays(rng)
    G, varG, varss, I, J = eb.gplogjoint(cfg, gp, mu, sigma, lam, w, kmask,
                                         compute_var=1)
    # MC estimate of E_q[fbar] using balanced component sampling.
    nmc = 40000
    K = 3
    samples = []
    for k in range(K):
        eps = rng.standard_normal((nmc, cfg.D))
        xs = np.asarray(mu)[k] + np.asarray(sigma)[k] * np.asarray(lam) * eps
        samples.append((float(np.asarray(w)[k]), xs))
    # E_q[f] under each hyp sample, averaged (same as averaging I_sk).
    fmu_w = 0.0
    for wk, xs in samples:
        fbar, _, fmu, _ = gp_predict(cfg, gp, jnp.asarray(xs))
        m = np.asarray(gp.hyp_mask, bool)
        fmu_w += wk * np.asarray(fmu)[m].mean(axis=0).mean()
    np.testing.assert_allclose(float(G), fmu_w, rtol=0.0, atol=0.02)
    assert float(varG) > 0
    # J must be symmetric with positive diagonal for active comps.
    Jn = np.asarray(J)[np.asarray(gp.hyp_mask, bool)][:, :3, :3]
    np.testing.assert_allclose(Jn, np.swapaxes(Jn, 1, 2), rtol=1e-8)


def test_gplogjoint_variance_vs_monte_carlo(rng):
    """J_jk = Cov over GP posterior of integrals under q_j, q_k — MC check."""
    cfg, gp = _make_gp(rng, n_hyp=1)
    mu, sigma, lam, w, kmask = _vp_arrays(rng)
    _, _, _, _, J = eb.gplogjoint(cfg, gp, mu, sigma, lam, w, kmask,
                                  compute_var=1)
    from vbmc_tpu.gp.kernels import kernel_cross
    from jax.scipy.linalg import cho_solve
    hyp = gp.hyp[0]
    nmc = 3000
    epsj = rng.standard_normal((nmc, cfg.D))
    for (j, k) in [(0, 0), (0, 1), (1, 2)]:
        xj = np.asarray(mu)[j] + np.asarray(sigma)[j] * np.asarray(lam) * epsj
        xk = np.asarray(mu)[k] + np.asarray(sigma)[k] * np.asarray(lam) * \
            rng.standard_normal((nmc, cfg.D))
        kjk = kernel_cross(cfg, hyp, jnp.asarray(xj), jnp.asarray(xk))
        kxj = kernel_cross(cfg, hyp, jnp.asarray(xj), gp.X) * gp.mask[None, :]
        kxk = kernel_cross(cfg, hyp, jnp.asarray(xk), gp.X) * gp.mask[None, :]
        corr = jnp.einsum("in,in->i", kxj,
                          cho_solve((gp.L[0], True), kxk.T).T)
        cov_mc = float(jnp.mean(jnp.diagonal(kjk)) - jnp.mean(corr))
        np.testing.assert_allclose(float(J[0, j, k]), cov_mc, atol=5e-3)


def test_entropy_lower_bound_k1_exact(rng):
    D, k_max = 3, 4
    mu = jnp.zeros((k_max, D))
    sigma = jnp.ones(k_max) * 0.7
    lam = jnp.asarray(np.exp(0.3 * rng.standard_normal(D)))
    w = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    kmask = jnp.asarray([True, False, False, False])
    H = eb.entropy_lower_bound(mu, sigma, lam, w, kmask)
    H_exact = (0.5 * D * (1 + np.log(2 * np.pi)) + D * np.log(0.7)
               + np.sum(np.log(np.asarray(lam))))
    np.testing.assert_allclose(float(H), H_exact, rtol=1e-10)


def test_entropy_mc_matches_exact_gaussian(rng):
    D, k_max = 2, 4
    mu = jnp.zeros((k_max, D))
    sigma = jnp.ones(k_max) * 1.3
    lam = jnp.ones(D)
    w = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    kmask = jnp.asarray([True, False, False, False])
    H = eb.entropy_mc(jax.random.PRNGKey(1), mu, sigma, lam, w, kmask, 20000)
    H_exact = 0.5 * D * (1 + np.log(2 * np.pi)) + D * np.log(1.3)
    np.testing.assert_allclose(float(H), H_exact, atol=0.05)


def test_entropy_lb_below_mc(rng):
    mu_np = np.zeros((4, 2))
    mu_np[:3] = rng.uniform(-2, 2, (3, 2))
    mu = jnp.asarray(mu_np)
    sigma = jnp.asarray([0.5, 0.8, 1.2, 1.0])
    lam = jnp.ones(2)
    w = jnp.asarray([0.3, 0.3, 0.4, 0.0])
    kmask = jnp.asarray([True, True, True, False])
    H_lb = eb.entropy_lower_bound(mu, sigma, lam, w, kmask)
    H_mc = eb.entropy_mc(jax.random.PRNGKey(0), mu, sigma, lam, w, kmask,
                         4000)
    assert float(H_lb) <= float(H_mc) + 0.02


def test_negelcbo_grad_vs_fd(rng):
    cfg, gp = _make_gp(rng, n_hyp=2)
    mu, sigma, lam, w, kmask = _vp_arrays(rng)
    flags = eb.VPFlags(opt_mu=True, opt_sigma=True, opt_lambda=True,
                       opt_weights=True)
    eta = jnp.where(kmask, jnp.log(jnp.maximum(w, 1e-10)), -5.0)
    theta = eb.pack_theta(flags, mu, sigma, lam, eta)
    key = jax.random.PRNGKey(0)

    def f(th):
        F, _ = eb.negelcbo(cfg, th, gp, mu, sigma, lam, w, kmask, flags,
                           0.0, 0, 0, key)
        return F

    g = np.asarray(jax.grad(f)(theta))
    eps = 1e-6
    th = np.asarray(theta)
    idxs = rng.choice(len(th), size=min(10, len(th)), replace=False)
    for i in idxs:
        tp = th.copy(); tp[i] += eps
        tm = th.copy(); tm[i] -= eps
        fd = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-4, atol=1e-6)


def test_negelcbo_mc_entropy_grad_finite(rng):
    cfg, gp = _make_gp(rng, n_hyp=2)
    mu, sigma, lam, w, kmask = _vp_arrays(rng)
    flags = eb.VPFlags(opt_weights=True)
    eta = jnp.where(kmask, jnp.log(jnp.maximum(w, 1e-10)), -5.0)
    theta = eb.pack_theta(flags, mu, sigma, lam, eta)

    def f(th):
        F, _ = eb.negelcbo(cfg, th, gp, mu, sigma, lam, w, kmask, flags,
                           0.0, 64, 0, jax.random.PRNGKey(7))
        return F

    g = np.asarray(jax.grad(f)(theta))
    assert np.all(np.isfinite(g))
