"""Tests for the GP library extras: output warps ("fitness shaping",
cf. `gplite/outwarp_*.m`) and the integrated Bayesian-linear mean
(cf. `gplite/gplite_intmeanfun.m`, `gplite_core.m:106-189`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.gp.config import (GPConfig, MEAN_ZERO, MEAN_NEGQUAD,
                                INTMEAN_CONST, INTMEAN_LINEAR, INTMEAN_QUAD,
                                OUTWARP_NEGPOW, OUTWARP_NEGPOWC1,
                                OUTWARP_NEGSCALEDPOW)
from vbmc_tpu.gp.outwarp import (outwarp_direct, outwarp_inverse,
                                 outwarp_deriv, N_OUTWARP_HYP)
from vbmc_tpu.gp import core
from vbmc_tpu.gp.gp import gp_from_host
from vbmc_tpu.gp.predict import gp_predict
from vbmc_tpu.gp.means import int_mean_basis

ALL_WARPS = [OUTWARP_NEGPOW, OUTWARP_NEGPOWC1, OUTWARP_NEGSCALEDPOW]


def _warp_hyp(warp_id, y0=0.0, logk=0.4, loga=-0.3):
    if warp_id == OUTWARP_NEGSCALEDPOW:
        return jnp.array([y0, loga, logk])
    return jnp.array([y0, logk])


@pytest.mark.parametrize("warp_id", ALL_WARPS)
def test_outwarp_roundtrip(warp_id, rng):
    hyp = _warp_hyp(warp_id)
    y = jnp.asarray(rng.uniform(-20.0, 5.0, size=64))
    t = outwarp_direct(warp_id, hyp, y)
    y_back = outwarp_inverse(warp_id, hyp, t)
    np.testing.assert_allclose(np.asarray(y_back), np.asarray(y),
                               rtol=1e-10, atol=1e-10)
    # Identity above the threshold.
    above = np.asarray(y) >= 0.0
    np.testing.assert_array_equal(np.asarray(t)[above], np.asarray(y)[above])
    # Monotone increasing.
    order = np.argsort(np.asarray(y))
    assert np.all(np.diff(np.asarray(t)[order]) > 0)


@pytest.mark.parametrize("warp_id", ALL_WARPS)
def test_outwarp_deriv_matches_autodiff(warp_id, rng):
    hyp = _warp_hyp(warp_id)
    y = jnp.asarray(rng.uniform(-20.0, 5.0, size=32))
    g = outwarp_deriv(warp_id, hyp, y)
    g_ad = jax.vmap(jax.grad(
        lambda yy: outwarp_direct(warp_id, hyp, yy[None])[0]))(y)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("warp_id", ALL_WARPS)
def test_outwarp_identity_when_threshold_below_data(warp_id, rng):
    """With y0 below min(y) the warp is the identity: the warped GP must
    reproduce the plain GP exactly (nlZ and predictions)."""
    D = 2
    X = rng.standard_normal((12, D))
    y = 1.0 + np.sin(X[:, 0]) + 0.1 * rng.standard_normal(12)  # y in ~[0,2]

    cfg0 = GPConfig(D=D, meanfun=MEAN_ZERO)
    cfgw = GPConfig(D=D, meanfun=MEAN_ZERO, outwarp=warp_id)
    base_hyp = np.concatenate([np.zeros(D), [0.0], [np.log(0.1)]])
    hyp_w = np.concatenate([base_hyp,
                            np.asarray(_warp_hyp(warp_id, y0=-50.0))])

    mask = jnp.ones(12, dtype=bool)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    s2 = jnp.zeros(12)
    nlz0 = core.neg_log_marginal_likelihood(cfg0, jnp.asarray(base_hyp),
                                            Xj, yj, s2, mask)
    nlzw = core.neg_log_marginal_likelihood(cfgw, jnp.asarray(hyp_w),
                                            Xj, yj, s2, mask)
    np.testing.assert_allclose(float(nlzw), float(nlz0), rtol=1e-12)

    gp0 = gp_from_host(cfg0, X, y, None, base_hyp[None, :], 16, 1)
    gpw = gp_from_host(cfgw, X, y, None, hyp_w[None, :], 16, 1)
    Xs = jnp.asarray(rng.standard_normal((8, D)))
    f0, v0, _, _ = gp_predict(cfg0, gp0, Xs)
    fw, vw, _, _ = gp_predict(cfgw, gpw, Xs)
    np.testing.assert_allclose(np.asarray(fw), np.asarray(f0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(vw), np.asarray(v0), rtol=1e-8)


def test_outwarp_nlz_jacobian_correction(rng):
    """An active warp must include the change-of-variables Jacobian: the
    warped-GP likelihood of y equals the plain-GP likelihood of t = g(y)
    plus sum log g'(y)."""
    D = 1
    warp_id = OUTWARP_NEGPOWC1
    X = rng.standard_normal((10, D))
    y = rng.uniform(-8.0, 2.0, size=10)
    hyp_ow = _warp_hyp(warp_id, y0=0.0, logk=0.5)
    base_hyp = np.concatenate([np.zeros(D), [0.3], [np.log(0.2)]])
    hyp_w = np.concatenate([base_hyp, np.asarray(hyp_ow)])

    cfg0 = GPConfig(D=D, meanfun=MEAN_ZERO)
    cfgw = GPConfig(D=D, meanfun=MEAN_ZERO, outwarp=warp_id)
    mask = jnp.ones(10, dtype=bool)
    t = outwarp_direct(warp_id, hyp_ow, jnp.asarray(y))
    g = outwarp_deriv(warp_id, hyp_ow, jnp.asarray(y))
    s2 = jnp.zeros(10)
    nlz_plain_t = core.neg_log_marginal_likelihood(
        cfg0, jnp.asarray(base_hyp), jnp.asarray(X), t, s2, mask)
    nlz_w = core.neg_log_marginal_likelihood(
        cfgw, jnp.asarray(hyp_w), jnp.asarray(X), jnp.asarray(y), s2, mask)
    np.testing.assert_allclose(
        float(nlz_w), float(nlz_plain_t) - float(jnp.sum(jnp.log(g))),
        rtol=1e-10)
    # Differentiability of the full hyperparameter vector.
    grad = jax.grad(lambda h: core.neg_log_marginal_likelihood(
        cfgw, h, jnp.asarray(X), jnp.asarray(y), s2, mask))(jnp.asarray(hyp_w))
    assert np.all(np.isfinite(np.asarray(grad)))


@pytest.mark.parametrize("intmean,nb", [(INTMEAN_CONST, 1),
                                        (INTMEAN_LINEAR, 3),
                                        (INTMEAN_QUAD, 5)])
def test_intmean_vague_limit(intmean, nb, rng):
    """The vague-prior marginalization must match the finite-Gaussian-prior
    GP (kernel augmented by c^2 H^T H) in the c -> inf limit:
    nlZ_vague = nlZ_aug - Nb/2 log(2 pi c^2), and identical predictions."""
    D = 2
    N = 14
    X = rng.standard_normal((N, D))
    y = 0.5 * X[:, 0] - 0.2 * np.sum(X ** 2, 1) + 0.1 * rng.standard_normal(N)
    sn2 = 0.05
    hyp = np.concatenate([np.zeros(D), [0.0], [0.5 * np.log(sn2)]])
    cfg = GPConfig(D=D, meanfun=MEAN_ZERO, intmean=intmean)
    assert cfg.nint == nb

    mask = jnp.ones(N, dtype=bool)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    s2 = jnp.zeros(N)
    nlz_vague = float(core.neg_log_marginal_likelihood(
        cfg, jnp.asarray(hyp), Xj, yj, s2, mask))

    # Dense numpy oracle with a finite prior beta ~ N(0, c^2 I).
    from vbmc_tpu.gp.kernels import kernel_cross
    K = np.asarray(kernel_cross(cfg, jnp.asarray(hyp), Xj, Xj))
    H = np.asarray(int_mean_basis(cfg, Xj))               # (N, Nb)
    c2 = 1e8
    B_aug = K + sn2 * np.eye(N) + c2 * (H @ H.T)
    sign, logdet = np.linalg.slogdet(B_aug)
    nlz_aug = 0.5 * y @ np.linalg.solve(B_aug, y) + 0.5 * logdet \
        + 0.5 * N * np.log(2 * np.pi)
    np.testing.assert_allclose(
        nlz_vague, nlz_aug - 0.5 * nb * np.log(2 * np.pi * c2), rtol=1e-5)

    # Predictions must agree with the augmented-kernel GP.
    gp = gp_from_host(cfg, X, y, None, hyp[None, :], 16, 1)
    Xs = rng.standard_normal((6, D))
    fbar, vtot, _, _ = gp_predict(cfg, gp, jnp.asarray(Xs))
    Ks = np.asarray(kernel_cross(cfg, jnp.asarray(hyp), Xj,
                                 jnp.asarray(Xs)))     # (N, M)
    Hs = np.asarray(int_mean_basis(cfg, jnp.asarray(Xs)))  # (M, Nb)
    Ks_aug = Ks + c2 * (H @ Hs.T)
    kss_aug = np.exp(2 * hyp[D]) + c2 * np.sum(Hs * Hs, axis=1)
    fm_aug = Ks_aug.T @ np.linalg.solve(B_aug, y)
    fv_aug = kss_aug - np.sum(Ks_aug * np.linalg.solve(B_aug, Ks_aug), axis=0)
    np.testing.assert_allclose(np.asarray(fbar), fm_aug, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vtot), fv_aug, rtol=1e-3, atol=1e-4)


def test_intmean_masking_invariance(rng):
    """Padded rows must not affect the integrated-mean posterior."""
    D = 2
    N = 10
    X = rng.standard_normal((N, D))
    y = X[:, 0] - 0.3 * X[:, 1] + 0.05 * rng.standard_normal(N)
    hyp = np.concatenate([np.zeros(D), [0.0], [np.log(0.1)]])
    cfg = GPConfig(D=D, meanfun=MEAN_ZERO, intmean=INTMEAN_LINEAR)
    gp_small = gp_from_host(cfg, X, y, None, hyp[None, :], 16, 1)
    gp_big = gp_from_host(cfg, X, y, None, hyp[None, :], 32, 1)
    Xs = jnp.asarray(rng.standard_normal((5, D)))
    f1, v1, _, _ = gp_predict(cfg, gp_small, Xs)
    f2, v2, _, _ = gp_predict(cfg, gp_big, Xs)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-8)


def test_intmean_quadrature_matches_mc(rng):
    """gplogjoint_I with an integrated mean must match Monte-Carlo
    integration of the GP posterior mean under the mixture components."""
    from vbmc_tpu.elbo import gplogjoint_I
    D = 2
    N = 16
    X = rng.standard_normal((N, D)) * 2.0
    y = -0.5 * np.sum(X ** 2, 1) + 1.0 + 0.02 * rng.standard_normal(N)
    hyp = np.concatenate([np.zeros(D), [0.0], [np.log(0.1)]])
    cfg = GPConfig(D=D, meanfun=MEAN_ZERO, intmean=INTMEAN_QUAD)
    gp = gp_from_host(cfg, X, y, None, hyp[None, :], 16, 1)

    K = 3
    mu = jnp.asarray(rng.standard_normal((K, D)) * 0.5)
    sigma = jnp.asarray(np.array([0.3, 0.5, 0.8]))
    lam = jnp.asarray(np.array([1.0, 0.7]))
    I = np.asarray(gplogjoint_I(cfg, gp, mu, sigma, lam))[0]   # (K,)

    n_mc = 400000
    for k in range(K):
        xs = (np.asarray(mu)[k]
              + np.asarray(sigma)[k] * np.asarray(lam)
              * rng.standard_normal((n_mc, D)))
        fbar, _, _, _ = gp_predict(cfg, gp, jnp.asarray(xs))
        mc = float(np.mean(np.asarray(fbar)))
        se = float(np.std(np.asarray(fbar)) / np.sqrt(n_mc))
        assert abs(I[k] - mc) < max(6 * se, 5e-3), (k, I[k], mc, se)


def test_intmean_gp_quad_correction(rng):
    """gp_quad with an integrated mean: smoothing with delta -> 0 must
    approach the plain prediction (which includes the basis correction)."""
    from vbmc_tpu.gp.quad import gp_quad
    D = 2
    N = 12
    X = rng.standard_normal((N, D))
    y = 2.0 + X[:, 0] + 0.05 * rng.standard_normal(N)
    hyp = np.concatenate([np.zeros(D), [0.0], [np.log(0.1)]])
    cfg = GPConfig(D=D, meanfun=MEAN_ZERO, intmean=INTMEAN_LINEAR)
    gp = gp_from_host(cfg, X, y, None, hyp[None, :], 16, 1)
    Xs = jnp.asarray(rng.standard_normal((5, D)))
    fq, vq = gp_quad(cfg, gp, Xs, jnp.full(D, 1e-5))
    fbar, vtot, _, _ = gp_predict(cfg, gp, Xs)
    np.testing.assert_allclose(np.asarray(fq)[0], np.asarray(fbar),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vq)[0], np.asarray(vtot),
                               rtol=1e-3, atol=1e-5)


def test_outwarp_train_smoke(rng):
    """GP training with fitness shaping enabled: finite hyperparameters,
    sensible predictions near the high-density region."""
    from vbmc_tpu.gp.fit import train_gp, TrainOptions
    D = 2
    N = 40
    X = rng.uniform(-3, 3, size=(N, D))
    y = -0.5 * np.sum(X ** 2, 1) * 6.0     # deep quadratic tail
    cfg = GPConfig(D=D, meanfun=MEAN_NEGQUAD, outwarp=2)
    opts = TrainOptions(ns_samples=0, ninit=64, nopts=1, lbfgs_iters=40,
                        outwarp_delta=20.0, outwarp_thresh_base=20.0)
    key = jax.random.PRNGKey(0)
    gp, info = train_gp(key, cfg, X, y, None, np.full(D, -3.0),
                        np.full(D, 3.0), opts)
    assert np.all(np.isfinite(info["hyp_map"]))
    Xs = rng.uniform(-1, 1, size=(8, D))
    fbar, vtot, _, _ = gp_predict(cfg, gp, jnp.asarray(Xs))
    y_true = -0.5 * np.sum(Xs ** 2, 1) * 6.0
    assert np.all(np.isfinite(np.asarray(fbar)))
    # Mean prediction should track the target in the high region.
    assert float(np.mean(np.abs(np.asarray(fbar) - y_true))) < 1.0


@pytest.mark.parametrize("meanname", ["negquadse", "negquadonly",
                                      "negquadlinonly"])
def test_extra_meanfun_quadrature_matches_mc(meanname, rng):
    """gplogjoint_I for the extra mean functions (ids 8/16/20, cf.
    `gplite_meanfun.m:456-480,524-550`) must match MC integration of the
    GP posterior mean."""
    from vbmc_tpu.elbo import gplogjoint_I
    from vbmc_tpu.main import _MEANFUN_IDS
    from vbmc_tpu.gp.means import mean_info
    D = 2
    N = 16
    X = rng.standard_normal((N, D)) * 1.5
    y = -0.4 * np.sum(X ** 2, 1) + 0.5 + 0.05 * rng.standard_normal(N)
    cfg = GPConfig(D=D, meanfun=_MEANFUN_IDS[meanname])
    minfo = mean_info(cfg, X, y)
    hyp_mean = np.where(np.isfinite(minfo["x0"]), minfo["x0"], 0.0)
    hyp = np.concatenate([np.zeros(D), [0.0], [np.log(0.1)], hyp_mean])
    assert hyp.size == cfg.nhyp
    gp = gp_from_host(cfg, X, y, None, hyp[None, :], 16, 1)

    mu = jnp.asarray(rng.standard_normal((2, D)) * 0.4)
    sigma = jnp.asarray(np.array([0.4, 0.7]))
    lam = jnp.asarray(np.array([1.0, 0.8]))
    I = np.asarray(gplogjoint_I(cfg, gp, mu, sigma, lam))[0]

    n_mc = 300000
    for k in range(2):
        xs = (np.asarray(mu)[k] + np.asarray(sigma)[k] * np.asarray(lam)
              * rng.standard_normal((n_mc, D)))
        fbar, _, _, _ = gp_predict(cfg, gp, jnp.asarray(xs))
        mc = float(np.mean(np.asarray(fbar)))
        se = float(np.std(np.asarray(fbar)) / np.sqrt(n_mc))
        assert abs(I[k] - mc) < max(6 * se, 5e-3), (meanname, k, I[k], mc)

    # nlZ must be finite and differentiable for the full hyp vector.
    mask = jnp.ones(N, dtype=bool)
    g = jax.grad(lambda h: core.neg_log_marginal_likelihood(
        cfg, h, jnp.asarray(X), jnp.asarray(y), jnp.zeros(N), mask))(
        jnp.asarray(hyp))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_acquisition_bandwidth_smoothing(rng):
    """evaluate_acquisition with smoothing: delta -> 0 approaches the
    unsmoothed sweep; a short vbmc run with bandwidth > 0 stays sane."""
    from vbmc_tpu.acquisitions import evaluate_acquisition, AcqState
    from vbmc_tpu.vp import make_vp
    from vbmc_tpu.transforms import create_trinfo
    D, n, S, K, M = 2, 20, 2, 4, 64
    cfg = GPConfig(D=D)
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum(X ** 2, 1)
    hyps = np.zeros((S, cfg.nhyp))
    hyps[:, cfg.ncov] = np.log(0.05)
    hyps[:, cfg.ncov + cfg.nnoise + 1 + D:] = np.log(1.2)
    gp = gp_from_host(cfg, X, y, None, hyps, 32, S)
    trinfo = create_trinfo([-np.inf] * D, [np.inf] * D, [-2.0] * D,
                           [2.0] * D)
    w = rng.random(K) + 0.3
    vp = make_vp(trinfo, rng.uniform(-1, 1, (K, D)),
                 0.4 + 0.2 * rng.random(K), np.ones(D), w=w / w.sum(),
                 k_max=8)
    Xs = jnp.asarray(rng.uniform(-2, 2, (M, D)))
    dtype = gp.X.dtype
    state = AcqState(
        ymax=jnp.asarray(0.0, dtype=dtype),
        tol_var=jnp.asarray(1e-4, dtype=dtype),
        lb_eps_orig=jnp.full((D,), -jnp.inf, dtype=dtype),
        ub_eps_orig=jnp.full((D,), jnp.inf, dtype=dtype),
        gp_length_scale=jnp.ones(D, dtype=dtype),
        var_log_joint=jnp.ones(S, dtype=dtype),
        regularize=jnp.asarray(True),
        delta=jnp.full(D, 1e-6, dtype=dtype))
    plain = np.asarray(evaluate_acquisition(cfg, "prospective", Xs, vp, gp,
                                            state))
    smoothed = np.asarray(evaluate_acquisition(cfg, "prospective", Xs, vp,
                                               gp, state, smooth=True))
    np.testing.assert_allclose(smoothed, plain, rtol=5e-3, atol=1e-12)

    from vbmc_tpu import vbmc, VBMCOptions
    sd = np.array([1.0, 0.8])

    def logp(x):
        return float(-0.5 * np.sum((x / sd) ** 2) - np.log(2 * np.pi)
                     - np.sum(np.log(sd)))

    opts = VBMCOptions(display="off", max_fun_evals=40, seed=6,
                       min_final_components=10, bandwidth=0.01)
    res = vbmc(logp, x0=np.zeros(2), plb=np.full(2, -3.0),
               pub=np.full(2, 3.0), options=opts)
    assert np.isfinite(res.elbo) and abs(res.elbo) < 1.0


@pytest.mark.slow
def test_vbmc_run_with_intmean(rng):
    """End-to-end smoke: a short VBMC run with the integrated linear mean
    enabled still recovers a 2-D Gaussian."""
    from vbmc_tpu import vbmc, VBMCOptions

    sd = np.array([1.0, 0.8])

    def logp(x):
        return float(-0.5 * np.sum((x / sd) ** 2) - np.log(2 * np.pi)
                     - np.sum(np.log(sd)))

    opts = VBMCOptions(display="off", max_fun_evals=40, seed=5,
                       min_final_components=10, gp_int_mean_fun=1)
    res = vbmc(logp, x0=np.zeros(2), plb=np.full(2, -3.0),
               pub=np.full(2, 3.0), options=opts)
    assert np.isfinite(res.elbo)
    assert abs(res.elbo) < 1.0
