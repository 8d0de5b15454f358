"""End-to-end statistical acceptance tests, modeled on the reference
self-test (`test/runtest_vbmc.m`): full VBMC runs against analytic targets
with known log-normalizer and moments. Pass criteria as in the reference:
|ELBO - lnZ| < 0.5 nats and RMSE(posterior mean) < 0.5."""

import numpy as np
import pytest

from vbmc_tpu import vbmc, VBMCOptions, vp_moments


def _check(result, lnz_true, mean_true, tol_elbo=0.5, tol_mean=0.5):
    err_elbo = abs(result.elbo - lnz_true)
    mean, _ = vp_moments(result.vp, orig_flag=True, n_samples=10 ** 5)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - mean_true) ** 2)))
    assert err_elbo < tol_elbo, (result.elbo, lnz_true)
    assert rmse < tol_mean, (np.asarray(mean), mean_true)
    return err_elbo, rmse


def test_mvn_2d_unconstrained():
    D = 2
    sd = np.array([1.0, 0.8])
    mu_true = np.array([0.5, -0.3])
    lnz = -1.3

    def logp(x):
        return (-0.5 * np.sum(((x - mu_true) / sd) ** 2)
                - 0.5 * D * np.log(2 * np.pi) - np.sum(np.log(sd)) + lnz)

    opts = VBMCOptions(display="off", max_fun_evals=45, seed=1,
                       min_final_components=10)
    res = vbmc(logp, x0=np.zeros(D), plb=np.full(D, -3.0),
               pub=np.full(D, 3.0), options=opts)
    assert res.func_count <= 47
    _check(res, lnz, mu_true)


@pytest.mark.slow
def test_halfnormal_2d_constrained():
    # Product of half-normals on [0, inf)^2 boxed to [0, 10]: lnZ ~= log(1/4).
    D = 2
    sd = np.array([1.0, 0.6])

    def logp(x):
        return (-0.5 * np.sum((x / sd) ** 2)
                - 0.5 * D * np.log(2 * np.pi) - np.sum(np.log(sd)))

    # Normalizer over the box: each dim contributes ~1/2 of the full Gaussian.
    lnz = D * float(np.log(0.5))
    mean_true = sd * np.sqrt(2 / np.pi)

    opts = VBMCOptions(display="off", max_fun_evals=80, seed=2,
                       min_final_components=20)
    res = vbmc(logp, x0=np.array([0.5, 0.5]), lb=np.zeros(D),
               ub=np.full(D, 10.0), plb=np.full(D, 0.05),
               pub=np.full(D, 3.0), options=opts)
    _check(res, lnz, mean_true)


@pytest.mark.slow
def test_noisy_halfnormal_viqr():
    """Noisy target (sigma=1 additive) with provided SD: exercises the
    VIQR acquisition, noise-aware GP, and per-point full updates
    (runtest_vbmc.m block 5)."""
    D = 2
    sd = np.array([1.0, 0.6])
    noise_rng = np.random.default_rng(7)

    def logp(x):
        y = (-0.5 * np.sum((x / sd) ** 2) - np.log(2 * np.pi)
             - np.sum(np.log(sd)))
        return float(y + noise_rng.standard_normal()), 1.0

    opts = VBMCOptions(display="off", max_fun_evals=80, seed=4,
                       min_final_components=15, specify_target_noise=True)
    res = vbmc(logp, x0=np.array([0.5, 0.5]), lb=np.zeros(D),
               ub=np.full(D, 10.0), plb=np.full(D, 0.05),
               pub=np.full(D, 3.0), options=opts)
    _check(res, float(np.log(0.25)), sd * np.sqrt(2 / np.pi))


@pytest.mark.slow
def test_correlated_cigar_rotoscale():
    """Correlated 3-D Gaussian: the rotoscale input warp must engage and
    improve the ELBO (runtest_vbmc.m blocks 3-4)."""
    D = 3
    rng0 = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng0.standard_normal((D, D)))
    cov = Q @ np.diag(np.array([2.0, 0.5, 0.1]) ** 2) @ Q.T
    prec = np.linalg.inv(cov)
    lognorm = -0.5 * D * np.log(2 * np.pi) - 0.5 * np.linalg.slogdet(cov)[1]

    def logp(x):
        return float(-0.5 * x @ prec @ x + lognorm)

    opts = VBMCOptions(display="off", max_fun_evals=100, seed=3,
                       min_final_components=20)
    res = vbmc(logp, x0=np.full(D, 0.25), plb=np.full(D, -4.0),
               pub=np.full(D, 4.0), options=opts)
    _check(res, 0.0, np.zeros(D))


@pytest.mark.slow
def test_mvn_6d():
    D = 6
    sd = np.linspace(0.6, 1.4, D)
    lnz = 1.7

    def logp(x):
        return (-0.5 * np.sum((x / sd) ** 2)
                - 0.5 * D * np.log(2 * np.pi) - np.sum(np.log(sd)) + lnz)

    opts = VBMCOptions(display="off", max_fun_evals=100, seed=3,
                       min_final_components=20)
    res = vbmc(logp, x0=np.full(D, 0.3), plb=np.full(D, -4.0),
               pub=np.full(D, 4.0), options=opts)
    _check(res, lnz, np.zeros(D))
