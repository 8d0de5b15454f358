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

    opts = VBMCOptions(display="off", max_fun_evals=60, seed=1,
                       min_final_components=20)
    res = vbmc(logp, x0=np.zeros(D), plb=np.full(D, -3.0),
               pub=np.full(D, 3.0), options=opts)
    assert res.func_count <= 62
    _check(res, lnz, mu_true)


def test_halfnormal_2d_constrained():
    # Product of half-normals on [0, inf)^2 boxed to [0, 10]: lnZ ~= log(1/4).
    D = 2
    sd = np.array([1.0, 0.6])

    def logp(x):
        return (-0.5 * np.sum((x / sd) ** 2)
                - 0.5 * D * np.log(2 * np.pi) - np.sum(np.log(sd)))

    # Normalizer over the box: each dim contributes ~1/2 of the full Gaussian.
    lnz = float(np.sum(np.log(0.5)))
    mean_true = sd * np.sqrt(2 / np.pi)

    opts = VBMCOptions(display="off", max_fun_evals=80, seed=2,
                       min_final_components=20)
    res = vbmc(logp, x0=np.array([0.5, 0.5]), lb=np.zeros(D),
               ub=np.full(D, 10.0), plb=np.full(D, 0.05),
               pub=np.full(D, 3.0), options=opts)
    _check(res, lnz, mean_true)


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
