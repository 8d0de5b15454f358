"""Variational optimization integration test: fit a mixture to a GP trained
on an analytic Gaussian target; the ELBO must recover the log normalizer and
the moments must match the target."""

import numpy as np
import jax
import jax.numpy as jnp

from vbmc_tpu.gp import GPConfig, train_gp, TrainOptions
from vbmc_tpu.options import VBMCOptions
from vbmc_tpu.transforms import create_trinfo
from vbmc_tpu.vp import make_vp, vp_moments
from vbmc_tpu.vpoptim import vpoptimize
from vbmc_tpu.utils.math import bucket_k


def test_vpoptimize_recovers_gaussian_evidence(rng):
    D = 2
    lnZ = 2.7
    sd = np.array([1.0, 0.5])

    def logp(x):
        return (-0.5 * np.sum((x / sd) ** 2, -1)
                - 0.5 * D * np.log(2 * np.pi) - np.sum(np.log(sd)) + lnZ)

    # Training set spread around the mode.
    X = rng.standard_normal((50, D)) * 1.5
    y = logp(X)

    cfg = GPConfig(D=D)
    key = jax.random.PRNGKey(5)
    gp, _ = train_gp(key, cfg, X, y, None, plb_tr=np.full(D, -2.0),
                     pub_tr=np.full(D, 2.0),
                     opts=TrainOptions(ns_samples=8, ninit=256, nopts=2,
                                       thin=2))

    trinfo = create_trinfo([-np.inf] * D, [np.inf] * D,
                           [-2.0] * D, [2.0] * D)
    K = 2
    vp0 = make_vp(trinfo, mu=np.zeros((K, D)) + 0.1 * rng.standard_normal((K, D)),
                  sigma=0.5, lam=np.ones(D), k_max=bucket_k(K))

    options = VBMCOptions().resolve(D)
    res = vpoptimize(jax.random.PRNGKey(1), cfg, vp0, gp, K, options,
                     warmup=False, entropy_switch=False,
                     n_fast_opts=options.evalopt("ns_elbo", K),
                     n_slow_opts=2)

    assert abs(res.elbo - lnZ) < 0.2, (res.elbo, lnZ)
    assert res.elbo_sd < 0.5

    mean, cov = vp_moments(res.vp, orig_flag=False)
    np.testing.assert_allclose(np.asarray(mean), np.zeros(D), atol=0.15)
    np.testing.assert_allclose(np.diag(np.asarray(cov)), sd ** 2, rtol=0.35)


def test_vpoptimize_stochastic_entropy_path(rng):
    D = 2
    sd = np.array([0.8, 1.2])

    def logp(x):
        return (-0.5 * np.sum((x / sd) ** 2, -1)
                - 0.5 * D * np.log(2 * np.pi) - np.sum(np.log(sd)))

    X = rng.standard_normal((40, D)) * 1.5
    y = logp(X)
    cfg = GPConfig(D=D)
    gp, _ = train_gp(jax.random.PRNGKey(2), cfg, X, y, None,
                     np.full(D, -2.0), np.full(D, 2.0),
                     TrainOptions(ns_samples=4, ninit=128, nopts=1, thin=2))

    trinfo = create_trinfo([-np.inf] * D, [np.inf] * D, [-2.0] * D, [2.0] * D)
    K = 2
    vp0 = make_vp(trinfo, mu=0.1 * rng.standard_normal((K, D)), sigma=0.5,
                  lam=np.ones(D), k_max=bucket_k(K))
    options = VBMCOptions(max_iter_stochastic=200).resolve(D)
    res = vpoptimize(jax.random.PRNGKey(3), cfg, vp0, gp, K, options,
                     warmup=False, entropy_switch=False,
                     n_fast_opts=50, n_slow_opts=1,
                     n_ent=64 * K)  # force MC-entropy path
    assert abs(res.elbo) < 0.3, res.elbo
    assert np.isfinite(res.elbo_sd)


def test_vpoptimize_prunes_redundant_components(rng):
    """Weight pruning (`vpoptimize_vbmc.m:156-186`, batched here): fitting a
    unimodal Gaussian with K=6 components must prune low-weight components
    without hurting the ELBO."""
    D = 2
    lnZ = 1.3
    sd = np.array([0.9, 0.7])

    def logp(x):
        return (-0.5 * np.sum((x / sd) ** 2, -1)
                - 0.5 * D * np.log(2 * np.pi) - np.sum(np.log(sd)) + lnZ)

    X = rng.standard_normal((60, D)) * 1.5
    y = logp(X)
    cfg = GPConfig(D=D)
    gp, _ = train_gp(jax.random.PRNGKey(9), cfg, X, y, None,
                     plb_tr=np.full(D, -2.0), pub_tr=np.full(D, 2.0),
                     opts=TrainOptions(ns_samples=0, ninit=256, nopts=2))

    trinfo = create_trinfo([-np.inf] * D, [np.inf] * D,
                           [-2.0] * D, [2.0] * D)
    K = 6
    vp0 = make_vp(trinfo, mu=0.3 * rng.standard_normal((K, D)),
                  sigma=0.5, lam=np.ones(D), k_max=bucket_k(K))
    options = VBMCOptions().resolve(D)
    res = vpoptimize(jax.random.PRNGKey(2), cfg, vp0, gp, K, options,
                     warmup=False, entropy_switch=False,
                     n_fast_opts=options.evalopt("ns_elbo", K),
                     n_slow_opts=1)
    K_after = int(np.sum(np.asarray(res.vp.kmask)))
    assert K_after == K - res.pruned
    assert abs(res.elbo - lnZ) < 0.25, (res.elbo, lnZ, res.pruned)
    # Active weights renormalized; pruned components zeroed.
    w = np.asarray(res.vp.w)
    km = np.asarray(res.vp.kmask)
    assert abs(w[km].sum() - 1.0) < 1e-8
    assert np.all(w[~km] == 0.0)
