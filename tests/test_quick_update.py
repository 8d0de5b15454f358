"""The fused per-point full update (`quick_update.py`): one device program
re-training the GP (warm slice chains) and re-fitting the VP (jitter sieve
+ Adam) after an acquired point, with no blocking pulls — the replacement
for the reference's per-point gptrain+vpoptimize chain
(`activesample_vbmc.m:429-490`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.gp.config import GPConfig
from vbmc_tpu.gp.fit import train_gp, TrainOptions
from vbmc_tpu.function_logger import FunctionLogger
from vbmc_tpu.options import VBMCOptions
from vbmc_tpu.quick_update import QuickUpdater
from vbmc_tpu.transforms import create_trinfo
from vbmc_tpu.vp import make_vp
from vbmc_tpu.utils.hostcache import to_np
from vbmc_tpu.elbo import gplogjoint


def _setup(rng, n0=20):
    D = 2
    sd = np.array([1.0, 0.7])
    ti = create_trinfo([-np.inf] * D, [np.inf] * D, [-3.0] * D, [3.0] * D)

    def noisy(x):
        y = float(-0.5 * np.sum((np.asarray(x) / sd) ** 2))
        return y + 0.5 * rng.standard_normal(), 0.5

    logger = FunctionLogger(noisy, D, ti, uncertainty_level=2)
    for _ in range(n0):
        logger.evaluate(rng.uniform(-2, 2, D))

    cfg = GPConfig(D=D, user_noise=1)
    opts = VBMCOptions(display="off").resolve(D)
    topts = TrainOptions(ns_samples=4, ninit=64, nopts=1, thin=2,
                         n_chains=2, lbfgs_iters=20)
    X, y, s2 = logger.training_data()
    gp, _ = train_gp(jax.random.PRNGKey(0), cfg, X, y, s2,
                     np.full(D, -3.0), np.full(D, 3.0), topts, host_seed=1)
    vp = make_vp(ti, rng.uniform(-1, 1, (3, D)), 0.5, np.ones(D), k_max=4)
    return cfg, opts, topts, logger, gp, vp


def test_quick_updater_full(rng):
    cfg, opts, topts, logger, gp, vp = _setup(rng)
    qu = QuickUpdater(cfg, opts, topts, np.full(2, -3.0), np.full(2, 3.0),
                      warmup=True, entropy_switch=False, K=3,
                      do_gp=True, do_vp=True)
    # Acquire one more point, then update.
    logger.evaluate(np.array([0.3, -0.2]))
    gp2, vp2, gls = qu(jax.random.PRNGKey(5), logger, gp, vp)

    # New GP carries the grown training set and fresh hyp samples.
    assert int(np.sum(np.asarray(to_np(gp2.mask)))) == logger.n_train
    assert int(np.sum(np.asarray(to_np(gp2.hyp_mask)))) == 4
    assert np.all(np.isfinite(np.asarray(gls))) and np.all(
        np.asarray(gls) > 0)

    # The refit VP is valid and strictly improves the ELBO against the
    # new GP relative to the un-refit VP (the whole point of the update).
    w2 = np.asarray(vp2.w)
    assert np.isclose(w2.sum(), 1.0, atol=1e-5)
    assert np.all(np.asarray(vp2.sigma) > 0)

    def elbo_of(v):
        G, _, _, _, _ = gplogjoint(cfg, gp2, v.mu, v.sigma, v.lam, v.w,
                                   v.kmask, compute_var=0)
        return float(G)

    # E_q[f] of the refit vp should not be catastrophically worse; typically
    # better since vp was random. (Entropy omitted: G is the data-coupled
    # term the refit moves most.)
    assert elbo_of(vp2) > elbo_of(vp) - 1.0


def test_quick_updater_gp_only(rng):
    cfg, opts, topts, logger, gp, vp = _setup(rng)
    qu = QuickUpdater(cfg, opts, topts, np.full(2, -3.0), np.full(2, 3.0),
                      warmup=True, entropy_switch=False, K=3,
                      do_gp=True, do_vp=False)
    logger.evaluate(np.array([0.1, 0.4]))
    gp2, vp2, _ = qu(jax.random.PRNGKey(6), logger, gp, vp)
    # VP untouched when do_vp=False.
    np.testing.assert_array_equal(np.asarray(vp2.mu), np.asarray(vp.mu))
    assert int(np.sum(np.asarray(to_np(gp2.mask)))) == logger.n_train
