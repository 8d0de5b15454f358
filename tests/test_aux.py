"""Auxiliary subsystem tests: serialization round-trip, samplers, kmeans,
IBS estimator, hedging, priors sampling, KDE normalization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.transforms import create_trinfo
from vbmc_tpu.vp import make_vp, vp_pdf


def test_vp_serialization_roundtrip(tmp_path, rng):
    from vbmc_tpu.serialize import save_vp, load_vp
    D = 3
    ti = create_trinfo([0.0] * D, [5.0] * D, [1.0] * D, [4.0] * D)
    vp = make_vp(ti, rng.uniform(-1, 1, (4, D)), 0.4, np.ones(D), k_max=8)
    p = str(tmp_path / "vp.npz")
    save_vp(p, vp, metadata={"note": "test"})
    vp2, meta = load_vp(p)
    assert meta["note"] == "test"
    X = rng.uniform(0.5, 4.5, (20, D))
    np.testing.assert_allclose(np.asarray(vp_pdf(vp, jnp.asarray(X))),
                               np.asarray(vp_pdf(vp2, jnp.asarray(X))),
                               rtol=1e-12)


def test_mala_samples_gaussian(rng):
    from vbmc_tpu.samplers.mala import mala_sample

    def lp_grad(x):
        lp = -0.5 * jnp.sum(x ** 2)
        return lp, -x

    samples, _, step = mala_sample(jax.random.PRNGKey(0), lp_grad,
                                   jnp.zeros(2), 4000, step0=0.5, burn=500)
    s = np.asarray(samples)
    assert abs(s.mean()) < 0.1
    assert abs(s.std() - 1.0) < 0.12


def test_ensemble_slice_samples_gaussian(rng):
    from vbmc_tpu.samplers.ensemble import ensemble_slice_sample

    def lp(x):
        return -0.5 * jnp.sum(x ** 2)

    D, W = 2, 8
    x0s = jnp.asarray(rng.standard_normal((W, D)))
    lo = jnp.full(D, -20.0)
    hi = jnp.full(D, 20.0)
    walkers, _ = ensemble_slice_sample(jax.random.PRNGKey(1), lp, x0s, lo,
                                       hi, n_steps=400)
    s = np.asarray(walkers)[100:].reshape(-1, D)
    assert abs(s.mean()) < 0.1
    assert abs(s.std() - 1.0) < 0.12


def test_kmeans(rng):
    from vbmc_tpu.utils.kmeans import kmeans
    centers_true = np.array([[0.0, 0.0], [5.0, 5.0], [-5.0, 5.0]])
    X = np.concatenate([c + 0.3 * rng.standard_normal((50, 2))
                        for c in centers_true])
    centers, assign = kmeans(X, 3, seed=1)
    d = np.sort([np.min(np.sum((centers - c) ** 2, 1))
                 for c in centers_true])
    assert d[-1] < 0.1
    assert len(np.unique(assign)) == 3


def test_ibs_unbiased():
    from vbmc_tpu.utils.ibs import ibs_loglike
    p_true = 0.3
    rng = np.random.default_rng(0)
    responses = (rng.random(50) < p_true).astype(int)

    def sim(params, stimuli, r):
        return (r.random(len(np.atleast_1d(stimuli))) < params[0]).astype(int)

    lls = []
    for i in range(60):
        ll, var = ibs_loglike(sim, [p_true], responses,
                              rng=np.random.default_rng(100 + i))
        lls.append(ll)
    exact = np.sum(np.where(responses == 1, np.log(p_true),
                            np.log(1 - p_true)))
    se = np.std(lls) / np.sqrt(len(lls))
    assert abs(np.mean(lls) - exact) < 4 * se + 1.0


def test_hedge_prefers_rewarded_arm(rng):
    from vbmc_tpu.hedge import AcqHedge
    h = AcqHedge(names=["a", "b"], beta=2.0)
    for _ in range(20):
        name = h.choose(rng)
        h.update(1.0 if name == "a" else 0.0)
    counts = {"a": 0, "b": 0}
    for _ in range(200):
        counts[h.choose(rng)] += 1
        h.update(1.0 if h.names[h.chosen] == "a" else 0.0)
    assert counts["a"] > counts["b"]


def test_gp_quad_matches_mc(rng):
    from vbmc_tpu.gp import GPConfig
    from vbmc_tpu.gp.gp import gp_from_host
    from vbmc_tpu.gp.quad import gp_quad
    from vbmc_tpu.gp.predict import gp_predict_full

    D, n = 2, 30
    cfg = GPConfig(D=D)
    X = rng.uniform(-2, 2, (n, D))
    y = np.sin(X[:, 0]) + np.cos(X[:, 1])
    hyp = np.zeros((1, cfg.nhyp))
    hyp[0, :D] = np.log(0.8)
    hyp[0, cfg.ncov] = np.log(0.05)
    hyp[0, cfg.ncov + cfg.nnoise + 1 + D:] = np.log(1.3)
    gp = gp_from_host(cfg, X, y, None, hyp, n_bucket=32, s_bucket=1)

    Xstar = np.array([[0.3, -0.4]])
    delta = jnp.asarray([0.3, 0.2])
    fmu_q, fs2_q = gp_quad(cfg, gp, jnp.asarray(Xstar), delta)
    # MC check of the smoothed mean.
    eps = rng.standard_normal((20000, D)) * np.asarray(delta)
    fmu_mc, _ = gp_predict_full(cfg, gp, jnp.asarray(Xstar + eps))
    np.testing.assert_allclose(float(fmu_q[0, 0]),
                               float(jnp.mean(fmu_mc[0])), atol=0.02)
    assert float(fs2_q[0, 0]) >= 0


def test_gp_sample_and_fmin(rng):
    from vbmc_tpu.gp import GPConfig
    from vbmc_tpu.gp.gp import gp_from_host
    from vbmc_tpu.gp.sample import gp_sample, gp_fmin

    D, n = 2, 40
    cfg = GPConfig(D=D)
    X = rng.uniform(-3, 3, (n, D))
    y = -0.5 * np.sum((X - 0.5) ** 2, 1)
    hyp = np.zeros((2, cfg.nhyp))
    hyp[:, :D] = np.log(1.0)
    hyp[:, cfg.ncov] = np.log(0.05)
    hyp[:, cfg.ncov + cfg.nnoise + 1 + D:] = np.log(1.5)
    gp = gp_from_host(cfg, X, y, None, hyp, n_bucket=64, s_bucket=2)

    S = gp_sample(cfg, gp, 500, key=jax.random.PRNGKey(0))
    assert S.shape == (500, D)
    assert np.all(np.isfinite(S))
    # Samples from exp(GP mean) concentrate near the mode (0.5, 0.5).
    assert np.linalg.norm(S.mean(0) - 0.5) < 0.5

    x_opt, f_opt = gp_fmin(cfg, gp, maximize=True)
    assert np.linalg.norm(x_opt - 0.5) < 0.3


def test_cmaes_minimizes_ill_conditioned_quadratic(rng):
    """CMA-ES with active update (reference runs CMA.active=1,
    `setupoptions_vbmc.m:176`) on a rotated ill-conditioned quadratic."""
    import jax
    import jax.numpy as jnp
    from vbmc_tpu.samplers.cmaes import cmaes_minimize

    D = 4
    A = rng.standard_normal((D, D))
    Q, _ = np.linalg.qr(A)
    scales = np.array([10.0, 3.0, 1.0, 0.3])
    H = jnp.asarray(Q @ np.diag(1.0 / scales ** 2) @ Q.T)
    x_opt = jnp.asarray(rng.uniform(-1, 1, D))

    def f_batch(xs):
        d = xs - x_opt[None, :]
        return jnp.einsum("nd,de,ne->n", d, H, d)

    res = cmaes_minimize(jax.random.PRNGKey(0), f_batch,
                         x0=jnp.zeros(D), sigma0=jnp.ones(D),
                         lb=jnp.full(D, -20.0), ub=jnp.full(D, 20.0),
                         max_evals=3000, popsize=16)
    assert float(res.f_best) < 1e-5, float(res.f_best)
    np.testing.assert_allclose(np.asarray(res.x_best), np.asarray(x_opt),
                               atol=2e-2)
