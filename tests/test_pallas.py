"""Pallas fused-acquisition kernel vs the XLA reference implementation
(interpret mode on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.gp import GPConfig
from vbmc_tpu.gp.gp import gp_from_host
from vbmc_tpu.vp import make_vp
from vbmc_tpu.transforms import create_trinfo
from vbmc_tpu.acquisitions import evaluate_acquisition, AcqState
from vbmc_tpu.pallas_kernels import fused_prospective_acq


def test_fused_acq_matches_xla(rng):
    D, n, S, K, M = 3, 40, 4, 6, 512
    cfg = GPConfig(D=D)
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum(X ** 2, 1)
    hyps = np.zeros((S, cfg.nhyp))
    hyps[:, :D] = np.log(0.8) + 0.05 * rng.standard_normal((S, D))
    hyps[:, D] = 0.1 * rng.standard_normal(S)
    hyps[:, cfg.ncov] = np.log(0.05)
    hyps[:, cfg.ncov + cfg.nnoise] = 0.3
    hyps[:, cfg.ncov + cfg.nnoise + 1 + D:] = np.log(1.2)
    gp = gp_from_host(cfg, X, y, None, hyps, n_bucket=64, s_bucket=S)

    trinfo = create_trinfo([-np.inf] * D, [np.inf] * D, [-2.0] * D,
                           [2.0] * D)
    w = rng.random(K) + 0.3
    vp = make_vp(trinfo, rng.uniform(-1, 1, (K, D)),
                 0.4 + 0.2 * rng.random(K), np.ones(D), w=w / w.sum(),
                 k_max=8)

    Xs = jnp.asarray(rng.uniform(-2.5, 2.5, (M, D)))
    dtype = gp.X.dtype
    state = AcqState(
        ymax=jnp.asarray(0.7, dtype=dtype),
        tol_var=jnp.asarray(1e-4, dtype=dtype),
        lb_eps_orig=jnp.full((D,), -jnp.inf, dtype=dtype),
        ub_eps_orig=jnp.full((D,), jnp.inf, dtype=dtype),
        gp_length_scale=jnp.ones(D, dtype=dtype),
        var_log_joint=jnp.ones(S, dtype=dtype),
        regularize=jnp.asarray(True))

    ref = np.asarray(evaluate_acquisition(cfg, "prospective", Xs, vp, gp,
                                          state))
    got = np.asarray(fused_prospective_acq(cfg, Xs, gp, vp, 0.7, 1e-4,
                                           interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-12)
    # Same winner matters most.
    assert int(np.argmin(got)) == int(np.argmin(ref))

    # The sweep dispatcher must agree with the XLA path (on CPU it falls
    # back to it; on TPU it routes to the fused kernel).
    from vbmc_tpu.acquisitions import sweep_acquisition
    via_dispatch = np.asarray(sweep_acquisition(cfg, "prospective", Xs, vp,
                                                gp, state))
    np.testing.assert_allclose(via_dispatch, ref, rtol=1e-6)


def test_fused_viqr_matches_xla(rng):
    from vbmc_tpu.active_is import (build_is_state_core,
                                    evaluate_is_acquisition)
    from vbmc_tpu.pallas_kernels import fused_viqr_acq

    D, n, S, K, M = 2, 30, 4, 5, 512
    cfg = GPConfig(D=D, user_noise=1)
    X = rng.uniform(-2, 2, (n, D))
    y = -0.5 * np.sum(X ** 2, 1) + 0.2 * rng.standard_normal(n)
    s2 = np.full(n, 0.25)
    hyps = np.zeros((S, cfg.nhyp))
    hyps[:, :D] = np.log(0.8) + 0.05 * rng.standard_normal((S, D))
    hyps[:, D] = 0.1 * rng.standard_normal(S)
    hyps[:, cfg.ncov] = np.log(0.1)
    hyps[:, cfg.ncov + 1] = 0.0                     # user-noise multiplier
    hyps[:, cfg.ncov + cfg.nnoise] = 0.3
    hyps[:, cfg.ncov + cfg.nnoise + 1 + D:] = np.log(1.2)
    gp = gp_from_host(cfg, X, y, s2, hyps, n_bucket=32, s_bucket=S)

    trinfo = create_trinfo([-np.inf] * D, [np.inf] * D, [-2.0] * D,
                           [2.0] * D)
    w = rng.random(K) + 0.3
    vp = make_vp(trinfo, rng.uniform(-1, 1, (K, D)),
                 0.4 + 0.2 * rng.random(K), np.ones(D), w=w / w.sum(),
                 k_max=8)

    key = jax.random.PRNGKey(3)
    ais = build_is_state_core(key, cfg, "viqr", vp, gp, 40, 24, 40,
                              mh_steps=2, fess_thresh=0.9)

    Xs = jnp.asarray(rng.uniform(-2.5, 2.5, (M, D)))
    dtype = gp.X.dtype
    state = AcqState(
        ymax=jnp.asarray(0.7, dtype=dtype),
        tol_var=jnp.asarray(1e-4, dtype=dtype),
        lb_eps_orig=jnp.full((D,), -jnp.inf, dtype=dtype),
        ub_eps_orig=jnp.full((D,), jnp.inf, dtype=dtype),
        gp_length_scale=jnp.ones(D, dtype=dtype),
        var_log_joint=jnp.ones(S, dtype=dtype),
        regularize=jnp.asarray(True))

    ref = np.asarray(evaluate_is_acquisition(cfg, "viqr", Xs, vp, gp,
                                             state, ais))

    # Pad the integration axis exactly as the dispatcher does.
    from vbmc_tpu.acquisitions import _nearest_noise
    Na = ais.Xa.shape[0]
    nap = -(-Na // 128) * 128
    pad = nap - Na
    Xa = jnp.concatenate([ais.Xa, jnp.zeros((pad, D), dtype=dtype)])
    lnw = jnp.concatenate([ais.ln_weights,
                           jnp.full((S, pad), -jnp.inf, dtype=dtype)],
                          axis=1)
    fs2a = jnp.concatenate([ais.f_s2, jnp.ones((S, pad), dtype=dtype)],
                           axis=1)
    invk = jnp.concatenate([ais.invKzk,
                            jnp.zeros((S, gp.n_max, pad), dtype=dtype)],
                           axis=2)
    sn2c = _nearest_noise(cfg, gp, Xs, state)
    got = np.asarray(fused_viqr_acq(cfg, Xs, gp, Xa, lnw, fs2a, invk,
                                    sn2c, 1e-4, 1.0, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-8)
    assert int(np.argmin(got)) == int(np.argmin(ref))
