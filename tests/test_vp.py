"""Posterior-query API tests: pdf normalization, sampling moments, mode,
KL/MTV metrics, power posterior (cf. `vbmc_pdf/rnd/moments/mode/kldiv/mtv/
power` in the reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vbmc_tpu.transforms import create_trinfo
from vbmc_tpu.vp import (make_vp, vp_pdf, vp_rnd, vp_moments, vp_mode,
                         vp_kldiv, vp_mtv, vp_power, is_valid_vp)


def _mk_vp(rng, D=2, K=3, bounded=False, k_max=4):
    if bounded:
        ti = create_trinfo([0.0] * D, [10.0] * D, [1.0] * D, [6.0] * D)
        mu_t = rng.uniform(-0.5, 0.5, (K, D))
    else:
        ti = create_trinfo([-np.inf] * D, [np.inf] * D, [-3.0] * D, [3.0] * D)
        mu_t = rng.uniform(-1, 1, (K, D))
    w = rng.random(K) + 0.2
    return make_vp(ti, mu_t, sigma=0.4 + 0.2 * rng.random(K),
                   lam=np.ones(D), w=w / w.sum(), k_max=k_max)


@pytest.mark.parametrize("bounded", [False, True])
def test_pdf_normalization(bounded, rng):
    vp = _mk_vp(rng, D=2, bounded=bounded)
    # Integrate the original-space pdf on a grid.
    if bounded:
        n_g = 400
        g = np.linspace(1e-3, 10 - 1e-3, n_g)
    else:
        # Type-0 dims recenter by the plausible box (delta = 6), so the
        # original-space spread is ~6x the transformed one.
        n_g = 800
        g = np.linspace(-25, 25, n_g)
    XX, YY = np.meshgrid(g, g)
    pts = np.stack([XX.ravel(), YY.ravel()], 1)
    p = np.asarray(vp_pdf(vp, jnp.asarray(pts), orig_flag=True))
    integral = np.trapezoid(np.trapezoid(p.reshape(n_g, n_g), g, axis=1), g)
    np.testing.assert_allclose(integral, 1.0, rtol=2e-3)


def test_rnd_matches_moments(rng):
    vp = _mk_vp(rng, D=3, bounded=False)
    key = jax.random.PRNGKey(0)
    X = np.asarray(vp_rnd(vp, key, 200000, orig_flag=False,
                          balance_flag=True))
    mean_a, cov_a = vp_moments(vp, orig_flag=False)
    np.testing.assert_allclose(X.mean(0), np.asarray(mean_a), atol=0.02)
    np.testing.assert_allclose(np.cov(X.T), np.asarray(cov_a), atol=0.03)


def test_mode_single_gaussian(rng):
    D = 2
    ti = create_trinfo([-np.inf] * D, [np.inf] * D, [-3.0] * D, [3.0] * D)
    vp = make_vp(ti, mu=np.array([[0.7, -0.4]]), sigma=0.5, lam=np.ones(D),
                 k_max=4)
    # make_vp takes transformed-space means; the affine recentering from the
    # plausible box has delta = 6, so the original-space mode is 6x.
    mode = np.asarray(vp_mode(vp, orig_flag=True))
    np.testing.assert_allclose(mode, [4.2, -2.4], atol=1e-4)
    mode_t = np.asarray(vp_mode(vp, orig_flag=False))
    np.testing.assert_allclose(mode_t, [0.7, -0.4], atol=1e-4)


def test_kldiv_identical_and_shifted(rng):
    vp1 = _mk_vp(rng, D=2)
    # Moments are MC-estimated in original space, so "identical" is only
    # identical up to Monte-Carlo error.
    kl_same = np.asarray(vp_kldiv(vp1, vp1, gauss_flag=True))
    assert np.all(kl_same < 1e-3)
    vp2 = vp1._replace(mu=vp1.mu + 2.0)
    kl_diff = np.asarray(vp_kldiv(vp1, vp2, gauss_flag=True))
    assert np.all(kl_diff > 0.5)
    kl_mc = np.asarray(vp_kldiv(vp1, vp2, gauss_flag=False,
                                n_samples=20000))
    assert np.all(kl_mc > 0.3)


def test_mtv(rng):
    vp1 = _mk_vp(rng, D=2)
    mtv_same = np.asarray(vp_mtv(vp1, vp1, n_samples=20000))
    assert np.all(mtv_same < 0.05)
    vp2 = vp1._replace(mu=vp1.mu + 5.0)
    mtv_diff = np.asarray(vp_mtv(vp1, vp2, n_samples=20000))
    assert np.all(mtv_diff > 0.8)


def test_power_posterior_squares_density(rng):
    D = 1
    ti = create_trinfo([-np.inf] * D, [np.inf] * D, [-3.0] * D, [3.0] * D)
    vp = make_vp(ti, mu=np.array([[0.0], [1.5]]), sigma=[0.6, 0.4],
                 lam=np.ones(D), w=[0.6, 0.4], k_max=4)
    vp2 = vp_power(vp, n=2)
    g = np.linspace(-5, 6, 2001)[:, None]
    p1 = np.asarray(vp_pdf(vp, jnp.asarray(g), orig_flag=False))
    p2 = np.asarray(vp_pdf(vp2, jnp.asarray(g), orig_flag=False))
    z = np.trapezoid(p1 ** 2, g[:, 0])
    np.testing.assert_allclose(p2, p1 ** 2 / z, rtol=1e-3, atol=1e-8)


def test_is_valid_vp(rng):
    assert is_valid_vp(_mk_vp(rng))
    assert not is_valid_vp({"w": 1})


def test_priors_normalized():
    from vbmc_tpu import priors
    g = np.linspace(-5, 15, 4001)[:, None]
    for name, lp in [
        ("unifbox", priors.unifbox_logpdf(jnp.asarray(g), 1.0, 9.0)),
        ("trapez", priors.trapez_logpdf(jnp.asarray(g), 0.0, 2.0, 6.0, 10.0)),
        ("smoothbox", priors.smoothbox_logpdf(jnp.asarray(g), 1.0, 8.0, 0.5)),
        ("splinetrapez", priors.splinetrapez_logpdf(jnp.asarray(g), 0.0, 2.0,
                                                    6.0, 10.0)),
    ]:
        p = np.exp(np.asarray(lp))
        z = np.trapezoid(p, g[:, 0])
        np.testing.assert_allclose(z, 1.0, rtol=5e-3, err_msg=name)
