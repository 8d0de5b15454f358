"""Input-warp subsystem tests: unscented propagation, rotoscale whitening,
and density invariance of the warped variational posterior."""

import numpy as np
import jax
import jax.numpy as jnp

from vbmc_tpu.transforms import create_trinfo, direct, inverse
from vbmc_tpu.vp import make_vp, vp_pdf, vp_moments
from vbmc_tpu import warp as wp


def test_unscent_warp_affine_exact(rng):
    """For an affine map the unscented transform is exact."""
    A = np.diag([2.0, 0.5])
    b = np.array([1.0, -1.0])

    def fun(x):
        return x @ A.T + b

    x = rng.standard_normal((5, 2))
    sigma = np.abs(rng.standard_normal((5, 2))) + 0.1
    xw, sw = wp.unscent_warp(fun, x, sigma)
    np.testing.assert_allclose(xw, fun(x), rtol=1e-10)
    np.testing.assert_allclose(sw, sigma * np.diag(A)[None, :], rtol=1e-10)


def test_rotoscale_whitens_correlated_vp(rng):
    D = 2
    ti = create_trinfo([-np.inf] * D, [np.inf] * D, [-1.0] * D, [1.0] * D)
    # Correlated mixture: two components along a diagonal.
    mu = np.array([[-1.0, -1.0], [1.0, 1.0]])
    vp = make_vp(ti, mu, sigma=[0.4, 0.4], lam=np.ones(D), k_max=4)

    ti_new = wp.compute_rotoscale(vp, corr_thresh=0.0)
    assert ti_new.R_mat is not None and ti_new.scale is not None

    # The covariance of the warped vp should be ~ identity.
    from vbmc_tpu.gp import GPConfig
    cfg = GPConfig(D=D)

    class _FakeGP:
        pass

    # Build a trivial GP for warp_gp_and_vp (const-mean free).
    from vbmc_tpu.gp.gp import gp_from_host
    X = np.asarray(vp.mu)[:2] + 0.01 * rng.standard_normal((2, D))
    X = np.concatenate([X, rng.standard_normal((10, D))])
    y = -0.5 * np.sum(X ** 2, 1)
    hyp = np.zeros((1, cfg.nhyp))
    hyp[0, cfg.ncov] = np.log(0.1)
    hyp[0, cfg.ncov + cfg.nnoise + 1 + D:] = np.log(1.0)
    gp = gp_from_host(cfg, X, y, None, hyp, n_bucket=32, s_bucket=1)

    vp_w, hyp_w = wp.warp_gp_and_vp(ti_new, vp, gp, cfg)
    _, cov_w = vp_moments(vp_w, orig_flag=False)
    cov_w = np.asarray(cov_w)
    # Whitened: diagonal ~1, off-diagonal ~0 (unscented approx -> loose tol).
    np.testing.assert_allclose(np.diag(cov_w), 1.0, atol=0.35)
    assert abs(cov_w[0, 1]) < 0.3

    # Original-space density must be approximately invariant at test points.
    pts = np.asarray(vp.mu)[:2]
    pts_orig = np.asarray(inverse(ti, jnp.asarray(pts)))
    p_old = np.asarray(vp_pdf(vp, jnp.asarray(pts_orig), orig_flag=True))
    p_new = np.asarray(vp_pdf(vp_w, jnp.asarray(pts_orig), orig_flag=True))
    np.testing.assert_allclose(p_new, p_old, rtol=0.5)


def test_remap_search_box(rng):
    D = 2
    ti_old = create_trinfo([-np.inf] * D, [np.inf] * D, [-1.0] * D,
                           [1.0] * D)
    Q, _ = np.linalg.qr(rng.standard_normal((D, D)))
    ti_new = ti_old._replace(R_mat=jnp.asarray(Q),
                             scale=jnp.asarray([1.5, 0.5]))
    lb = np.array([-3.0, -2.0])
    ub = np.array([3.0, 2.0])
    lb2, ub2 = wp.remap_search_box(ti_old, ti_new, lb, ub, seed=0)
    assert np.all(np.isfinite(lb2)) and np.all(np.isfinite(ub2))
    assert np.all(ub2 > lb2)
