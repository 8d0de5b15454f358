"""Numerical oracles for the information-based acquisitions.

VIQR (`acq/acqviqr_vbmc.m:60-121`) and the kernel-integral cross-covariance
used by EIG (`misc/intkernel.m`) are validated here against independent
numpy/grid-quadrature implementations of the same math — outside the e2e
statistical gates. Also checks that the stochastic IS estimator (with and
without the fESS-gated MH refresh, `activeimportancesampling_vbmc.m:37-104`)
converges to the deterministic grid oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vbmc_tpu.gp import GPConfig
from vbmc_tpu.gp.config import MEAN_ZERO
from vbmc_tpu.gp.gp import gp_from_host
from vbmc_tpu.vp import make_vp
from vbmc_tpu.transforms import create_trinfo
from vbmc_tpu.acquisitions import AcqState
from vbmc_tpu.active_is import (ISState, build_is_state_core,
                                evaluate_is_acquisition, int_kernel, _U_IQR)

D = 1


def _setup(rng, n=10, n_hyp=2, multimodal=False):
    """Tiny exact-GP problem in D=1 with a K=2 mixture VP."""
    cfg = GPConfig(D=D, meanfun=MEAN_ZERO)
    if multimodal:
        X = np.concatenate([rng.uniform(-3.0, -1.0, (n // 2, D)),
                            rng.uniform(1.0, 3.0, (n - n // 2, D))])
    else:
        X = rng.uniform(-2.0, 2.0, (n, D))
    y = np.sin(1.5 * X[:, 0]) - 0.1 * X[:, 0] ** 2
    hyps = np.zeros((n_hyp, cfg.nhyp))
    for s in range(n_hyp):
        hyps[s, 0] = np.log(0.7) + 0.15 * s
        hyps[s, 1] = np.log(1.2) - 0.1 * s
        hyps[s, 2] = np.log(0.3)            # log sn
    gp = gp_from_host(cfg, X, y, None, hyps, n_bucket=16, s_bucket=2)

    trinfo = create_trinfo(np.full(D, -np.inf), np.full(D, np.inf),
                           np.full(D, -4.0), np.full(D, 4.0))
    if multimodal:
        mu = np.array([[-2.0], [2.0]])
    else:
        mu = np.array([[-0.5], [0.7]])
    sigma = np.array([0.6, 0.9])
    vp = make_vp(trinfo, mu, sigma, lam=np.ones(D), w=np.array([0.4, 0.6]),
                 k_max=4)
    state = AcqState(
        ymax=jnp.asarray(float(y.max())),
        tol_var=jnp.asarray(1e-30),
        lb_eps_orig=jnp.asarray(np.full(D, -np.inf)),
        ub_eps_orig=jnp.asarray(np.full(D, np.inf)),
        gp_length_scale=jnp.asarray(np.exp(hyps[:, 0]).mean(keepdims=True)),
        var_log_joint=jnp.ones(2),
        regularize=jnp.asarray(False),
        delta=jnp.zeros(D))
    return cfg, gp, vp, state, X, y, hyps


def _np_kernel(hyp, A, B):
    ell = np.exp(hyp[0])
    sf2 = np.exp(2.0 * hyp[1])
    d2 = (A[:, None, 0] - B[None, :, 0]) ** 2 / ell ** 2
    return sf2 * np.exp(-0.5 * d2)


def _np_posterior(hyp, X, y):
    K = _np_kernel(hyp, X, X)
    sn2 = np.exp(2.0 * hyp[2])
    B = K + sn2 * np.eye(len(X))
    Binv = np.linalg.inv(B)
    return Binv, sn2


def _np_vp_logq(vp, xs):
    """Mixture log-pdf in transformed space, independent numpy path."""
    mu = np.asarray(vp.mu)[np.asarray(vp.kmask)]
    sg = np.asarray(vp.sigma)[np.asarray(vp.kmask)]
    w = np.asarray(vp.w)[np.asarray(vp.kmask)]
    lam = float(np.asarray(vp.lam)[0])
    comp = np.exp(-0.5 * ((xs[:, None] - mu[None, :, 0])
                          / (sg[None, :] * lam)) ** 2) \
        / (np.sqrt(2 * np.pi) * sg[None, :] * lam)
    return np.log(comp @ w + 1e-300)


def _np_viqr_oracle(hyps, X, y, vp, Xm, grid):
    """acq(x_m) = log mean_s  E_q[ 2 sinh(u * s_post(x; x_m)) ] by
    trapezoid quadrature — the estimand of `acqviqr_vbmc.m:100-114`."""
    dx = grid[1] - grid[0]
    q = np.exp(_np_vp_logq(vp, grid))
    vals = np.zeros((len(hyps), len(Xm)))
    for s, hyp in enumerate(hyps):
        Binv, sn2 = _np_posterior(hyp, X, y)
        Kg = _np_kernel(hyp, grid[:, None], X)            # (G, N)
        kgg = np.exp(2.0 * hyp[1])
        fs2_grid = kgg - np.einsum("gn,nm,gm->g", Kg, Binv, Kg)
        Km = _np_kernel(hyp, Xm, X)                       # (M, N)
        fs2_m = kgg - np.einsum("mn,nk,mk->m", Km, Binv, Km)
        Kmg = _np_kernel(hyp, Xm, grid[:, None])          # (M, G)
        cov = Kmg - Km @ Binv @ Kg.T                      # (M, G)
        s2_post = np.maximum(
            fs2_grid[None, :] - cov ** 2 / (fs2_m + sn2)[:, None], 1e-12)
        integ = 2.0 * np.sinh(_U_IQR * np.sqrt(s2_post))  # (M, G)
        Z = np.trapz(q, dx=dx)
        vals[s] = np.trapz(q[None, :] * integ, dx=dx, axis=1) / Z
    return np.log(vals.mean(axis=0))


def test_int_kernel_vs_quadrature(rng):
    """Cov(f(x_m), \\int q f) per hyp sample vs grid quadrature of the
    posterior cross-covariance (`misc/intkernel.m:55-80`)."""
    cfg, gp, vp, state, X, y, hyps = _setup(rng)
    Xm = np.linspace(-2.5, 2.5, 7)[:, None]
    grid = np.linspace(-12.0, 12.0, 20001)
    dx = grid[1] - grid[0]
    q = np.exp(_np_vp_logq(vp, grid))

    got = np.asarray(int_kernel(cfg, gp, vp, jnp.asarray(Xm)))  # (S, M)
    for s, hyp in enumerate(hyps):
        Binv, _ = _np_posterior(hyp, X, y)
        Kg = _np_kernel(hyp, grid[:, None], X)
        Km = _np_kernel(hyp, Xm, X)
        Kmg = _np_kernel(hyp, Xm, grid[:, None])
        cov = Kmg - Km @ Binv @ Kg.T                      # (M, G)
        want = np.trapz(q[None, :] * cov, dx=dx, axis=1)
        np.testing.assert_allclose(got[s], want, rtol=5e-4, atol=1e-6)


def test_viqr_grid_isstate_vs_oracle(rng):
    """evaluate_is_acquisition with an exact grid IS set reproduces the
    deterministic quadrature oracle (validates the variance-reduction and
    sinh-integration math, `acqviqr_vbmc.m:60-114`)."""
    cfg, gp, vp, state, X, y, hyps = _setup(rng)
    Xm = np.linspace(-2.0, 2.0, 9)[:, None]
    grid = np.linspace(-8.0, 8.0, 2001)
    dx = grid[1] - grid[0]

    # Exact IS state: grid points, weights prop q(x)*dx, exact fs2/invKzk.
    logq = _np_vp_logq(vp, grid)
    lnw = np.tile(logq[None, :], (2, 1))
    lnw -= np.log(np.sum(np.exp(logq)))                   # normalize
    fs2 = np.zeros((2, len(grid)))
    invKzk = np.zeros((2, 16, len(grid)))
    for s, hyp in enumerate(hyps):
        Binv, _ = _np_posterior(hyp, X, y)
        Kg = _np_kernel(hyp, grid[:, None], X)            # (G, N)
        fs2[s] = np.exp(2 * hyp[1]) - np.einsum("gn,nm,gm->g", Kg, Binv, Kg)
        invKzk[s, :len(X)] = Binv @ Kg.T
    ais = ISState(Xa=jnp.asarray(grid[:, None]),
                  ln_weights=jnp.asarray(lnw),
                  invKzk=jnp.asarray(invKzk),
                  f_s2=jnp.asarray(fs2))

    got = np.asarray(evaluate_is_acquisition(cfg, "viqr", jnp.asarray(Xm),
                                             vp, gp, state, ais))
    want = _np_viqr_oracle(hyps, X, y, vp, Xm, grid)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_viqr_mc_estimator_converges(rng):
    """The stochastic IS set (stratified proposals; with and without the
    batched-MH refresh) converges to the grid oracle — validating the
    proposal/weight bookkeeping of build_is_state_core against
    `activeimportancesampling_vbmc.m:105-146` on a well-separated bimodal
    posterior (the hard case for the un-refreshed estimator)."""
    cfg, gp, vp, state, X, y, hyps = _setup(rng, multimodal=True)
    Xm = np.linspace(-2.5, 2.5, 9)[:, None]
    grid = np.linspace(-10.0, 10.0, 4001)
    want = _np_viqr_oracle(hyps, X, y, vp, Xm, grid)

    for mh_steps in (0, 3):
        accs = []
        for rep in range(4):
            key = jax.random.PRNGKey(100 + rep)
            ais = build_is_state_core(key, cfg, "viqr", vp, gp,
                                      n_vp=2000, n_box=2000, n_mcmc=2000,
                                      mh_steps=mh_steps, fess_thresh=0.9)
            accs.append(np.asarray(evaluate_is_acquisition(
                cfg, "viqr", jnp.asarray(Xm), vp, gp, state, ais)))
        got = np.mean(accs, axis=0)
        err = np.max(np.abs(got - want))
        assert err < 0.05, (mh_steps, err, got, want)


def test_mh_refresh_gates_on_fess(rng):
    """With an adequate proposal (fESS above threshold) the refresh is a
    no-op: weights stay on the proposal-weighted path."""
    cfg, gp, vp, state, X, y, hyps = _setup(rng)
    key = jax.random.PRNGKey(0)
    a0 = build_is_state_core(key, cfg, "viqr", vp, gp, 400, 400, 400,
                             mh_steps=3, fess_thresh=1e-9)
    a1 = build_is_state_core(key, cfg, "viqr", vp, gp, 400, 400, 400,
                             mh_steps=0)
    np.testing.assert_allclose(np.asarray(a0.Xa), np.asarray(a1.Xa))
    np.testing.assert_allclose(np.asarray(a0.ln_weights),
                               np.asarray(a1.ln_weights), atol=1e-10)


def test_imiqr_mc_estimator_converges(rng):
    """IMIQR estimator (weights ~ exp(fmu), sinh factor at eval time, per
    hyp sample, `acqimiqr_vbmc.m:14-26`) vs a direct quadrature oracle.

    Uses a negquad-mean GP so exp(fmu) is integrable (with a zero mean the
    posterior mean reverts to 0 and the IMIQR estimand diverges — which is
    exactly why the reference pairs IMIQR with a quadratic GP mean)."""
    from vbmc_tpu.gp.config import MEAN_NEGQUAD

    cfg = GPConfig(D=D, meanfun=MEAN_NEGQUAD)
    n = 10
    X = rng.uniform(-2.0, 2.0, (n, D))
    m0, xm, om = 0.5, 0.2, 1.5
    y = m0 - 0.5 * ((X[:, 0] - xm) / om) ** 2 + 0.3 * np.sin(2.0 * X[:, 0])
    hyps = np.zeros((2, cfg.nhyp))
    for s in range(2):
        hyps[s, 0] = np.log(0.7) + 0.15 * s     # log ell
        hyps[s, 1] = np.log(0.8) - 0.1 * s      # log sf
        hyps[s, 2] = np.log(0.3)                # log sn
        hyps[s, 3] = m0                         # mean m0
        hyps[s, 4] = xm                         # mean xm
        hyps[s, 5] = np.log(om)                 # mean log omega
    gp = gp_from_host(cfg, X, y, None, hyps, n_bucket=16, s_bucket=2)
    trinfo = create_trinfo(np.full(D, -np.inf), np.full(D, np.inf),
                           np.full(D, -4.0), np.full(D, 4.0))
    vp = make_vp(trinfo, np.array([[-0.5], [0.7]]), np.array([0.6, 0.9]),
                 lam=np.ones(D), w=np.array([0.4, 0.6]), k_max=4)
    state = AcqState(
        ymax=jnp.asarray(float(y.max())), tol_var=jnp.asarray(1e-30),
        lb_eps_orig=jnp.asarray(np.full(D, -np.inf)),
        ub_eps_orig=jnp.asarray(np.full(D, np.inf)),
        gp_length_scale=jnp.asarray(np.exp(hyps[:, 0]).mean(keepdims=True)),
        var_log_joint=jnp.ones(2), regularize=jnp.asarray(False),
        delta=jnp.zeros(D))

    Xm_c = np.linspace(-1.5, 1.5, 5)[:, None]
    grid = np.linspace(-12.0, 12.0, 6001)
    dx = grid[1] - grid[0]

    def _mean(hyp, xs):
        return hyp[3] - 0.5 * ((xs - hyp[4]) / np.exp(hyp[5])) ** 2

    # Oracle: per sample s, E_{p_s}[2 sinh(u s_post)] with
    # p_s(x) prop exp(fmu_s(x)), then log-mean over samples.
    vals = np.zeros((len(hyps), len(Xm_c)))
    for s, hyp in enumerate(hyps):
        Binv, sn2 = _np_posterior(hyp, X, y)
        alpha = Binv @ (y - _mean(hyp, X[:, 0]))
        Kg = _np_kernel(hyp, grid[:, None], X)
        kgg = np.exp(2.0 * hyp[1])
        fmu_g = _mean(hyp, grid) + Kg @ alpha
        fs2_g = kgg - np.einsum("gn,nm,gm->g", Kg, Binv, Kg)
        Km = _np_kernel(hyp, Xm_c, X)
        fs2_m = kgg - np.einsum("mn,nk,mk->m", Km, Binv, Km)
        Kmg = _np_kernel(hyp, Xm_c, grid[:, None])
        cov = Kmg - Km @ Binv @ Kg.T
        s2_post = np.maximum(
            fs2_g[None, :] - cov ** 2 / (fs2_m + sn2)[:, None], 1e-12)
        w_is = np.exp(fmu_g - fmu_g.max())
        integ = 2.0 * np.sinh(_U_IQR * np.sqrt(s2_post))
        vals[s] = (np.trapz(w_is[None, :] * integ, dx=dx, axis=1)
                   / np.trapz(w_is, dx=dx))
    want = np.log(vals.mean(axis=0))

    accs = []
    for rep in range(6):
        key = jax.random.PRNGKey(7 + rep)
        ais = build_is_state_core(key, cfg, "imiqr", vp, gp,
                                  n_vp=2000, n_box=2000, n_mcmc=2000,
                                  mh_steps=3, fess_thresh=0.9)
        accs.append(np.asarray(evaluate_is_acquisition(
            cfg, "imiqr", jnp.asarray(Xm_c), vp, gp, state, ais)))
    got = np.mean(accs, axis=0)
    assert np.max(np.abs(got - want)) < 0.1, (got, want)
