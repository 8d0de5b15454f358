"""Active sampling: initial design, search-set generation, acquisition sweep
and CMA-ES refinement, target evaluation, and GP posterior refresh
(cf. `private/activesample_vbmc.m`, `misc/initdesign_vbmc.m`).

The 2^13-candidate acquisition sweep and the CMA-ES refinement are jitted
batch kernels; the loop over the (default 5) new points per iteration stays
host-side because each point requires an external target evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vbmc_tpu.gp.config import GPConfig
from vbmc_tpu.gp.gp import GP
from vbmc_tpu.gp.fit import _build_gp_jit, get_hpd
from vbmc_tpu.function_logger import FunctionLogger
from vbmc_tpu.vp import VariationalPosterior, vp_rnd, vp_moments
from vbmc_tpu.acquisitions import (evaluate_acquisition, sweep_acquisition,
                                   AcqState, ACQ_INFO)
from vbmc_tpu.samplers.cmaes import cmaes_minimize
from functools import partial


@partial(jax.jit, static_argnames=("cfg", "name", "max_evals", "popsize",
                                   "smooth"))
def _cmaes_refine(cfg, name, key, x0, insigma, lb, ub, vp, gp, state,
                  max_evals: int, popsize: int, smooth: bool = False):
    """Whole CMA-ES refinement as one compiled kernel (scan over
    generations; population evaluated as a batch)."""
    def f_batch(xs):
        return evaluate_acquisition(cfg, name, xs, vp, gp, state,
                                    smooth=smooth)
    return cmaes_minimize(key, f_batch, x0, insigma, lb, ub,
                          max_evals=max_evals, popsize=popsize)


@partial(jax.jit, static_argnames=("cfg", "name", "max_evals", "popsize"))
def _cmaes_refine_is(cfg, name, key, x0, insigma, lb, ub, vp, gp, state, ais,
                     max_evals: int, popsize: int):
    from vbmc_tpu.active_is import evaluate_is_acquisition

    def f_batch(xs):
        return evaluate_is_acquisition(cfg, name, xs, vp, gp, state, ais)
    return cmaes_minimize(key, f_batch, x0, insigma, lb, ub,
                          max_evals=max_evals, popsize=popsize)
from vbmc_tpu.utils.math import bucket_n, pad_to


@dataclasses.dataclass
class SearchBounds:
    lb: np.ndarray          # current search box (transformed space)
    ub: np.ndarray
    lb_hard: np.ndarray     # transformed hard bounds
    ub_hard: np.ndarray

    @staticmethod
    def init(plb, pub, lb_hard, ub_hard, mult: float):
        prange = pub - plb
        return SearchBounds(
            lb=np.maximum(plb - prange * mult, lb_hard),
            ub=np.minimum(pub + prange * mult, ub_hard),
            lb_hard=lb_hard, ub_hard=ub_hard)

    def expand(self, xnew: np.ndarray):
        """Expand the search box when new points land near its edges
        (`activesample_vbmc.m:492-508`)."""
        delta = 0.05 * (self.ub - self.lb)
        near_lo = np.abs(xnew - self.lb) < delta
        self.lb[near_lo] = np.maximum(self.lb_hard[near_lo],
                                      (self.lb - delta)[near_lo])
        near_hi = np.abs(xnew - self.ub) < delta
        self.ub[near_hi] = np.minimum(self.ub_hard[near_hi],
                                      (self.ub + delta)[near_hi])


def initial_design(key, logger: FunctionLogger, n_evals: int,
                   plb, pub, x0_cache: Optional[np.ndarray] = None,
                   fvals_cache: Optional[np.ndarray] = None):
    """First batch of evaluations: provided starting points + uniform draws
    in the plausible box (`initdesign_vbmc.m:10-28`, 'plausible' mode)."""
    D = plb.shape[0]
    pts = []
    if x0_cache is not None and len(x0_cache):
        pts.append(np.asarray(x0_cache, float).reshape(-1, D))
    n_have = sum(p.shape[0] for p in pts)
    n_rand = max(n_evals - n_have, 0)
    if n_rand > 0:
        u = np.asarray(jax.random.uniform(key, (n_rand, D)))
        pts.append(plb + u * (pub - plb))
    X = np.concatenate(pts, axis=0)[:n_evals]
    for i, x in enumerate(X):
        if (fvals_cache is not None and i < len(fvals_cache)
                and np.isfinite(fvals_cache[i])):
            logger.add(x, float(fvals_cache[i]))
        else:
            logger.evaluate(x)


def get_search_points(key, n_search: int, vp: VariationalPosterior,
                      logger: FunctionLogger, sb: SearchBounds, options,
                      search_cache: Optional[np.ndarray] = None) -> np.ndarray:
    """Generate the fast acquisition search set
    (`activesample_vbmc.m:545-639`): a mixture of heavy-tailed VP samples,
    MVN moment-matched samples, box-uniform samples, and VP samples."""
    D = vp.D
    parts = []
    n_rem = n_search

    n_sc = int(round(options.search_cache_frac * n_search))
    if n_sc > 0 and search_cache is not None and len(search_cache):
        parts.append(search_cache[:n_sc])

    n_heavy = int(round(options.heavy_tail_search_frac * n_search))
    if n_heavy > 0:
        k1, key = jax.random.split(key)
        parts.append(np.asarray(vp_rnd(vp, k1, n_heavy, orig_flag=False,
                                       df=3.0)))
    n_mvn = int(round(options.mvn_search_frac * n_search))
    if n_mvn > 0:
        k1, key = jax.random.split(key)
        mu, cov = vp_moments(vp, orig_flag=False)
        L = np.linalg.cholesky(np.asarray(cov)
                               + 1e-12 * np.eye(D))
        eps = np.asarray(jax.random.normal(k1, (n_mvn, D)))
        parts.append(np.asarray(mu)[None, :] + eps @ L.T)

    n_hpd = int(round(options.hpd_search_frac * n_search))
    if n_hpd > 0:
        k1, key = jax.random.split(key)
        X, y, _ = logger.training_data()
        hpd_min, hpd_max = options.hpd_frac / 8, options.hpd_frac
        u = np.asarray(jax.random.uniform(k1, (4,)))
        fracs = np.sort(np.concatenate([
            u * (hpd_max - hpd_min) + hpd_min, [hpd_min, hpd_max]]))
        n_vec = np.diff(np.round(np.linspace(0, n_hpd, len(fracs) + 1))).astype(int)
        for frac, n_i in zip(fracs, n_vec):
            if n_i == 0:
                continue
            X_hpd, _ = get_hpd(X, y, frac)
            if X_hpd.shape[0] < 2:
                mu_h = X[np.argmax(y)]
                cov_h = np.cov(X.T) + 1e-12 * np.eye(D)
            else:
                mu_h = X_hpd.mean(0)
                cov_h = np.cov(X_hpd.T, bias=True) + 1e-12 * np.eye(D)
            k2, key = jax.random.split(key)
            eps = np.asarray(jax.random.normal(k2, (int(n_i), D)))
            parts.append(mu_h[None, :] + eps @ np.linalg.cholesky(cov_h).T)

    n_box = int(round(options.box_search_frac * n_search))
    if n_box > 0:
        k1, key = jax.random.split(key)
        X, _, _ = logger.training_data()
        diam = X.max(0) - X.min(0)
        if np.all(np.isfinite(sb.lb)) and np.all(np.isfinite(sb.ub)):
            box_lb = np.maximum(X.min(0) - 0.5 * diam, sb.lb)
            box_ub = np.minimum(X.max(0) + 0.5 * diam, sb.ub)
        else:
            box_lb = X.min(0) - 0.5 * diam
            box_ub = X.max(0) + 0.5 * diam
        u = np.asarray(jax.random.uniform(k1, (n_box, D)))
        parts.append(box_lb + u * (box_ub - box_lb))

    n_have = sum(p.shape[0] for p in parts)
    n_vp = max(n_search - n_have, 0)
    if n_vp > 0:
        k1, key = jax.random.split(key)
        parts.append(np.asarray(vp_rnd(vp, k1, n_vp, orig_flag=False,
                                       balance_flag=True)))
    X = np.concatenate(parts, axis=0)[:n_search]
    return np.clip(X, sb.lb, sb.ub)


def gp_reupdate(cfg: GPConfig, gp: GP, logger: FunctionLogger) -> GP:
    """Refresh the GP posterior with current training data, keeping the
    hyperparameter samples (cf. `misc/gpreupdate.m`). The batched
    re-factorization replaces the reference's rank-1 update — one fused
    (S, N, N) Cholesky batch on the MXU instead of sequential updates."""
    X, y, s2 = logger.training_data()
    n = X.shape[0]
    nb = bucket_n(n)
    dtype = gp.X.dtype
    Xp = jnp.asarray(pad_to(X, nb), dtype=dtype)
    yp = jnp.asarray(pad_to(y, nb), dtype=dtype)
    s2p = (jnp.zeros(nb, dtype=dtype) if s2 is None
           else jnp.asarray(pad_to(s2, nb), dtype=dtype))
    mask = jnp.asarray(np.arange(nb) < n)
    return _build_gp_jit(cfg, Xp, yp, s2p, mask, gp.hyp, gp.hyp_mask)


def _geomean_length_scale(cfg: GPConfig, gp: GP) -> np.ndarray:
    m = np.asarray(gp.hyp_mask, float)
    le = np.asarray(gp.hyp)[:, :cfg.D]
    return np.exp((le * m[:, None]).sum(0) / max(m.sum(), 1.0))


def active_sample(key, cfg: GPConfig, logger: FunctionLogger, n_points: int,
                  vp: VariationalPosterior, gp: Optional[GP],
                  sb: SearchBounds, options, *, acq_name: str,
                  tol_gp_var: float, var_log_joint=None,
                  full_update: bool = False, retrain_gp=None,
                  refit_vp=None, fess_thresh: float = 1.0):
    """Acquire ``n_points`` new evaluations; returns (gp, vp).

    ``gp`` must be trained (call `initial_design` when there is none).
    When ``full_update`` is set (noisy targets near warmup end / unstable
    runs, cf. `activesample_vbmc.m:46-76, 429-473`), the provided
    ``retrain_gp(logger)`` / ``refit_vp(vp, gp)`` callbacks re-train the GP
    hyperparameters and re-fit the VP after each acquisition, gated on the
    fractional effective sample size."""
    D = vp.D
    dtype = gp.X.dtype
    use_is = ACQ_INFO[acq_name]["importance_sampling"]

    from vbmc_tpu.transforms import direct
    lb_eps, ub_eps = _hard_bound_eps(logger, options)

    for i in range(n_points):
        key, k_search, k_cma, k_is = jax.random.split(key, 4)

        # Importance-sampling state is rebuilt per point: the GP posterior
        # changes as evaluations accrue (`activesample_vbmc.m:208-211`).
        if use_is:
            from vbmc_tpu.active_is import build_is_state
            active_is_state = build_is_state(k_is, cfg, acq_name, vp, gp,
                                             options)
        else:
            active_is_state = None

        # EIG needs the per-sample variance of the log-joint integral,
        # recomputed as the GP updates (`activesample_vbmc.m:152-157`).
        if acq_name == "eig":
            from vbmc_tpu.elbo import gplogjoint
            _, _, _, _, J = gplogjoint(cfg, gp, vp.mu, vp.sigma, vp.lam,
                                       vp.w, vp.kmask, compute_var=1)
            wk = vp.w * vp.kmask.astype(vp.w.dtype)
            var_log_joint = jnp.maximum(
                jnp.einsum("j,sjk,k->s", wk, J, wk), 1e-12)
        # Bandwidth smoothing (`acqwrapper_vbmc.m:12-15`): delta is set by
        # the orchestrator when options.bandwidth > 0.
        delta_sm = getattr(options, "delta_smoothing", None)
        smooth = delta_sm is not None
        state = AcqState(
            ymax=jnp.asarray(logger.ymax, dtype=dtype),
            tol_var=jnp.asarray(tol_gp_var, dtype=dtype),
            lb_eps_orig=jnp.asarray(lb_eps, dtype=dtype),
            ub_eps_orig=jnp.asarray(ub_eps, dtype=dtype),
            gp_length_scale=jnp.asarray(_geomean_length_scale(cfg, gp),
                                        dtype=dtype),
            var_log_joint=(var_log_joint if var_log_joint is not None
                           else jnp.ones(gp.s_max, dtype=dtype)),
            regularize=jnp.asarray(True),
            delta=(jnp.asarray(delta_sm, dtype=dtype) if smooth
                   else jnp.zeros(D, dtype=dtype)))

        Xsearch = get_search_points(k_search, options.ns_search, vp, logger,
                                    sb, options)
        Xs = jnp.asarray(Xsearch, dtype=dtype)
        if active_is_state is not None:
            from vbmc_tpu.active_is import evaluate_is_acquisition
            acq = evaluate_is_acquisition(cfg, acq_name, Xs, vp, gp, state,
                                          active_is_state)
        else:
            acq = sweep_acquisition(cfg, acq_name, Xs, vp, gp, state,
                                    smooth=smooth)
        acq_np = np.asarray(acq)
        best = int(np.nanargmin(np.where(np.isfinite(acq_np), acq_np, np.inf)))
        x_best = Xsearch[best]
        f_best = acq_np[best]

        # CMA-ES refinement of the winner (`activesample:246-330`).
        if options.search_optimizer == "cmaes":
            if options.search_cmaes_vp_init:
                _, cov = vp_moments(vp, orig_flag=False)
                insigma = np.sqrt(np.maximum(np.diag(np.asarray(cov)), 1e-12))
            else:
                X_t, y_t, _ = logger.training_data()
                X_hpd, _ = get_hpd(X_t, y_t, options.hpd_frac)
                insigma = np.maximum(X_hpd.std(0), 1e-6)
            lb_c = np.minimum(x_best, sb.lb)
            ub_c = np.maximum(x_best, sb.ub)

            args = (k_cma, jnp.asarray(x_best, dtype=dtype),
                    jnp.asarray(insigma, dtype=dtype),
                    jnp.asarray(lb_c, dtype=dtype),
                    jnp.asarray(ub_c, dtype=dtype), vp, gp, state)
            if active_is_state is not None:
                res = _cmaes_refine_is(cfg, acq_name, *args, active_is_state,
                                       max_evals=options.search_max_fun_evals,
                                       popsize=16)
            else:
                res = _cmaes_refine(cfg, acq_name, *args,
                                    max_evals=options.search_max_fun_evals,
                                    popsize=16, smooth=smooth)
            if float(res.f_best) < f_best:
                x_best = np.asarray(res.x_best)

        logger.evaluate(x_best)
        sb.expand(x_best)

        if i < n_points - 1:
            if full_update and (retrain_gp is not None
                                or refit_vp is not None):
                gp_tmp = gp_reupdate(cfg, gp, logger)
                if fess_thresh < 1.0:
                    from vbmc_tpu.vpoptim import fractional_ess
                    key, k_f = jax.random.split(key)
                    fess = fractional_ess(k_f, cfg, vp, gp_tmp, 100)
                else:
                    fess = 0.0
                if fess <= fess_thresh:
                    gp = retrain_gp(logger) if retrain_gp is not None \
                        else gp_tmp
                    if refit_vp is not None:
                        vp = refit_vp(vp, gp)
                else:
                    gp = gp_tmp
            else:
                gp = gp_reupdate(cfg, gp, logger)

    return gp_reupdate(cfg, gp, logger), vp


def _hard_bound_eps(logger: FunctionLogger, options):
    """Original-space epsilon box used to reject near-bound candidates."""
    ti = logger.trinfo
    lb = np.asarray(ti.lb_orig)
    ub = np.asarray(ti.ub_orig)
    both = np.isfinite(lb) & np.isfinite(ub)
    width = np.where(both, ub - lb, 0.0)
    lb_eps = np.where(both, lb + width * options.tol_bound_x, -np.inf)
    ub_eps = np.where(both, ub - width * options.tol_bound_x, np.inf)
    return lb_eps, ub_eps
