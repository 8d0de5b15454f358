"""Unit tests for the host-side orchestration controllers: termination
(`private/vbmc_termination.m`), warmup end (`private/vbmc_warmup.m`),
mixture-size schedule (`private/updateK.m`), best-iteration selection
(`misc/best_vbmc.m`), and the multi-run diagnostics verdict
(`vbmc_diagnostics.m`)."""

import math

import numpy as np
import pytest

from vbmc_tpu import state as st
from vbmc_tpu.options import VBMCOptions


def _opts(D=2, **kw):
    return VBMCOptions(**kw).resolve(D)


def _add_iter(stats, it, elbo, elbo_sd=0.02, sKL=1e-4, K=8, N=None,
              func_count=None, warmup=False, pruned=0, varss=1e-6,
              lcbmax=0.0):
    N = N if N is not None else 10 + 5 * it
    stats.add(st.IterStats(
        iter=it, elbo=elbo, elbo_sd=elbo_sd, sKL=sKL, sKL_true=None, K=K,
        N=N, neff=N, func_count=func_count or N, warmup=warmup,
        pruned=pruned, varss=varss, lcbmax=lcbmax, vp=None))


def test_termination_on_stability():
    """A long flat ELBO trace with tiny sKL must terminate with exitflag 1
    (`vbmc_termination.m` reliability index + stable-count logic)."""
    opt = _opts(tol_stable_count=30)   # 6 stable iters at 5 evals/iter
    state = st.OptimState(warmup=False, vp_K=8)
    state.sn2hpd = 1e-6
    stats = st.Stats()
    fired = None
    for it in range(1, 25):
        _add_iter(stats, it, elbo=-1.0 + 1e-4 * it)
        done, exitflag, msg, _ = st.check_termination(state, stats, opt,
                                                      stats.last.func_count)
        if done:
            fired = (it, exitflag, msg)
            break
    assert fired is not None
    assert fired[1] == 1
    assert "stable" in fired[2]
    assert stats.last.rindex < 1.0


def test_termination_on_budget():
    opt = _opts(max_fun_evals=50)
    state = st.OptimState(warmup=False, vp_K=4)
    stats = st.Stats()
    _add_iter(stats, 1, elbo=-5.0, N=20, func_count=30)
    _add_iter(stats, 2, elbo=-5.0, N=25, func_count=55)  # past min_iter=D
    done, exitflag, msg, _ = st.check_termination(state, stats, opt, 55)
    assert done and exitflag == 0
    assert "function evaluations" in msg


def test_no_termination_while_improving():
    """A steadily improving ELBO must NOT terminate."""
    opt = _opts(tol_stable_count=30)
    state = st.OptimState(warmup=False, vp_K=8)
    state.sn2hpd = 1e-6
    stats = st.Stats()
    for it in range(1, 20):
        _add_iter(stats, it, elbo=-10.0 + 0.5 * it, sKL=0.5)
        done, *_ = st.check_termination(state, stats, opt,
                                        stats.last.func_count)
        assert not done


class _FakeLogger:
    """Minimal logger stand-in for check_warmup's trim path."""

    def __init__(self, n, D=2):
        self.Xn = n
        self.D = D
        self.y_orig = np.linspace(-50.0, 0.0, n)
        self.X_flag = np.ones(n, dtype=bool)


def test_warmup_ends_after_stall():
    """Warmup ends (or trims) once the max-LCB trace stalls
    (`vbmc_warmup.m:40-75`)."""
    opt = _opts(tol_stable_warmup=15, warmup_no_impro_threshold=25)
    state = st.OptimState(warmup=True, vp_K=2)
    stats = st.Stats()
    logger = _FakeLogger(60)
    ended = False
    for it in range(1, 15):
        # lcbmax improves early then stalls; rindex small => real end,
        # not a false-alarm trim.
        lcb = -5.0 + min(it, 3) * 1.0
        _add_iter(stats, it, elbo=-2.0, K=2, warmup=True, lcbmax=lcb)
        stats.last.rindex = 0.5
        notes, trim = st.check_warmup(state, stats, opt, logger)
        if not state.warmup:
            ended = True
            assert "end warm-up" in notes
            break
    assert ended
    # Points far below ymax were trimmed.
    assert logger.X_flag.sum() < 60
    assert state.last_warmup == len(stats)


def test_warmup_keeps_running_while_improving():
    opt = _opts()
    state = st.OptimState(warmup=True, vp_K=2)
    stats = st.Stats()
    logger = _FakeLogger(40)
    for it in range(1, 10):
        _add_iter(stats, it, elbo=-2.0, K=2, warmup=True,
                  lcbmax=-5.0 + 2.0 * it)   # still improving
        stats.last.rindex = 0.5
        st.check_warmup(state, stats, opt, logger)
        assert state.warmup


def test_update_k_grows_when_improving():
    """K grows by 1 (+bonus when reliable) while the ELCBO improves
    (`updateK.m:20-36`)."""
    opt = _opts()
    state = st.OptimState(warmup=False, vp_K=5)
    state.recompute_var_post = False
    stats = st.Stats()
    for it in range(1, 9):
        _add_iter(stats, it, elbo=-3.0 + 0.3 * it, K=5, N=60 + it)
        stats.last.rindex = 0.5
    K_new = st.update_K(state, stats, opt)
    assert K_new > 5
    # Capped by neff^(2/3).
    assert K_new <= int(math.ceil(stats.last.neff ** (2 / 3)))


def test_update_k_frozen_during_warmup():
    opt = _opts()
    state = st.OptimState(warmup=True, vp_K=2)
    stats = st.Stats()
    for it in range(1, 4):
        _add_iter(stats, it, elbo=-3.0 + it, K=2, warmup=True)
    assert st.update_K(state, stats, opt) == 2


def test_best_iteration_prefers_stable_high_elcbo():
    stats = st.Stats()
    for it in range(1, 11):
        _add_iter(stats, it, elbo=-5.0 + 0.4 * it, elbo_sd=0.05)
        stats.last.rindex = 2.0 / it
    # Mark a mid iteration stable with great ELCBO.
    stats.iterations[8].stable = True
    idx = st.best_iteration(stats)
    assert idx == 8


def test_diagnostics_agreeing_runs_pass(rng):
    """Two agreeing (vp, elbo, sd) runs => exitflag 1; a diverging third
    run degrades the verdict (`vbmc_diagnostics.m:53-62`)."""
    from vbmc_tpu.diagnostics import vbmc_diagnostics
    from vbmc_tpu.vp import make_vp
    from vbmc_tpu.transforms import create_trinfo

    D = 2
    trinfo = create_trinfo([-np.inf] * D, [np.inf] * D, [-2.0] * D,
                           [2.0] * D)
    vp1 = make_vp(trinfo, np.zeros((2, D)) + 0.01, 0.5, np.ones(D))
    vp2 = make_vp(trinfo, np.zeros((2, D)) - 0.01, 0.5, np.ones(D))
    res = vbmc_diagnostics([(vp1, -1.0, 0.05), (vp2, -1.02, 0.05)])
    assert res.exitflag == 1
    assert res.best in (0, 1)

    vp3 = make_vp(trinfo, np.full((2, D), 5.0), 0.3, np.ones(D))
    res3 = vbmc_diagnostics([(vp1, -1.0, 0.05), (vp2, -1.02, 0.05),
                             (vp3, -9.0, 0.05)])
    assert res3.exitflag < 1
