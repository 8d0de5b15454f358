"""Final-boost correctness across input warps.

The final boost must optimize the best iteration's VP against the GP of
that SAME iteration (`misc/finalboost_vbmc.m:36`: `gp_idx =
gplite_post(stats.gp(idx_best))`). When a rotoscale warp lands on a later
iteration, the current GP lives in a different transformed space than the
stored best VP; pairing them corrupts the boost ELBO (observed as a
>1-nat error on the correlated bounded self-test target).
"""

import numpy as np
import pytest

from vbmc_tpu import vbmc, VBMCOptions


@pytest.mark.slow
def test_boost_uses_best_iterations_gp_across_warps():
    # Correlated 2-D Gaussian in a box: rotoscale warps engage. Forcing
    # warp_every_iters=1 makes warps land right up to the last iteration,
    # so the boost would cross spaces if it used the final GP.
    rho = 0.9
    cov = np.array([[1.0, rho], [rho, 1.0]])
    prec = np.linalg.inv(cov)
    lognorm = -np.log(2 * np.pi) - 0.5 * np.linalg.slogdet(cov)[1]

    def lnp(x):
        return float(-0.5 * x @ prec @ x + lognorm)

    res = vbmc(lnp, x0=np.array([0.2, 0.2]), lb=np.full(2, -6.0),
               ub=np.full(2, 6.0), plb=np.full(2, -3.0), pub=np.full(2, 3.0),
               options=VBMCOptions(max_fun_evals=60, seed=11, display="off",
                                   warp_every_iters=1, warp_min_k=2,
                                   min_final_components=20))
    # stats must record the per-iteration GP (the boost's input).
    assert all(it.gp is not None for it in res.stats.iterations)
    # lnZ = 0 (normalized); the boost result must stay within the
    # self-test gate even with warps landing on the final iterations.
    assert abs(res.elbo) < 0.5, res.elbo
