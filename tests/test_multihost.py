"""Multi-process sweep dispatch (the >= 2-host leg of the BASELINE.md
scaling matrix, executed as 2 worker processes on this machine): each run
in its own process with an isolated JAX runtime, gathered into
`vbmc_diagnostics` (cf. the `vbmc_diagnostics.m` multi-run workflow)."""

import numpy as np
import pytest

from vbmc_tpu.main import vbmc_sweep
from vbmc_tpu.options import VBMCOptions
from vbmc_tpu.examples import rosenbrock_test


def test_subprocess_sweep_two_workers(tmp_path):
    opts = VBMCOptions(display="off", max_fun_evals=18, seed=11,
                       min_final_components=4)
    diag, results = vbmc_sweep(
        rosenbrock_test, x0=np.zeros(2), plb=np.full(2, -3.0),
        pub=np.full(2, 3.0), options=opts, n_runs=2,
        dispatch="subprocess",
        env_per_run=[{"VBMC_WORKER_PLATFORM": "cpu",
                      "VBMC_WORKER_X64": "1"}] * 2,
        workdir=str(tmp_path), timeout=1500.0)
    assert len(results) == 2
    for vp, elbo, elbo_sd, meta in results:
        assert np.isfinite(elbo) and np.isfinite(elbo_sd)
        assert meta["func_count"] >= 15
        assert vp.mu.shape[1] == 2
    # Two independent short runs on the same target must roughly agree.
    assert abs(results[0][1] - results[1][1]) < 3.0
    assert diag.skl_matrix.shape == (2, 2)
