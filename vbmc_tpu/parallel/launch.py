"""Multi-host dispatch for independent VBMC runs.

The multi-run validation workflow (`vbmc_diagnostics.m`) is embarrassingly
parallel at the RUN level: each run is an independent inference with its
own seed, and only the final (vp, elbo, elbo_sd) triples meet for
cross-validation. This module dispatches each run to its OWN PROCESS (and,
via ``env_per_run``, its own accelerator/host), then gathers the slim
results for diagnostics:

- one worker process per run (`python -m vbmc_tpu.parallel.worker`), each
  with an isolated JAX runtime — on a multi-host deployment point
  ``env_per_run`` at per-host device env (e.g. ``CUDA/TPU visible devices``
  or per-host ``JAX_COORDINATOR``-style settings), or wrap the command via
  ``launcher`` (e.g. ``["ssh", "host3"]`` / an mpirun prefix);
- run payloads cross the process boundary by pickle (the target callable
  and any callable options must be picklable, i.e. module-level);
- results return as serialized variational posteriors + scalar stats
  (`serialize.save_vp`), which is exactly what `vbmc_diagnostics` needs.

WITHIN each run, multi-device scaling is the in-loop sharding path
(`parallel/context.py` — hyp-ensemble/sieve/candidate axes over the local
mesh); ACROSS runs, this module is the scale-out axis of BASELINE.md's
"1 chip / 1 host / >= 2 hosts" matrix. For a multi-host *single* run the
same jitted kernels compile under `jax.distributed.initialize` +
a global mesh (`dryrun_multichip` validates the sharded programs); VBMC's
problem sizes (D <= 20, N <= 1024) make per-run multi-HOST compute
unprofitable, so the supported multi-host story is run-parallelism.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import subprocess
import sys
import tempfile
from typing import Optional, Sequence

import numpy as np


def dispatch_runs(fun, x0=None, lb=None, ub=None, plb=None, pub=None,
                  options=None, n_runs: int = 3,
                  python: Optional[str] = None,
                  launcher: Optional[Sequence[str]] = None,
                  env_per_run: Optional[Sequence[dict]] = None,
                  timeout: float = 3600.0, workdir: Optional[str] = None):
    """Run ``n_runs`` independent VBMC inferences in separate processes.

    Returns (DiagnosticsResult, [(vp, elbo, elbo_sd, meta), ...]).
    Seeds are ``options.seed + 1000*i`` (same schedule as the sequential
    `vbmc_sweep`).
    """
    from vbmc_tpu.options import VBMCOptions
    from vbmc_tpu.serialize import load_vp
    from vbmc_tpu.diagnostics import vbmc_diagnostics

    if options is None:
        options = VBMCOptions()
    python = python or sys.executable
    tmp = tempfile.mkdtemp(prefix="vbmc_sweep_", dir=workdir)

    procs = []
    out_paths = []
    for i in range(n_runs):
        opts_i = dataclasses.replace(options, seed=options.seed + 1000 * i)
        in_path = os.path.join(tmp, f"run{i}.pkl")
        out_path = os.path.join(tmp, f"run{i}_out.npz")
        with open(in_path, "wb") as f:
            pickle.dump(dict(fun=fun, x0=x0, lb=lb, ub=ub, plb=plb, pub=pub,
                             options=opts_i), f)
        cmd = list(launcher or []) + [python, "-m",
                                      "vbmc_tpu.parallel.worker",
                                      in_path, out_path]
        env = dict(os.environ)
        if env_per_run is not None and i < len(env_per_run):
            env.update(env_per_run[i])
        # The repo must be importable in the worker.
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env["VBMC_REPO"] = repo
        procs.append(subprocess.Popen(cmd, env=env))
        out_paths.append(out_path)

    failures = []
    for i, p in enumerate(procs):
        rc = p.wait(timeout=timeout)
        if rc != 0:
            failures.append((i, rc))
    if failures:
        raise RuntimeError(f"sweep workers failed: {failures}")

    triples = []
    metas = []
    for path in out_paths:
        vp, meta = load_vp(path)
        triples.append((vp, float(meta["elbo"]), float(meta["elbo_sd"])))
        metas.append(meta)
    diag = vbmc_diagnostics(triples)
    return diag, [t + (m,) for t, m in zip(triples, metas)]
