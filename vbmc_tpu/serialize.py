"""Serialization of variational posteriors and run results (the
checkpoint/resume capability the reference lacks — SURVEY §5: it only
supports in-memory warm starts; we add durable artifacts plus reproduce the
reference's warm-start paths).

Format: a single .npz with the VP arrays + transform description and a JSON
metadata blob (no pickling; loadable anywhere)."""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import jax.numpy as jnp

from vbmc_tpu.transforms import Trinfo
from vbmc_tpu.vp import VariationalPosterior


def save_vp(path: str, vp: VariationalPosterior, metadata: Optional[dict] = None):
    """Save a variational posterior to ``path`` (.npz)."""
    ti = vp.trinfo
    arrays = dict(
        w=np.asarray(vp.w), eta=np.asarray(vp.eta), mu=np.asarray(vp.mu),
        sigma=np.asarray(vp.sigma), lam=np.asarray(vp.lam),
        kmask=np.asarray(vp.kmask),
        tr_type=np.asarray(ti.type), tr_lb=np.asarray(ti.lb_orig),
        tr_ub=np.asarray(ti.ub_orig), tr_mu=np.asarray(ti.mu),
        tr_delta=np.asarray(ti.delta),
    )
    if ti.R_mat is not None:
        arrays["tr_R"] = np.asarray(ti.R_mat)
    if ti.scale is not None:
        arrays["tr_scale"] = np.asarray(ti.scale)
    meta = json.dumps(metadata or {})
    np.savez(path, _meta=np.frombuffer(meta.encode(), dtype=np.uint8),
             **arrays)


def load_vp(path: str):
    """Load a variational posterior; returns (vp, metadata dict)."""
    data = np.load(path)
    dtype = jnp.zeros(0).dtype
    ti = Trinfo(
        type=jnp.asarray(data["tr_type"]),
        lb_orig=jnp.asarray(data["tr_lb"], dtype=dtype),
        ub_orig=jnp.asarray(data["tr_ub"], dtype=dtype),
        mu=jnp.asarray(data["tr_mu"], dtype=dtype),
        delta=jnp.asarray(data["tr_delta"], dtype=dtype),
        # Identity rotoscale when absent: the pytree structure must match
        # freshly-created trinfos (kernel-cache stability; see transforms).
        R_mat=jnp.asarray(data["tr_R"], dtype=dtype) if "tr_R" in data
        else jnp.eye(int(np.asarray(data["tr_type"]).shape[0]), dtype=dtype),
        scale=jnp.asarray(data["tr_scale"], dtype=dtype) if "tr_scale" in data
        else jnp.ones(int(np.asarray(data["tr_type"]).shape[0]), dtype=dtype),
    )
    vp = VariationalPosterior(
        w=jnp.asarray(data["w"], dtype=dtype),
        eta=jnp.asarray(data["eta"], dtype=dtype),
        mu=jnp.asarray(data["mu"], dtype=dtype),
        sigma=jnp.asarray(data["sigma"], dtype=dtype),
        lam=jnp.asarray(data["lam"], dtype=dtype),
        kmask=jnp.asarray(data["kmask"]), trinfo=ti)
    meta = {}
    if "_meta" in data:
        meta = json.loads(bytes(data["_meta"]).decode())
    return vp, meta


def save_result(path: str, result):
    """Save a VBMCResult checkpoint: best VP + evaluations + run summary.

    The evaluation cache enables exact resumption via ``options.fvals`` /
    x0-matrix warm start (reference paths (a) and (b), `vbmc.m:417-424,
    447-450`)."""
    lg = result.logger
    n = lg.Xn
    meta = dict(elbo=result.elbo, elbo_sd=result.elbo_sd,
                exitflag=result.exitflag, message=result.message,
                func_count=result.func_count, iterations=result.iterations,
                convergence_status=result.convergence_status)
    ti = result.vp.trinfo
    arrays = dict(
        w=np.asarray(result.vp.w), eta=np.asarray(result.vp.eta),
        mu=np.asarray(result.vp.mu), sigma=np.asarray(result.vp.sigma),
        lam=np.asarray(result.vp.lam), kmask=np.asarray(result.vp.kmask),
        tr_type=np.asarray(ti.type), tr_lb=np.asarray(ti.lb_orig),
        tr_ub=np.asarray(ti.ub_orig), tr_mu=np.asarray(ti.mu),
        tr_delta=np.asarray(ti.delta),
        X_orig=lg.X_orig[:n], y_orig=lg.y_orig[:n],
        X_flag=lg.X_flag[:n], nevals=lg.nevals[:n],
        elbo_series=result.stats.series("elbo"),
        elbo_sd_series=result.stats.series("elbo_sd"),
        rindex_series=result.stats.series("rindex"),
    )
    if ti.R_mat is not None:
        arrays["tr_R"] = np.asarray(ti.R_mat)
    if ti.scale is not None:
        arrays["tr_scale"] = np.asarray(ti.scale)
    if lg.S is not None:
        arrays["S"] = lg.S[:n]
    np.savez(path, _meta=np.frombuffer(json.dumps(meta).encode(),
                                       dtype=np.uint8), **arrays)


def load_checkpoint(path: str):
    """Load a checkpoint; returns (vp, evals dict, metadata).

    ``evals`` has X_orig / y_orig (+S) suitable for seeding a new run:
    ``vbmc(fun, x0=evals["X_orig"], options=VBMCOptions(fvals=evals["y_orig"]))``.
    """
    vp, _ = load_vp(path)
    data = np.load(path)
    evals = dict(X_orig=data["X_orig"], y_orig=data["y_orig"],
                 X_flag=data["X_flag"], nevals=data["nevals"])
    if "S" in data:
        evals["S"] = data["S"]
    meta = json.loads(bytes(data["_meta"]).decode())
    return vp, evals, meta
