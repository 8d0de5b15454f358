"""K-means clustering (cf. `utils/fastkmeans.m`), used to thin oversized
starting caches in the initial design (`initdesign_vbmc.m:30-45`).
Batched Lloyd iterations under jit."""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "n_iter"))
def _lloyd(X, init_idx, k: int, n_iter: int):
    centers = X[init_idx]

    def step(centers, _):
        d2 = (jnp.sum(X * X, 1)[:, None] + jnp.sum(centers * centers, 1)[None, :]
              - 2.0 * X @ centers.T)
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=X.dtype)
        counts = jnp.maximum(one_hot.sum(0), 1.0)
        centers_new = (one_hot.T @ X) / counts[:, None]
        # Keep empty clusters where they were.
        centers_new = jnp.where((one_hot.sum(0) > 0)[:, None], centers_new,
                                centers)
        return centers_new, None

    centers, _ = jax.lax.scan(step, centers, None, length=n_iter)
    d2 = (jnp.sum(X * X, 1)[:, None] + jnp.sum(centers * centers, 1)[None, :]
          - 2.0 * X @ centers.T)
    return centers, jnp.argmin(d2, axis=1)


def kmeans(X: np.ndarray, k: int, n_iter: int = 25, seed: int = 0):
    """Returns (centers (k, D), assignments (n,))."""
    X = np.asarray(X, float)
    rng = np.random.default_rng(seed)
    # k-means++-style greedy seeding.
    idx = [rng.integers(X.shape[0])]
    for _ in range(k - 1):
        d2 = np.min(((X[:, None, :] - X[idx][None, :, :]) ** 2).sum(-1),
                    axis=1)
        p = d2 / max(d2.sum(), 1e-300)
        idx.append(rng.choice(X.shape[0], p=p))
    centers, assign = _lloyd(jnp.asarray(X), jnp.asarray(np.asarray(idx)),
                             k, n_iter)
    return np.asarray(centers), np.asarray(assign)
