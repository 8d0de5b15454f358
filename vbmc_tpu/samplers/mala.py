"""Metropolis-adjusted Langevin (MALA) sampler with step-size adaptation
(cf. `utils/malasample_vbmc.m`). jit-native: fixed-length `lax.scan` with
acceptance-rate-driven step adaptation; chains vmap cleanly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def mala_sample(key, logpdf_and_grad: Callable, x0, n_samples: int,
                step0: float = 0.1, burn: int = 0, thin: int = 1,
                target_accept: float = 0.574, adapt_rate: float = 0.05):
    """Run one MALA chain; returns (samples (n_samples, D), logps,
    final_step).

    ``logpdf_and_grad(x) -> (logp, grad)`` must be pure JAX.
    """
    D = x0.shape[0]
    dtype = x0.dtype
    total = burn + n_samples * thin

    def step(carry, k):
        x, lp, g, eps = carry
        k1, k2 = jax.random.split(k)
        noise = jax.random.normal(k1, (D,), dtype=dtype)
        prop = x + 0.5 * eps ** 2 * g + eps * noise
        lp_p, g_p = logpdf_and_grad(prop)
        # Proposal densities q(prop|x), q(x|prop).
        fwd = -jnp.sum((prop - x - 0.5 * eps ** 2 * g) ** 2) / (2 * eps ** 2)
        rev = -jnp.sum((x - prop - 0.5 * eps ** 2 * g_p) ** 2) / (2 * eps ** 2)
        log_alpha = lp_p + rev - lp - fwd
        accept = jnp.log(jax.random.uniform(k2, dtype=dtype)) < log_alpha
        ok = accept & jnp.all(jnp.isfinite(g_p)) & jnp.isfinite(lp_p)
        x = jnp.where(ok, prop, x)
        lp = jnp.where(ok, lp_p, lp)
        g = jnp.where(ok, g_p, g)
        eps = eps * jnp.exp(adapt_rate * (ok.astype(dtype) - target_accept))
        eps = jnp.clip(eps, 1e-6, 1e3)
        return (x, lp, g, eps), (x, lp)

    lp0, g0 = logpdf_and_grad(x0)
    keys = jax.random.split(key, total)
    (xf, lpf, _, eps_f), (xs, lps) = jax.lax.scan(
        step, (x0, lp0, g0, jnp.asarray(step0, dtype=dtype)), keys)
    sel = burn + thin * jnp.arange(n_samples) + (thin - 1)
    return xs[sel], lps[sel], eps_f
