"""Prior toolbox: smooth box-type priors over bounded/unbounded variables
(cf. `shared/munifbox*.m`, `mtrapez*.m`, `msplinetrapez*.m`,
`msmoothbox*.m` — pdf/logpdf/rnd triplets), plus `log_post_fun`
(cf. `lpostfun.m`) for composing log-likelihood and log-prior.

All densities are separable across dimensions and vectorized over points.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_SQRT2PI = 2.5066282746310002


def _bc(a, D):
    a = jnp.atleast_1d(jnp.asarray(a, dtype=jnp.zeros(0).dtype))
    return jnp.broadcast_to(a, (D,))


# ----------------------------------------------------------------------
# Uniform box
# ----------------------------------------------------------------------

def unifbox_logpdf(x, a, b):
    """Uniform over the box [a, b] (cf. `munifboxpdf.m`)."""
    x = jnp.atleast_2d(x)
    D = x.shape[1]
    a, b = _bc(a, D), _bc(b, D)
    inside = jnp.all((x >= a) & (x <= b), axis=1)
    lp = -jnp.sum(jnp.log(b - a))
    return jnp.where(inside, lp, -jnp.inf)


def unifbox_rnd(key, n, a, b, D=None):
    if D is None:
        D = np.atleast_1d(a).shape[0]
    a, b = _bc(a, D), _bc(b, D)
    u = jax.random.uniform(key, (n, D), dtype=a.dtype)
    return a + u * (b - a)


# ----------------------------------------------------------------------
# Trapezoidal
# ----------------------------------------------------------------------

def trapez_logpdf(x, a, u, v, b):
    """Trapezoidal density: 0 at a/b, flat on [u, v]
    (cf. `mtrapezpdf.m`)."""
    x = jnp.atleast_2d(x)
    D = x.shape[1]
    a, u, v, b = (_bc(t, D) for t in (a, u, v, b))
    # Normalizer per dim: h * (v - u + 0.5*(u - a) + 0.5*(b - v)) = 1
    h = 1.0 / (0.5 * (u - a) + (v - u) + 0.5 * (b - v))
    lp_flat = jnp.log(h)
    lp_up = jnp.log(h) + jnp.log(jnp.maximum((x - a) / (u - a), 0.0))
    lp_dn = jnp.log(h) + jnp.log(jnp.maximum((b - x) / (b - v), 0.0))
    lp = jnp.where(x < u, lp_up, jnp.where(x > v, lp_dn, lp_flat))
    inside = (x >= a) & (x <= b)
    lp = jnp.where(inside, lp, -jnp.inf)
    return jnp.sum(lp, axis=1)


def trapez_rnd(key, n, a, u, v, b, D=None):
    if D is None:
        D = np.atleast_1d(a).shape[0]
    a_, u_, v_, b_ = (np.broadcast_to(np.atleast_1d(t).astype(float), (D,))
                      for t in (a, u, v, b))
    out = np.empty((n, D))
    keys = jax.random.split(key, D)
    for d in range(D):
        w = np.array([0.5 * (u_[d] - a_[d]), v_[d] - u_[d],
                      0.5 * (b_[d] - v_[d])])
        w = w / w.sum()
        kd1, kd2 = jax.random.split(keys[d])
        comp = np.asarray(jax.random.choice(kd1, 3, (n,), p=jnp.asarray(w)))
        uu = np.asarray(jax.random.uniform(kd2, (n, 2)))
        lo = uu[:, 0]
        tri_up = a_[d] + (u_[d] - a_[d]) * np.sqrt(lo)
        flat = u_[d] + (v_[d] - u_[d]) * lo
        tri_dn = b_[d] - (b_[d] - v_[d]) * np.sqrt(lo)
        out[:, d] = np.where(comp == 0, tri_up,
                             np.where(comp == 1, flat, tri_dn))
    return out


# ----------------------------------------------------------------------
# Smooth box (flat top with Gaussian tails)
# ----------------------------------------------------------------------

def smoothbox_logpdf(x, a, b, sigma):
    """Flat on [a, b], Gaussian falloff with scale sigma outside
    (cf. `msmoothboxpdf.m`)."""
    x = jnp.atleast_2d(x)
    D = x.shape[1]
    a, b, sigma = _bc(a, D), _bc(b, D), _bc(sigma, D)
    lnZ = jnp.log(b - a + sigma * _SQRT2PI)
    lo = -0.5 * ((x - a) / sigma) ** 2
    hi = -0.5 * ((x - b) / sigma) ** 2
    lp = jnp.where(x < a, lo, jnp.where(x > b, hi, 0.0)) - lnZ
    return jnp.sum(lp, axis=1)


def smoothbox_rnd(key, n, a, b, sigma, D=None):
    if D is None:
        D = np.atleast_1d(a).shape[0]
    a_, b_, s_ = (np.broadcast_to(np.atleast_1d(t).astype(float), (D,))
                  for t in (a, b, sigma))
    k1, k2, k3 = jax.random.split(key, 3)
    p_flat = (b_ - a_) / (b_ - a_ + s_ * _SQRT2PI)
    u = np.asarray(jax.random.uniform(k1, (n, D)))
    flat = a_ + np.asarray(jax.random.uniform(k2, (n, D))) * (b_ - a_)
    z = np.abs(np.asarray(jax.random.normal(k3, (n, D)))) * s_
    side = np.asarray(jax.random.uniform(jax.random.fold_in(k3, 1),
                                         (n, D))) < 0.5
    tail = np.where(side, a_ - z, b_ + z)
    return np.where(u < p_flat, flat, tail)


# ----------------------------------------------------------------------
# Spline-smoothed trapezoid (cubic easing on the ramps)
# ----------------------------------------------------------------------

def splinetrapez_logpdf(x, a, u, v, b):
    """Trapezoid with cubic-spline (smoothstep) ramps instead of linear
    (cf. `msplinetrapezpdf.m`)."""
    x = jnp.atleast_2d(x)
    D = x.shape[1]
    a, u, v, b = (_bc(t, D) for t in (a, u, v, b))
    # smoothstep s(t) = 3t^2 - 2t^3 integrates to 1/2 on [0,1]: same
    # normalizer as the linear trapezoid.
    h = 1.0 / (0.5 * (u - a) + (v - u) + 0.5 * (b - v))
    t_up = jnp.clip((x - a) / (u - a), 0.0, 1.0)
    t_dn = jnp.clip((b - x) / (b - v), 0.0, 1.0)
    s_up = t_up * t_up * (3.0 - 2.0 * t_up)
    s_dn = t_dn * t_dn * (3.0 - 2.0 * t_dn)
    val = jnp.where(x < u, s_up, jnp.where(x > v, s_dn, 1.0))
    inside = (x >= a) & (x <= b)
    lp = jnp.where(inside & (val > 0), jnp.log(jnp.maximum(val, 1e-300))
                   + jnp.log(h), -jnp.inf)
    return jnp.sum(lp, axis=1)


# ----------------------------------------------------------------------
# Log-joint composition
# ----------------------------------------------------------------------

def log_post_fun(x, log_likelihood, log_prior=None):
    """Compose an unnormalized log posterior (cf. `lpostfun.m`)."""
    ll = log_likelihood(x)
    if log_prior is not None:
        ll = ll + log_prior(x)
    return ll
