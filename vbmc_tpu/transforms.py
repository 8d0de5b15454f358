"""Parameter-space transforms (constrained <-> unconstrained) for VBMC-TPU.

TPU-native re-design of the reference transform layer
(``shared/warpvars_vbmc.m``): instead of a per-dimension switch statement
dispatching on the transform type, every transform family is evaluated
branchlessly on safe inputs and the result is selected with ``jnp.where`` on
a per-dimension type code.  This keeps the whole map jit/vmap-compatible with
static shapes, so it can be fused into acquisition sweeps and density
evaluations on-device.

Transform types (per dimension), matching the reference semantics
(`warpvars_vbmc.m:77-110, 463-503, 856-920`):

  0  unbounded:            y = (x - mu) / delta              (affine recenter)
  1  lower-bounded:        y = log(x - a)
  2  upper-bounded:        y = log(b - x)
  3  bounded (logit):      y = (logit((x-a)/(b-a)) - mu) / delta
  12 bounded (probit):     y = (norminv((x-a)/(b-a)) - mu) / delta
  13 bounded (student-t4): y = (t4inv((x-a)/(b-a)) - mu) / delta

After the per-dimension scalar maps, an optional affine "rotoscale" stage is
applied (`warpvars_vbmc.m:274,288,469`): y' = (y @ R) / scale, used by the
input-warping subsystem.

The log-Jacobian convention follows the reference 'logprob' action: for a
density p_orig on X, the transformed log density is
``log p_orig(x(y)) + log_abs_det_jacobian(trinfo, y)``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri, ndtr


class Trinfo(NamedTuple):
    """Transform description; a pytree of per-dimension arrays.

    ``R_mat``/``scale`` are ``None`` until an input warp installs them.
    """

    type: jnp.ndarray          # (D,) int32 type codes
    lb_orig: jnp.ndarray       # (D,) original-space lower bounds
    ub_orig: jnp.ndarray       # (D,) original-space upper bounds
    mu: jnp.ndarray            # (D,) affine center (types 0, 3, 12, 13)
    delta: jnp.ndarray         # (D,) affine scale  (types 0, 3, 12, 13)
    R_mat: Optional[jnp.ndarray] = None   # (D,D) rotation (orthogonal)
    scale: Optional[jnp.ndarray] = None   # (D,) post-rotation scaling

    @property
    def ndim(self) -> int:
        return self.type.shape[0]


LOGIT, PROBIT, STUDENT4 = 3, 12, 13

_TINY = 1e-300


def _t4_cdf(u):
    """CDF of Student's t with nu=4: F(u) = 1/2 + s(3 - s^2)/4, s=u/sqrt(u^2+4)."""
    s = u / jnp.sqrt(u * u + 4.0)
    return 0.5 + 0.25 * s * (3.0 - s * s)


def _t4_icdf(p):
    """Inverse CDF of Student's t with nu=4 (closed form, Shaw 2006)."""
    # alpha = 4 p (1 - p); q = cos(arccos(sqrt(alpha))/3)/sqrt(alpha)
    p = jnp.clip(p, _TINY, 1.0 - 1e-16)
    alpha = 4.0 * p * (1.0 - p)
    sqrt_alpha = jnp.sqrt(alpha)
    q = jnp.cos(jnp.arccos(sqrt_alpha) / 3.0) / sqrt_alpha
    return jnp.sign(p - 0.5) * 2.0 * jnp.sqrt(q - 1.0)


def create_trinfo(lb, ub, plb=None, pub=None, bounded_type: int = LOGIT,
                  dtype=None) -> Trinfo:
    """Build a :class:`Trinfo` from bounds (host-side setup code).

    Mirrors the constructor logic of `warpvars_vbmc.m:856-920`: the type per
    dimension is inferred from bound finiteness, and the affine recentering
    (mu, delta) is set from the *transformed* plausible box.
    """
    lb = np.asarray(lb, dtype=np.float64).ravel()
    ub = np.asarray(ub, dtype=np.float64).ravel()
    D = lb.shape[0]
    if plb is None:
        plb = lb.copy()
    if pub is None:
        pub = ub.copy()
    plb = np.asarray(plb, dtype=np.float64).ravel()
    pub = np.asarray(pub, dtype=np.float64).ravel()

    if not np.all((lb <= plb) & (plb < pub) & (pub <= ub)):
        raise ValueError("Bounds must satisfy LB <= PLB < PUB <= UB.")

    types = np.zeros(D, dtype=np.int32)
    types[np.isfinite(lb) & ~np.isfinite(ub)] = 1
    types[~np.isfinite(lb) & np.isfinite(ub)] = 2
    types[np.isfinite(lb) & np.isfinite(ub)] = bounded_type

    if dtype is None:
        dtype = jnp.zeros(0).dtype  # respects jax_enable_x64

    base = Trinfo(
        type=jnp.asarray(types),
        lb_orig=jnp.asarray(lb, dtype=dtype),
        ub_orig=jnp.asarray(ub, dtype=dtype),
        mu=jnp.zeros(D, dtype=dtype),
        delta=jnp.ones(D, dtype=dtype),
    )

    # Center in transformed space using the plausible box.
    tplb = np.asarray(direct(base, jnp.asarray(plb, dtype=dtype)[None, :]))[0]
    tpub = np.asarray(direct(base, jnp.asarray(pub, dtype=dtype)[None, :]))[0]
    mu = np.zeros(D)
    delta = np.ones(D)
    ok = np.isfinite(tplb) & np.isfinite(tpub)
    mu[ok] = 0.5 * (tplb[ok] + tpub[ok])
    delta[ok] = tpub[ok] - tplb[ok]

    return base._replace(mu=jnp.asarray(mu, dtype=dtype),
                         delta=jnp.asarray(delta, dtype=dtype))


def _safe_bounds(trinfo: Trinfo):
    t = trinfo.type
    a = jnp.where(jnp.isfinite(trinfo.lb_orig), trinfo.lb_orig, 0.0)
    b = jnp.where(jnp.isfinite(trinfo.ub_orig), trinfo.ub_orig, 1.0)
    b = jnp.where(b > a, b, a + 1.0)
    return t, a, b


def direct(trinfo: Trinfo, x: jnp.ndarray) -> jnp.ndarray:
    """Map original-space points ``x`` (..., D) to unconstrained space."""
    t, a, b = _safe_bounds(trinfo)
    mu, delta = trinfo.mu, trinfo.delta

    y0 = (x - mu) / delta
    # Guard logs with clipping; exact-boundary inputs map to -/+inf naturally.
    y1 = jnp.log(jnp.maximum(x - a, _TINY))
    y2 = jnp.log(jnp.maximum(b - x, _TINY))

    z = jnp.clip((x - a) / (b - a), _TINY, 1.0 - 1e-16)
    u_logit = jnp.log(z) - jnp.log1p(-z)
    u_probit = ndtri(z)
    u_t4 = _t4_icdf(z)
    u = jnp.where(t == LOGIT, u_logit,
                  jnp.where(t == PROBIT, u_probit, u_t4))
    y3 = (u - mu) / delta

    y = jnp.where(t == 0, y0, jnp.where(t == 1, y1,
                                        jnp.where(t == 2, y2, y3)))

    if trinfo.R_mat is not None:
        y = y @ trinfo.R_mat
    if trinfo.scale is not None:
        y = y / trinfo.scale
    return y


def _unrotate(trinfo: Trinfo, y: jnp.ndarray) -> jnp.ndarray:
    """Undo the rotoscale stage, returning per-dimension scalar coords."""
    if trinfo.scale is not None:
        y = y * trinfo.scale
    if trinfo.R_mat is not None:
        y = y @ trinfo.R_mat.T
    return y


def inverse(trinfo: Trinfo, y: jnp.ndarray) -> jnp.ndarray:
    """Map unconstrained points ``y`` (..., D) back to original space."""
    t, a, b = _safe_bounds(trinfo)
    mu, delta = trinfo.mu, trinfo.delta
    y = _unrotate(trinfo, y)

    x0 = mu + delta * y
    x1 = a + jnp.exp(y)
    x2 = b - jnp.exp(y)

    u = y * delta + mu
    z_logit = jax.nn.sigmoid(u)
    z_probit = ndtr(u)
    z_t4 = _t4_cdf(u)
    z = jnp.where(t == LOGIT, z_logit,
                  jnp.where(t == PROBIT, z_probit, z_t4))
    x3 = a + (b - a) * z

    x = jnp.where(t == 0, x0, jnp.where(t == 1, x1,
                                        jnp.where(t == 2, x2, x3)))
    # Clamp bounded dims inside their hard bounds (numerical safety).
    bounded = (t == LOGIT) | (t == PROBIT) | (t == STUDENT4)
    x = jnp.where(bounded, jnp.clip(x, a, b), x)
    return x


def log_abs_det_jacobian(trinfo: Trinfo, y: jnp.ndarray) -> jnp.ndarray:
    """log |dx/dy| summed over dimensions, evaluated at unconstrained ``y``.

    This is the reference 'logprob' correction (`warpvars_vbmc.m:463-503`):
    the transformed-space log density is the original log density plus this.
    """
    t, a, b = _safe_bounds(trinfo)
    mu, delta = trinfo.mu, trinfo.delta
    y_s = _unrotate(trinfo, y)

    p0 = jnp.log(delta) * jnp.ones_like(y_s)
    p12 = y_s  # types 1 and 2: log|dx/dy| = y

    u = y_s * delta + mu
    lab = jnp.log(b - a)
    p_logit = lab - jax.nn.softplus(u) - jax.nn.softplus(-u) + jnp.log(delta)
    p_probit = lab - 0.5 * jnp.log(2 * jnp.pi) - 0.5 * u * u + jnp.log(delta)
    p_t4 = (lab + jnp.log(3.0 / 8.0) - 2.5 * jnp.log1p(u * u / 4.0)
            + jnp.log(delta))
    p3 = jnp.where(t == LOGIT, p_logit,
                   jnp.where(t == PROBIT, p_probit, p_t4))

    p = jnp.where(t == 0, p0, jnp.where((t == 1) | (t == 2), p12, p3))
    if trinfo.scale is not None:
        p = p + jnp.log(trinfo.scale)
    return jnp.sum(p, axis=-1)


def pdf_correction(trinfo: Trinfo, y: jnp.ndarray) -> jnp.ndarray:
    """|dx/dy| multiplier (the reference 'prob' action)."""
    return jnp.exp(log_abs_det_jacobian(trinfo, y))


def real_to_int(trinfo: Trinfo, y: jnp.ndarray,
                integer_mask: jnp.ndarray) -> jnp.ndarray:
    """Round integer dimensions through the transform
    (cf. `misc/real2int_vbmc.m`): map to original space, round the flagged
    dims, map back."""
    if integer_mask is None or not bool(np.any(np.asarray(integer_mask))):
        return y
    x = inverse(trinfo, y)
    x = jnp.where(jnp.asarray(integer_mask)[None, :], jnp.round(x), x)
    return direct(trinfo, x)
