"""Static GP model configuration.

The configuration is a hashable frozen dataclass passed as a static argument
to jitted functions; all shape/layout decisions derive from it.

Hyperparameter vector layout (matching the reference convention,
`gplite/gplite_train.m` docstring):

    [ log ell (D) | log sf (1) | noise hyps (Nnoise) | mean hyps (Nmean) ]
"""

from __future__ import annotations

import dataclasses


MEAN_ZERO = 0
MEAN_CONST = 1
MEAN_NEGQUAD = 4
MEAN_SE = 6
MEAN_NEGQUADSE = 8        # negquad + SE bump (cf. gplite_meanfun.m:456-480)
MEAN_NEGQUADFIXISO = 10   # fixed center, isotropic scale (:485-495)
MEAN_NEGQUADFIX = 12      # fixed center, per-dim scale (:496-506)
MEAN_NEGQUADSEFIX = 14    # fixed-center quad + constrained SE bump (:507-526)
MEAN_NEGQUADONLY = 16     # -1/2 sum (x/omega)^2, no offset (:524-530)
MEAN_NEGQUADFIXONLY = 18  # fixed center, per-dim scale, no offset (:536-544)
MEAN_NEGQUADLINONLY = 20  # -1/2 sum ((x-xm)/omega)^2, no offset (:541-550)
MEAN_NEGQUADMIX = 22      # mixture of inner/outer quadratics (:552-572)

# Families whose center is supplied externally (`meanfun_extras` in the
# reference, `gplite_meanfun.m:334-341`) rather than fit as hyperparameters.
FIXED_CENTER_MEANFUNS = (MEAN_NEGQUADFIXISO, MEAN_NEGQUADFIX,
                         MEAN_NEGQUADSEFIX, MEAN_NEGQUADFIXONLY)

# Covariance ids follow the reference numbering (`gplite_covfun.m:77-91`):
# 0 'seiso' (2 hyps), 1 'se' ard (D+1), 3 'matern' ard with degree
# nu in {1,3,5} carried in `GPConfig.cov_nu` (the reference's covfeat).
COV_SEISO = 0
COV_SEARD = 1
COV_MATERN = 3
COV_MATERN5 = COV_MATERN  # legacy alias (cov_nu defaults to 5)

# Integrated (exactly marginalized) Bayesian-linear mean basis
# (cf. `gplite/gplite_intmeanfun.m`): 0 off, 1 const, 2 linear,
# 3 quadratic (diagonal), 4 full quadratic.
INTMEAN_NONE = 0
INTMEAN_CONST = 1
INTMEAN_LINEAR = 2
INTMEAN_QUAD = 3
INTMEAN_FULLQUAD = 4

# Output warps (cf. `gplite/outwarp_*.m`); ids match gp/outwarp.py.
OUTWARP_NONE = 0
OUTWARP_NEGPOW = 1
OUTWARP_NEGPOWC1 = 2
OUTWARP_NEGSCALEDPOW = 3


@dataclasses.dataclass(frozen=True)
class GPConfig:
    D: int
    covfun: int = COV_SEARD
    # Matérn degree (the reference's covfeat, `gplite_covfun.m:195-201`);
    # only consulted when covfun == COV_MATERN.
    cov_nu: int = 5
    meanfun: int = MEAN_NEGQUAD
    # Noise feature flags, as in `gplite/gplite_noisefun.m`:
    #  const_noise in {0,1}; user_noise in {0,1,2}; output_noise in {0,1}
    const_noise: int = 1
    user_noise: int = 0
    output_noise: int = 0
    # Integrated Bayesian-linear mean basis (exact marginalization under a
    # vague coefficient prior); composes additively with `meanfun`.
    intmean: int = INTMEAN_NONE
    # Output warp ("fitness shaping") applied to the observations.
    outwarp: int = OUTWARP_NONE
    # Fixed mean-function center for the FIXED_CENTER_MEANFUNS families
    # (the reference's per-fit `meanfun_extras`, `gplite_meanfun.m:334-341`).
    # Static by design: the center is a per-fit constant folded into the
    # compiled kernels; use `gp.means.fix_center_from_data` to compute the
    # reference default (the incumbent X[argmax y]).
    fix_center: tuple = ()

    @property
    def n_ell(self) -> int:
        """Number of length-scale hyperparameters (1 for iso kernels)."""
        return 1 if self.covfun == COV_SEISO else self.D

    @property
    def ncov(self) -> int:
        return self.n_ell + 1

    @property
    def nnoise(self) -> int:
        n = 0
        if self.const_noise == 1:
            n += 1
        if self.user_noise == 2:
            n += 1
        if self.output_noise == 1:
            n += 2
        return n

    @property
    def nmean(self) -> int:
        if self.meanfun == MEAN_ZERO:
            return 0
        if self.meanfun == MEAN_CONST:
            return 1
        if self.meanfun == MEAN_NEGQUAD:
            return 1 + 2 * self.D
        if self.meanfun == MEAN_SE:
            return 2 + 2 * self.D
        if self.meanfun == MEAN_NEGQUADSE:
            return 2 + 4 * self.D
        if self.meanfun == MEAN_NEGQUADFIXISO:
            return 2
        if self.meanfun == MEAN_NEGQUADFIX:
            return 1 + self.D
        if self.meanfun == MEAN_NEGQUADSEFIX:
            return 3 + self.D
        if self.meanfun == MEAN_NEGQUADONLY:
            return self.D
        if self.meanfun == MEAN_NEGQUADFIXONLY:
            return self.D
        if self.meanfun == MEAN_NEGQUADLINONLY:
            return 2 * self.D
        if self.meanfun == MEAN_NEGQUADMIX:
            return 4 + 2 * self.D
        raise ValueError(f"unsupported meanfun {self.meanfun}")

    @property
    def nint(self) -> int:
        """Number of integrated-mean basis functions."""
        if self.intmean == INTMEAN_NONE:
            return 0
        if self.intmean == INTMEAN_CONST:
            return 1
        if self.intmean == INTMEAN_LINEAR:
            return 1 + self.D
        if self.intmean == INTMEAN_QUAD:
            return 1 + 2 * self.D
        if self.intmean == INTMEAN_FULLQUAD:
            return 1 + 2 * self.D + (self.D * (self.D - 1)) // 2
        raise ValueError(f"unsupported intmean {self.intmean}")

    @property
    def noutwarp(self) -> int:
        if self.outwarp == OUTWARP_NONE:
            return 0
        if self.outwarp in (OUTWARP_NEGPOW, OUTWARP_NEGPOWC1):
            return 2
        if self.outwarp == OUTWARP_NEGSCALEDPOW:
            return 3
        raise ValueError(f"unsupported outwarp {self.outwarp}")

    @property
    def nhyp(self) -> int:
        return self.ncov + self.nnoise + self.nmean + self.noutwarp

    # --- slices into the hyp vector -------------------------------------
    @property
    def sl_log_ell(self):
        return slice(0, self.n_ell)

    @property
    def idx_log_sf(self):
        return self.n_ell

    @property
    def sl_noise(self):
        return slice(self.ncov, self.ncov + self.nnoise)

    @property
    def sl_mean(self):
        return slice(self.ncov + self.nnoise,
                     self.ncov + self.nnoise + self.nmean)

    @property
    def sl_outwarp(self):
        return slice(self.ncov + self.nnoise + self.nmean, self.nhyp)
