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

COV_SEARD = 1
COV_MATERN5 = 3


@dataclasses.dataclass(frozen=True)
class GPConfig:
    D: int
    covfun: int = COV_SEARD
    meanfun: int = MEAN_NEGQUAD
    # Noise feature flags, as in `gplite/gplite_noisefun.m`:
    #  const_noise in {0,1}; user_noise in {0,1,2}; output_noise in {0,1}
    const_noise: int = 1
    user_noise: int = 0
    output_noise: int = 0

    @property
    def ncov(self) -> int:
        return self.D + 1

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
        raise ValueError(f"unsupported meanfun {self.meanfun}")

    @property
    def nhyp(self) -> int:
        return self.ncov + self.nnoise + self.nmean

    # --- slices into the hyp vector -------------------------------------
    @property
    def sl_log_ell(self):
        return slice(0, self.D)

    @property
    def idx_log_sf(self):
        return self.D

    @property
    def sl_noise(self):
        return slice(self.ncov, self.ncov + self.nnoise)

    @property
    def sl_mean(self):
        return slice(self.ncov + self.nnoise, self.nhyp)
