from vbmc_tpu.gp.config import GPConfig
from vbmc_tpu.gp.gp import GP, HypPrior
from vbmc_tpu.gp.core import (
    gram_matrix,
    build_posterior,
    neg_log_marginal_likelihood,
    hyperprior_logpdf,
)
from vbmc_tpu.gp.predict import gp_predict, gp_predict_full
from vbmc_tpu.gp.fit import train_gp, TrainOptions

__all__ = [
    "GPConfig",
    "GP",
    "HypPrior",
    "gram_matrix",
    "build_posterior",
    "neg_log_marginal_likelihood",
    "hyperprior_logpdf",
    "gp_predict",
    "gp_predict_full",
    "train_gp",
    "TrainOptions",
]
