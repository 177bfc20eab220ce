"""Quantization algorithms (role of reference ``auto_round/algorithms/``)."""

from .rtn import rtn_quantize_layer
from .signround import (
    TuneConfig,
    init_tune_params,
    make_qdq_weights,
    mse_loss,
    tune_block,
)
from .signsgd import linear_decay_schedule, sign_sgd

__all__ = [
    "TuneConfig", "tune_block", "init_tune_params", "make_qdq_weights",
    "mse_loss", "sign_sgd", "linear_decay_schedule", "rtn_quantize_layer",
]
