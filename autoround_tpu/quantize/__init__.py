"""Quantization orchestration (role of reference ``auto_round/compressors/``)."""

from .layer_config import resolve_layer_schemes
from .orchestrator import (
    QuantizeConfig,
    QuantizedLayer,
    QuantizeResult,
    quantize_model,
)

__all__ = [
    "QuantizeConfig", "QuantizeResult", "QuantizedLayer", "quantize_model",
    "resolve_layer_schemes",
]
