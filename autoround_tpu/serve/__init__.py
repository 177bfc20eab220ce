"""Quantized serving engine (new capability — SURVEY.md §7)."""

from .engine import KVCache, QuantizedLlama
from .sampling import SamplingParams
from .tp_engine import TPQuantizedLlama

__all__ = ["QuantizedLlama", "KVCache", "TPQuantizedLlama",
           "SamplingParams"]
