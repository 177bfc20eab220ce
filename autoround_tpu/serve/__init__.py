"""Quantized serving engine (new capability — SURVEY.md §7)."""

from .engine import KVCache, QuantizedLlama

__all__ = ["QuantizedLlama", "KVCache"]
