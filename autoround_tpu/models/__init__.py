"""Minimal TPU model zoo (role of the reference's reliance on HF torch
models + ``utils/model.py`` block discovery — here the framework owns the
model definitions as pure functions)."""

from . import llama
from .llama import CONFIG_PRESETS, LlamaConfig

__all__ = ["llama", "LlamaConfig", "CONFIG_PRESETS"]
