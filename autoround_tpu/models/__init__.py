"""Minimal TPU model zoo (role of the reference's reliance on HF torch
models + ``utils/model.py`` block discovery — here the framework owns the
model definitions as pure functions)."""

from . import llama, mixtral
from .llama import CONFIG_PRESETS, LlamaConfig
from .mixtral import MixtralConfig
from .registry import ALL_PRESETS, get_model_fns

__all__ = ["llama", "mixtral", "LlamaConfig", "MixtralConfig",
           "CONFIG_PRESETS", "ALL_PRESETS", "get_model_fns"]
