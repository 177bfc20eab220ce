"""Mesh parallelism (new capability vs reference — SURVEY.md §2.4)."""

from .mesh import (
    block_param_sharding,
    block_weight_specs,
    data_spec,
    make_mesh,
    shard_block,
    tune_param_specs,
)

__all__ = [
    "make_mesh", "block_weight_specs", "tune_param_specs", "data_spec",
    "block_param_sharding", "shard_block",
]
