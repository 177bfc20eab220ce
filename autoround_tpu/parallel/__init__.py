"""Mesh parallelism (new capability vs reference — SURVEY.md §2.4)."""

from .distributed import (
    global_mesh,
    global_to_host_local,
    host_local_to_global,
    initialize,
    is_multiprocess,
    process_count,
    process_index,
    sync_across_hosts,
)
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
    "initialize", "is_multiprocess", "process_index", "process_count",
    "global_mesh", "host_local_to_global", "global_to_host_local",
    "sync_across_hosts",
]
