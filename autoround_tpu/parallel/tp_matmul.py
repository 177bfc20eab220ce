"""Tensor-parallel W4A16 matmul via shard_map.

The serving-side TP building block (SURVEY §2.4 "tensor-sharded serving"):
packed int4 weights shard across the ``tp`` mesh axis and each device runs
the fused Pallas kernel on its local shard — shard_map gives the kernel
concrete per-shard shapes (pallas_call does not partition under GSPMD),
and the collectives are explicit:

  * column-parallel (q/k/v/gate/up): qweight sharded on O; outputs stay
    feature-sharded (no collective — the Megatron pattern defers the psum
    to the row-parallel partner).
  * row-parallel (o_proj/down_proj): qweight sharded on K, activations
    feature-sharded to match; one ``psum`` over ``tp`` completes the sum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.qmatmul import w4a16_matmul

__all__ = ["w4a16_matmul_col_tp", "w4a16_matmul_row_tp", "shard_packed"]


def shard_packed(qweight, scales, mesh: Mesh, parallel: str):
    """device_put a packed layer with the right TP sharding."""
    if parallel == "col":
        wspec, sspec = P("tp", None), P("tp", None)
    elif parallel == "row":
        wspec, sspec = P(None, "tp"), P(None, "tp")
    else:
        raise ValueError(parallel)
    return (jax.device_put(qweight, NamedSharding(mesh, wspec)),
            jax.device_put(scales, NamedSharding(mesh, sspec)))


def w4a16_matmul_col_tp(x, qweight, scales, group_size: int, mesh: Mesh):
    """Column-parallel: out features sharded over tp; x replicated."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P("tp", None), P("tp", None)),
             out_specs=P(None, "tp"), check_vma=False)
    def f(xx, qw, s):
        return w4a16_matmul(xx, qw, s, group_size)

    return f(x, qweight, scales)


def w4a16_matmul_row_tp(x, qweight, scales, group_size: int, mesh: Mesh):
    """Row-parallel: in features sharded over tp (x arrives
    feature-sharded from a column-parallel producer); psum completes."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "tp"), P(None, "tp"), P(None, "tp")),
             out_specs=P(), check_vma=False)
    def f(xx, qw, s):
        y = w4a16_matmul(xx, qw, s, group_size)
        return jax.lax.psum(y, "tp")

    return f(x, qweight, scales)
