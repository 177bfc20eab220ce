"""Data-parallel calibration tuning: explicit psum of gradients over `dp`.

Role of the reference's DDP grad averaging (``utils/distributed.py:30-125``
``setup_ddp_if_needed_`` / ``_all_reduce_model_grads`` with
``ReduceOp.AVG``; called from ``sign_round/quantizer.py:427``), done the
XLA way: calibration batches shard over the ``dp`` mesh axis and gradients
``psum`` over ICI before the sign is taken.  The reference documents why
AVG vs SUM is immaterial here — ``sign(avg g) == sign(sum g)`` — which
also licenses low-precision reduction; we psum in fp32.

Two paths exist:

  * implicit (default): ``tune_block`` runs under jit with dp-sharded
    input arrays and replicated params — GSPMD inserts the same psum
    automatically.  ``tests/test_parallel.py`` pins the equivalence.
  * explicit (this module): a ``shard_map`` step where the collective is
    written out, for the multi-host path where explicitness matters.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["dp_grad_step", "shard_calib_data"]


def shard_calib_data(mesh: Mesh, *arrays):
    """Place calibration arrays with samples sharded over dp."""
    out = []
    for a in arrays:
        spec = P("dp", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out if len(out) > 1 else out[0]


def dp_grad_step(
    loss_fn: Callable[[Dict[str, Any], jax.Array, jax.Array], jax.Array],
    mesh: Mesh,
):
    """Build an explicit-psum (loss, grads) step.

    ``loss_fn(params, batch_in, batch_ref) -> scalar``; the returned step
    takes dp-sharded batches and replicated params, computes per-shard
    grads, and psums both loss and grads over ``dp``.
    """

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(params, batch_in, batch_ref):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch_in, batch_ref)
        n = jax.lax.psum(1, "dp")
        loss = jax.lax.psum(loss, "dp") / n
        # sign(sum g) == sign(avg g): no division needed before sign,
        # but keep grads in avg form so loss scales match the local path
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "dp") / n, grads)
        return loss, grads

    return jax.jit(step)
