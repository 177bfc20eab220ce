"""Group reshape / padding helpers.

Role of the reference's ``auto_round/data_type/utils.py:28-101`` (1-D and
2-D tuple group reshape with padding), re-done with static shapes so every
path is jit-compatible: the pad amount is a Python int derived from the
(static) array shape, never a traced value.

Canonical quantization layout is ``(out_features, in_features)`` with
grouping along the **last** (input-channel) axis, matching the reference's
semantics.  Model code holding JAX-convention ``(in, out)`` kernels
transposes before calling in (XLA folds the transpose into the consumer).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

GroupSize = Union[int, Tuple[int, int]]

__all__ = ["resolve_group_size", "to_groups", "from_groups", "group_shape_2d"]


def resolve_group_size(group_size: int, in_features: int) -> int:
    """-1 → per-channel (whole row), 0 → per-tensor is handled by caller."""
    if group_size == -1:
        return in_features
    if group_size == 0:
        raise ValueError("per-tensor grouping has no row group size")
    return min(group_size, in_features)


def to_groups(w: jax.Array, group_size: int) -> Tuple[jax.Array, int]:
    """Reshape (O, I) → (O * ceil(I/g), g), zero-padding the tail group.

    Returns (grouped, pad) where pad is the number of zero columns added.
    Static-shape only: pad is a Python int.
    """
    assert w.ndim == 2, f"expected 2-D weight, got {w.shape}"
    O, I = w.shape
    g = resolve_group_size(group_size, I)
    pad = (-I) % g
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    return w.reshape(-1, g), pad


def from_groups(wg: jax.Array, orig_shape: Tuple[int, int], pad: int) -> jax.Array:
    """Inverse of :func:`to_groups`."""
    O, I = orig_shape
    w = wg.reshape(O, I + pad)
    if pad:
        w = w[:, :I]
    return w


def group_shape_2d(w_shape: Tuple[int, int], block: Tuple[int, int]) -> Tuple[int, int]:
    """Number of (row, col) blocks for 2-D block quantization (FP8_BLOCK)."""
    br, bc = block
    O, I = w_shape
    return (-(-O // br), -(-I // bc))
