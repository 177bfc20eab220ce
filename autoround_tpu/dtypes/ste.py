"""Straight-through estimators (STE) as pure JAX.

The reference implements these as torch autograd tricks
(``auto_round/data_type/utils.py:313-427``); under JAX the identical math is
``x + stop_gradient(f(x) - x)``, which XLA fuses into the surrounding
computation for free — no custom_vjp indirection needed for the simple
cases.  ``stop_gradient`` is the canonical functional STE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "round_ste",
    "floor_ste",
    "ceil_ste",
    "clip_ste",
    "cast_ste",
]


def round_ste(x: jax.Array) -> jax.Array:
    """round-to-nearest-even with identity gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def floor_ste(x: jax.Array) -> jax.Array:
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def ceil_ste(x: jax.Array) -> jax.Array:
    return x + jax.lax.stop_gradient(jnp.ceil(x) - x)


def clip_ste(x: jax.Array, lo, hi) -> jax.Array:
    """clamp with identity gradient everywhere (unlike jnp.clip whose grad
    is zero outside the range) — matches the reference's clamp_ste used so
    tuning signals still flow for saturated elements."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


def cast_ste(x: jax.Array, dtype) -> jax.Array:
    """Cast to a low-precision float dtype and back, identity gradient.

    Used for FP8 (e4m3/e5m2) simulation: the roundtrip through the narrow
    dtype performs hardware-faithful round-to-nearest-even + saturation
    semantics of XLA's convert.
    """
    y = x.astype(dtype).astype(x.dtype)
    return x + jax.lax.stop_gradient(y - x)
