"""Token sampling for the serving engines: temperature / top-k / top-p
with a seeded PRNG key.

The reference ships no serving engine (its inference side delegates to
vLLM/HF generate), so there is no counterpart file; the parameter
semantics follow the de-facto standard (vLLM ``SamplingParams``):

  * ``temperature == 0`` → greedy argmax (the default everywhere);
  * ``temperature > 0``  → logits / temperature;
  * ``top_k > 0``        → keep the k highest logits;
  * ``top_p < 1``        → keep the smallest prefix of the
    descending-probability distribution whose mass ≥ top_p (the head
    token always survives);
  * sampling is ``jax.random.categorical`` under an explicit key —
    same key, same tokens (determinism tests rely on this).

All ops are jit-safe with STATIC ``top_k`` (lax.top_k needs a static
k); temperature/top_p ride as traced scalars so one compiled executable
serves any setting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample_token"]


@dataclass(frozen=True)
class SamplingParams:
    """Hashable (usable as part of a jit cache key)."""

    temperature: float = 0.0     # 0 → greedy
    top_k: int = 0               # 0 → no top-k truncation (static)
    top_p: float = 1.0           # 1 → no nucleus truncation
    seed: int = 0

    @property
    def is_greedy(self) -> bool:
        return self.temperature <= 0.0


def _mask_top_k(logits: jax.Array, k: int) -> jax.Array:
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _mask_top_p(logits: jax.Array, top_p) -> jax.Array:
    """Nucleus filter: drop tokens outside the smallest top-p mass set.

    Sort descending, take softmax cumsum; a token stays iff the
    cumulative mass BEFORE it is < top_p (so the argmax always stays).
    The mask is computed in sorted order and scattered back via the
    inverse permutation (argsort of the sort indices) — O(V log V) on
    device, once per decode step."""
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = cum_before < top_p
    inv = jnp.argsort(sort_idx, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    return jnp.where(keep, logits, -jnp.inf)


def sample_token(logits: jax.Array, key: Optional[jax.Array],
                 sp: Optional[SamplingParams]) -> jax.Array:
    """(B, V) logits → (B,) int32 token ids.

    Greedy when ``sp`` is None / temperature 0 (key may be None then).
    """
    if sp is None or sp.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32) / jnp.maximum(sp.temperature, 1e-6)
    if sp.top_k and sp.top_k > 0:
        x = _mask_top_k(x, int(sp.top_k))
    if sp.top_p < 1.0:
        x = _mask_top_p(x, sp.top_p)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
