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

__all__ = ["SamplingParams", "sample_token", "sample_token_sharded"]


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


def sample_token_sharded(logits_shard: jax.Array,
                         key: Optional[jax.Array],
                         sp: Optional[SamplingParams],
                         axis: str = "tp",
                         candidates_per_shard: int = 64) -> jax.Array:
    """Distributed head sampling over vocab-sharded logits (inside
    ``shard_map``): each shard holds (B, V/tp); instead of all-gathering
    the full logit shards (bs x V/tp floats per step), shards exchange
    only winners/candidates.

    * greedy — per-shard (max, argmax) pairs gather (tp x B x 8 bytes);
      the global winner is the lowest-offset max, matching single-chip
      ``argmax`` tie-breaking exactly (shards are vocab-ordered).
    * stochastic — each shard contributes its top ``candidates_per_shard``
      logits; the nucleus/top-k masks are computed over the gathered
      candidate set with the EXACT full-vocab normalizer (a psum of
      exp-sums), so token probabilities equal full-vocab sampling
      restricted to the candidate set.  The nucleus is capped at
      tp x candidates_per_shard tokens (top_k above the cap raises).

    Collective payload per step: greedy 8 bytes/row/shard vs
    4*V/tp (~16 KiB/row at V=128K, tp=4) for the gathered head.
    """
    Vs = logits_shard.shape[-1]
    off = jax.lax.axis_index(axis) * Vs
    if sp is None or sp.is_greedy:
        m = jnp.max(logits_shard, axis=-1)                       # (B,)
        a = (jnp.argmax(logits_shard, axis=-1) + off).astype(jnp.int32)
        gm = jax.lax.all_gather(m, axis)                         # (tp, B)
        ga = jax.lax.all_gather(a, axis)
        w = jnp.argmax(gm, axis=0)                               # (B,)
        return jnp.take_along_axis(ga, w[None, :], axis=0)[0]
    C = max(int(candidates_per_shard), int(sp.top_k))
    C = min(C, Vs)
    x = logits_shard.astype(jnp.float32) / jnp.maximum(sp.temperature,
                                                       1e-6)
    # exact full-vocab normalizer for the nucleus threshold
    m_glob = jax.lax.pmax(jnp.max(x, axis=-1), axis)             # (B,)
    z = jax.lax.psum(
        jnp.sum(jnp.exp(x - m_glob[:, None]), axis=-1), axis)    # (B,)
    vals, ids = jax.lax.top_k(x, C)                              # (B, C)
    gv = jax.lax.all_gather(vals, axis, axis=1, tiled=True)      # (B,tp*C)
    gi = jax.lax.all_gather((ids + off).astype(jnp.int32), axis,
                            axis=1, tiled=True)
    if sp.top_k and sp.top_k > 0:
        # global top-k ⊆ union of per-shard top-k since C >= top_k
        kth = jax.lax.top_k(gv, int(sp.top_k))[0][..., -1:]
        gv = jnp.where(gv < kth, -jnp.inf, gv)
    if sp.top_p < 1.0:
        sort_idx = jnp.argsort(-gv, axis=-1)
        sv = jnp.take_along_axis(gv, sort_idx, axis=-1)
        probs = jnp.exp(sv - m_glob[:, None]) / z[:, None]
        cum_before = jnp.cumsum(probs, axis=-1) - probs
        keep_sorted = cum_before < sp.top_p
        inv = jnp.argsort(sort_idx, axis=-1)
        keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
        gv = jnp.where(keep, gv, -jnp.inf)
        # Flat-distribution guard: the candidate set carries only
        # tp*C tokens of mass; if every candidate survives the nucleus
        # filter yet their total mass is still below top_p, tokens
        # inside the true nucleus were unsampleable this step.  Emit a
        # device-side warning (first axis member only) so the cap is
        # visible instead of silent — raise candidates_per_shard.
        cand_mass = jnp.sum(probs, axis=-1)                      # (B,)
        truncated = jnp.any((cand_mass < sp.top_p)
                            & jnp.all(keep_sorted, axis=-1))
        jax.lax.cond(
            truncated & (jax.lax.axis_index(axis) == 0),
            lambda: jax.debug.print(
                "autoround_tpu sampling: sharded nucleus truncated — "
                "candidate mass {m:.3f} < top_p; raise "
                "candidates_per_shard", m=jnp.min(cand_mass)),
            lambda: None)
    pick = jax.random.categorical(key, gv, axis=-1)              # (B,)
    return jnp.take_along_axis(gi, pick[:, None], axis=-1)[:, 0]


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
