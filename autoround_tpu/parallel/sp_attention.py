"""Sequence-parallel decode attention: KV cache sharded along TIME.

SURVEY §5 names long-context sequence parallelism a new TPU capability
(the reference has none): when the KV cache outgrows one chip's HBM, each
device holds a contiguous T-shard of K/V and the single-token decode
attention merges per-shard partial softmax statistics with one round of
collectives — the flash-attention log-sum-exp merge:

  per shard i:  m_i = max_t s_t,   l_i = Σ_t e^{s_t − m_i},
                o_i = Σ_t e^{s_t − m_i} v_t            (unnormalized)
  global:       m = pmax(m_i),  α_i = e^{m_i − m}
                out = psum(α_i · o_i) / psum(α_i · l_i)

Exactly equal to attention over the concatenated cache (up to fp
rounding); the only cross-chip traffic is two psums + one pmax of
(B, nh[, hd]) — bytes independent of T, so arbitrarily long contexts
scale across ICI without moving the cache.

Run under ``shard_map`` with the cache sharded P(None, "sp", None, None);
compose with the TP engine's head sharding on an ("sp", "tp") mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sp_decode_attention", "sp_decode_attention_host"]

_NEG = -0.7 * float(np.finfo(np.float32).max)


def sp_decode_attention(q, k_shard, v_shard, pos, axis_name: str,
                        sm_scale: float, softcap: float = 0.0,
                        window: Optional[int] = None):
    """One-token attention over a time-sharded KV cache (call inside
    shard_map).

    q (B, nh, hd) — replicated across the sp axis;
    k/v_shard (B, T_local, n_kv, hd) — this device's contiguous slice;
    pos (B,) int32 — index of the current token in GLOBAL time.
    Returns (B, nh, hd), identical on every sp member.
    """
    B, nh, hd = q.shape
    T_local, nkv = k_shard.shape[1], k_shard.shape[2]
    rep = nh // nkv
    idx = jax.lax.axis_index(axis_name)
    t0 = idx * T_local                       # global offset of this shard

    kf = k_shard.astype(jnp.float32)
    vf = v_shard.astype(jnp.float32)
    if rep > 1:
        kf = jnp.repeat(kf, rep, axis=2)
        vf = jnp.repeat(vf, rep, axis=2)
    s = jnp.einsum("bnh,btnh->bnt", q.astype(jnp.float32), kf) * sm_scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    cols = t0 + jnp.arange(T_local)[None, None, :]
    valid = cols <= pos[:, None, None]
    if window is not None:
        valid = valid & (cols > pos[:, None, None] - window)
    s = jnp.where(valid, s, _NEG)

    m_i = jnp.max(s, axis=-1)                              # (B, nh)
    # a fully-masked shard contributes nothing: zero its l and o
    dead = m_i <= _NEG / 2
    p = jnp.exp(s - m_i[..., None])
    l_i = jnp.where(dead, 0.0, jnp.sum(p, axis=-1))        # (B, nh)
    o_i = jnp.einsum("bnt,btnh->bnh", p, vf)
    o_i = jnp.where(dead[..., None], 0.0, o_i)

    m = jax.lax.pmax(jnp.where(dead, -jnp.inf, m_i), axis_name)
    alpha = jnp.where(dead, 0.0, jnp.exp(m_i - m))
    l = jax.lax.psum(alpha * l_i, axis_name)
    o = jax.lax.psum(alpha[..., None] * o_i, axis_name)
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def sp_decode_attention_host(q, k_cache, v_cache, pos, n_shards: int,
                             sm_scale: float, softcap: float = 0.0,
                             window: Optional[int] = None, mesh=None):
    """Convenience wrapper: shard a full (B, T, n_kv, hd) cache over an
    ``sp`` mesh axis and run :func:`sp_decode_attention` under shard_map.
    Builds a 1-axis mesh over the first ``n_shards`` devices if none is
    given.  Used by tests and as the integration template for a
    time-sharded serving cache."""
    from jax import shard_map
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))

    fn = shard_map(
        lambda q_, k_, v_, p_: sp_decode_attention(
            q_, k_, v_, p_, "sp", sm_scale, softcap, window),
        mesh=mesh,
        in_specs=(P(), P(None, "sp", None, None),
                  P(None, "sp", None, None), P()),
        out_specs=P(),
    )
    return fn(q, k_cache, v_cache, jnp.asarray(pos, jnp.int32))
