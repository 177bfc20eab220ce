"""Fused decode attention over a quantized KV cache (Pallas TPU).

Role of the reference's serving attention kernels (ARK decode-attention /
SDPA, ``auto_round_extension/ark`` feature matrix): one query token per
sequence attends over the full (B, T, n_kv, hd) cache.  The kernel reads
the cache in its INT8 storage form and folds the per-head dequant scales
into the score scale (K) and the output epilogue (V) — no bf16
materialization of the cache, so attention HBM traffic is half of the
dequant-then-attend path and the dequant pass disappears entirely.

Structure: grid (B, n_kv, T/block_k) with flash-style online softmax
(running m/l/acc scratch); GQA handled by blocking q as (B, n_kv, G, hd)
so each program streams one kv head against its G query heads.  Gemma2
logit softcap and sliding windows are applied in-kernel; per-slot
positions (continuous batching) ride in as a scalar-prefetch vector.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention", "decode_attention_ref"]

_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def decode_attention_ref(q, k_cache, v_cache, pos, k_scale, v_scale,
                         sm_scale: float, softcap: float = 0.0,
                         window: Optional[int] = None):
    """Reference: dequantize + masked softmax attention.

    q (B, nh, hd); k/v_cache (B, T, n_kv, hd) int8 (or any dtype);
    pos (B,) int32 — index of the CURRENT token (attends cols <= pos);
    k/v_scale (n_kv,) float32.  Returns (B, nh, hd) in q.dtype.
    """
    B, nh, hd = q.shape
    T, nkv = k_cache.shape[1], k_cache.shape[2]
    rep = nh // nkv
    kf = k_cache.astype(jnp.float32) * k_scale.reshape(1, 1, nkv, 1)
    vf = v_cache.astype(jnp.float32) * v_scale.reshape(1, 1, nkv, 1)
    if rep > 1:
        kf = jnp.repeat(kf, rep, axis=2)
        vf = jnp.repeat(vf, rep, axis=2)
    s = jnp.einsum("bnh,btnh->bnt", q.astype(jnp.float32), kf) * sm_scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    idx = jnp.arange(T)[None, None, :]
    valid = idx <= pos[:, None, None]
    if window is not None:
        valid = valid & (idx > pos[:, None, None] - window)
    s = jnp.where(valid, s, _MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnt,btnh->bnh", p, vf)
    return out.astype(q.dtype)


def _decode_kernel(pos_ref, ks_ref, vs_ref, q_ref, k_ref, v_ref, o_ref,
                   m_ref, l_ref, acc_ref, *, sm_scale: float, block_k: int,
                   n_t: int, softcap: float, window: Optional[int],
                   out_dtype):
    b = pl.program_id(0)
    h = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    pos = pos_ref[b]
    should = (t * block_k) <= pos
    if window is not None:
        should = jnp.logical_and(should,
                                 (t + 1) * block_k - 1 > pos - window)

    @pl.when(should)
    def _():
        q = q_ref[0, 0]                                   # (G8, hd) f32
        k = k_ref[0].astype(jnp.float32)                  # (block_k, hd)
        # K dequant folds into the score scale (per-head scalar)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (sm_scale * ks_ref[h])
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * block_k
        valid = cols <= pos
        if window is not None:
            valid = jnp.logical_and(valid, cols > pos - window)
        s = jnp.where(valid, s, _MASK_VALUE)

        m_prev, l_prev = m_ref[:], l_ref[:]
        m_curr = jnp.max(s, axis=1)[:, None]              # (G8, 1)
        m_next = jnp.maximum(m_prev, m_curr)              # (G8, 128)
        alpha = jnp.exp(m_prev - m_next)
        reps = block_k // 128
        m_tiled = (jnp.concatenate([m_next] * reps, axis=1)
                   if reps > 1 else m_next)
        p = jnp.exp(s - m_tiled)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_ref[:] = m_next

        v = v_ref[0].astype(jnp.float32)                  # (block_k, hd)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(t == n_t - 1)
    def _():
        l = l_ref[:, :1]
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        # V dequant is a per-head output epilogue
        o_ref[0, 0] = (acc_ref[:] * inv * vs_ref[h]).astype(out_dtype)


def decode_attention(q, k_cache, v_cache, pos, k_scale, v_scale,
                     sm_scale: float, softcap: float = 0.0,
                     window: Optional[int] = None,
                     block_k: int = 256, interpret: bool = False):
    """Fused single-token attention over an int8 KV cache.

    q (B, nh, hd); k/v_cache (B, T, n_kv, hd) int8; pos (B,) int32
    (current-token index per sequence); k/v_scale (n_kv,) float32.
    Falls back to :func:`decode_attention_ref` off-TPU or for
    kernel-ineligible shapes.
    """
    B, nh, hd = q.shape
    T, nkv = k_cache.shape[1], k_cache.shape[2]
    G = nh // nkv
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    k_scale = jnp.asarray(k_scale, jnp.float32).reshape(nkv)
    v_scale = jnp.asarray(v_scale, jnp.float32).reshape(nkv)

    while block_k > 128 and T % block_k:
        block_k //= 2
    eligible = ((jax.devices()[0].platform == "tpu" or interpret)
                and hd % 128 == 0
                and T % block_k == 0 and G <= 8 and T >= block_k)
    if not eligible:
        return decode_attention_ref(q, k_cache, v_cache, pos, k_scale,
                                    v_scale, sm_scale, softcap, window)

    G8 = 8
    qf = q.reshape(B, nkv, G, hd).astype(jnp.float32)
    if G < G8:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))
    n_t = T // block_k
    # (B, T, nkv, hd) viewed as (B, T, nkv*hd): a free bitcast that makes
    # the per-head column slab a Mosaic-legal (block_k, hd) tile
    k3 = k_cache.reshape(B, T, nkv * hd)
    v3 = v_cache.reshape(B, T, nkv * hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,       # pos, k_scale, v_scale
        grid=(B, nkv, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, G8, hd), lambda b, h, t, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, h, t, *_: (b, t, h)),
            pl.BlockSpec((1, block_k, hd), lambda b, h, t, *_: (b, t, h)),
        ],
        out_specs=pl.BlockSpec((1, 1, G8, hd),
                               lambda b, h, t, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G8, 128), jnp.float32),
            pltpu.VMEM((G8, 128), jnp.float32),
            pltpu.VMEM((G8, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, sm_scale=sm_scale,
                          block_k=block_k, n_t=n_t, softcap=softcap,
                          window=window, out_dtype=q.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nkv, G8, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(pos, k_scale, v_scale, qf, k3, v3)
    return out[:, :, :G].reshape(B, nh, hd)
