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
                         window: Optional[int] = None,
                         sinks: Optional[jax.Array] = None,
                         chunk: Optional[int] = None):
    """Reference: dequantize + masked softmax attention.

    q (B, nh, hd); k/v_cache (B, T, n_kv, hd) int8 (or any dtype);
    pos (B,) int32 — index of the CURRENT token (attends cols <= pos);
    k/v_scale (n_kv,) float32.  ``sinks`` (nh,) adds a per-head logit to
    the softmax denominator (GPT-OSS attention sinks).  Returns
    (B, nh, hd) in q.dtype.
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
    if chunk is not None:
        valid = valid & (idx >= (pos[:, None, None] // chunk) * chunk)
    s = jnp.where(valid, s, _MASK_VALUE)
    if sinks is not None:
        sc = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(1, nh, 1), (B, nh, 1))
        comb = jnp.concatenate([s, sc], axis=-1)
        p = jax.nn.softmax(comb, axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnt,btnh->bnh", p, vf)
    return out.astype(q.dtype)


def _decode_kernel(pos_ref, ks_ref, vs_ref, sink_ref, q_ref, k_ref, v_ref,
                   o_ref, m_ref, l_ref, acc_ref, *, sm_scale: float,
                   block_k: int, n_t: int, nkv: int, g8: int,
                   softcap: float, window: Optional[int],
                   chunk: Optional[int], has_sinks: bool,
                   out_dtype):
    """Grid (B, T/block_k); each program streams the CONTIGUOUS
    all-heads (block_k, nkv*hd) int8 slab of one sequence and loops the
    kv heads in VMEM.  The previous layout (grid (B, nkv, t), one head
    per program) DMA'd 128-byte strided rows out of the (B, T, nkv, hd)
    cache — 8x the requests at 1/8 the width — and paid program overhead
    per (head, t) pair; this shape is the difference between ~8 ms and
    <1 ms of attention per 32-layer decode step at T=512."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    hd = acc_ref.shape[-1]

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
    if chunk is not None:
        # Llama4 chunked attention: only the query's own chunk is live
        should = jnp.logical_and(should,
                                 (t + 1) * block_k - 1
                                 >= (pos // chunk) * chunk)

    @pl.when(should)
    def _():
        kall = k_ref[0]                     # (block_k, nkv*hd) int8
        vall = v_ref[0]
        cols = (jax.lax.broadcasted_iota(jnp.int32, (g8, block_k), 1)
                + t * block_k)
        valid = cols <= pos
        if window is not None:
            valid = jnp.logical_and(valid, cols > pos - window)
        if chunk is not None:
            valid = jnp.logical_and(valid,
                                    cols >= (pos // chunk) * chunk)
        reps = block_k // 128
        for h in range(nkv):
            r0 = h * g8
            q = q_ref[0, r0:r0 + g8]                        # (G8, hd) f32
            k = kall[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            # K dequant folds into the score scale (per-head scalar)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (sm_scale * ks_ref[h])
            if softcap:
                s = softcap * jnp.tanh(s / softcap)
            s = jnp.where(valid, s, _MASK_VALUE)

            m_prev = m_ref[r0:r0 + g8]
            l_prev = l_ref[r0:r0 + g8]
            m_curr = jnp.max(s, axis=1)[:, None]            # (G8, 1)
            m_next = jnp.maximum(m_prev, m_curr)            # (G8, 128)
            alpha = jnp.exp(m_prev - m_next)
            m_tiled = (jnp.concatenate([m_next] * reps, axis=1)
                       if reps > 1 else m_next)
            p = jnp.exp(s - m_tiled)
            l_ref[r0:r0 + g8] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_ref[r0:r0 + g8] = m_next

            v = vall[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            acc_ref[r0:r0 + g8] = acc_ref[r0:r0 + g8] * alpha + jax.lax.dot(
                p, v, preferred_element_type=jnp.float32)

    @pl.when(t == n_t - 1)
    def _():
        for h in range(nkv):
            r0 = h * g8
            l = l_ref[r0:r0 + g8, :1]
            if has_sinks:
                # GPT-OSS attention sink: one extra per-query-head logit
                # joins the softmax denominator (probability mass may
                # leak to "nowhere" instead of real positions)
                sink = jnp.stack(
                    [sink_ref[r0 + i] for i in range(g8)])[:, None]
                l = l + jnp.exp(sink - m_ref[r0:r0 + g8, :1])
            inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            # V dequant is a per-head output epilogue
            o_ref[0, r0:r0 + g8] = (acc_ref[r0:r0 + g8] * inv * vs_ref[h]
                                    ).astype(out_dtype)


def decode_attention(q, k_cache, v_cache, pos, k_scale, v_scale,
                     sm_scale: float, softcap: float = 0.0,
                     window: Optional[int] = None,
                     chunk: Optional[int] = None,
                     sinks: Optional[jax.Array] = None,
                     block_k: int = 512, interpret: bool = False):
    """Fused single-token attention over an int8 KV cache.

    q (B, nh, hd); k/v_cache (B, T, n_kv, hd) int8; pos (B,) int32
    (current-token index per sequence); k/v_scale (n_kv,) float32;
    ``sinks`` (nh,) float32 GPT-OSS per-head sink logits (optional).
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
    # keep the all-heads k/v slabs within a comfortable VMEM budget
    while block_k > 128 and block_k * nkv * hd > (4 << 20):
        block_k //= 2
    eligible = ((jax.devices()[0].platform == "tpu" or interpret)
                and hd % 128 == 0
                and T % block_k == 0 and G <= 8 and T >= block_k)
    if not eligible:
        return decode_attention_ref(q, k_cache, v_cache, pos, k_scale,
                                    v_scale, sm_scale, softcap, window,
                                    sinks, chunk=chunk)

    G8 = 8
    qf = q.reshape(B, nkv, G, hd).astype(jnp.float32)
    if G < G8:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))
    qf = qf.reshape(B, nkv * G8, hd)
    has_sinks = sinks is not None
    if has_sinks:
        sv = jnp.asarray(sinks, jnp.float32).reshape(nkv, G)
        if G < G8:
            # pad rows exist only in padded q lanes; their sink value is
            # irrelevant (outputs sliced away) but must be finite
            sv = jnp.pad(sv, ((0, 0), (0, G8 - G)))
        sink_vec = sv.reshape(nkv * G8)
    else:
        sink_vec = jnp.zeros((nkv * G8,), jnp.float32)
    n_t = T // block_k
    # (B, T, nkv, hd) viewed as (B, T, nkv*hd): a free bitcast; each
    # program DMAs the full-width contiguous slab (all heads) of its
    # (sequence, t-block) — see _decode_kernel docstring
    k3 = k_cache.reshape(B, T, nkv * hd)
    v3 = v_cache.reshape(B, T, nkv * hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,       # pos, k_scale, v_scale, sinks
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, nkv * G8, hd), lambda b, t, *_: (b, 0, 0)),
            pl.BlockSpec((1, block_k, nkv * hd), lambda b, t, *_: (b, t, 0)),
            pl.BlockSpec((1, block_k, nkv * hd), lambda b, t, *_: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, nkv * G8, hd),
                               lambda b, t, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nkv * G8, 128), jnp.float32),
            pltpu.VMEM((nkv * G8, 128), jnp.float32),
            pltpu.VMEM((nkv * G8, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, sm_scale=sm_scale,
                          block_k=block_k, n_t=n_t, nkv=nkv, g8=G8,
                          softcap=softcap, window=window, chunk=chunk,
                          has_sinks=has_sinks, out_dtype=q.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nkv * G8, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pos, k_scale, v_scale, sink_vec, qf, k3, v3)
    return out.reshape(B, nkv, G8, hd)[:, :, :G].reshape(B, nh, hd)
