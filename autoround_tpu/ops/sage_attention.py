"""SageAttention-style INT8-QK prefill attention (Pallas TPU).

Role of the reference's ARK SageAttention (INT8 QK SDPA,
``auto_round_extension/ark`` feature matrix, ``sdpa_sparse.cpp``): the
score matmul — half the attention FLOPs — runs int8×int8 on the MXU
(2× the bf16 MXU rate) instead of bf16.

Numerics (the SageAttention recipe):

* **K smoothing**: subtract the per-(batch, head) mean key before
  quantization.  ``q·mean_k`` is constant along the key axis, so softmax
  is exactly invariant to the shift — it costs nothing and removes the
  common-mode component that dominates K's dynamic range.
* **Per-token int8**: q and (smoothed) k quantize per row (token) with
  max-abs scales; the scales fold back into the scores as a rank-1
  outer product — exact dequant of the int32 accumulator.
* P·V stays bf16 (P ∈ [0,1] is already well-conditioned).

Forward-only (serving prefill; tuning losses keep the differentiable
bf16 flash kernel).  Falls back to the XLA reference off-TPU.

MEASURED (one v5e chip, B=4 H=32 Hkv=8 S=2048 D=128, causal): int8-QK
6.76 ms vs bf16 flash 6.19 ms — the in-kernel quantize VPU work eats
the int8 MXU gain at these shapes, so the engine keeps bf16 flash as
the default and this op stays available for experimentation (accuracy
is excellent: 4.7e-4 mean abs err vs the bf16 kernel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sage_attention", "sage_attention_ref"]

_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _int8_rows(x):
    """Per-row (last-axis) max-abs int8 quantization → (codes, scales)."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                            keepdims=True), 1e-8) / 127.0
    codes = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
    return codes, s


def sage_attention_ref(q, k, v, causal: bool = True):
    """XLA reference of the int8-QK path (same quantization choices)."""
    B, H, S, D = q.shape
    T = k.shape[2]
    k_mean = jnp.mean(k.astype(jnp.float32), axis=2, keepdims=True)
    ks = (k.astype(jnp.float32) - k_mean)
    qi, qs = _int8_rows(q)
    ki, kss = _int8_rows(ks)
    s = jnp.einsum("bhsd,bhtd->bhst", qi.astype(jnp.int32),
                   ki.astype(jnp.int32)).astype(jnp.float32)
    s = s * qs * kss.transpose(0, 1, 3, 2) / np.sqrt(D)
    if causal:
        mask = jnp.tril(jnp.ones((S, T), bool), k=T - S)
        s = jnp.where(mask[None, None], s, _MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, km_ref, o_ref,
            m_ref, l_ref, acc_ref, *, sm_scale: float, causal: bool,
            block_q: int, block_k: int, n_kv: int, ts_off: int):
    kv_idx = pl.program_id(3)
    q_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    should_run = True
    if causal:
        should_run = ((q_idx + 1) * block_q - 1 + ts_off) >= (
            kv_idx * block_k)

    @pl.when(should_run)
    def _():
        # quantize IN-KERNEL (no extra HBM pass): per-row max-abs int8
        qf = q_ref[0, 0].astype(jnp.float32)            # (block_q, D)
        kf = (k_ref[0, 0].astype(jnp.float32)
              - km_ref[0, 0, :1].astype(jnp.float32))   # smoothed keys
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                         1e-8) / 127.0
        kss = jnp.maximum(jnp.max(jnp.abs(kf), axis=1, keepdims=True),
                          1e-8) / 127.0
        qi = jnp.round(qf / qs).astype(jnp.int8)
        ki = jnp.round(kf / kss).astype(jnp.int8)
        # int8 x int8 on the MXU, int32 accumulate
        s = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        # rank-1 dequant: row scales x key-token scales (+ softmax scale)
        reps = block_k // 128
        ks_t = jnp.broadcast_to(kss.T, (1, block_k))
        s = s * (qs * sm_scale) * ks_t

        if causal:
            rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    + q_idx * block_q)
            cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    + kv_idx * block_k)
            s = jnp.where(cols <= rows + ts_off, s, _MASK_VALUE)

        m_prev, l_prev = m_ref[:], l_ref[:]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        m_tiled = (jnp.concatenate([m_next] * reps, axis=1)
                   if reps > 1 else m_next)
        p = jnp.exp(s - m_tiled)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_ref[:] = m_next

        v = v_ref[0, 0]
        D = acc_ref.shape[-1]
        alpha_d = (jnp.concatenate([alpha] * (D // 128), axis=1)
                   if D > 128 else alpha)
        acc_ref[:] = acc_ref[:] * alpha_d + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _():
        l = l_ref[:]
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        D = acc_ref.shape[-1]
        inv_d = (jnp.concatenate([inv] * (D // 128), axis=1)
                 if D > 128 else inv)
        o_ref[0, 0] = (acc_ref[:] * inv_d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q",
                                             "block_k"))
def sage_attention(q, k, v, causal: bool = True, block_q: int = 256,
                   block_k: int = 256):
    """INT8-QK flash attention: q (B, H, S, D), k/v (B, Hkv, T, D).

    The per-(batch, head) key mean is one cheap XLA reduction; the
    kernel smooths + quantizes q/k tiles in VMEM and feeds the int8 MXU,
    with the scale outer product folded back into the scores.
    """
    B, H, S, D = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    rep = H // Hkv

    block_q = min(block_q, S)
    block_k = min(block_k, T)
    usable = (jax.devices()[0].platform == "tpu"
              and S % block_q == 0 and T % block_k == 0
              and block_q >= 8 and block_k >= 128 and D % 128 == 0)
    if not usable:
        return sage_attention_ref(
            q, jnp.repeat(k, rep, axis=1) if rep > 1 else k,
            jnp.repeat(v, rep, axis=1) if rep > 1 else v, causal)

    # only the per-(B, Hkv) key mean precomputes in XLA (a cheap
    # reduction); quantization happens inside the kernel on the tiles
    k_mean = jnp.mean(k.astype(jnp.float32), axis=2, keepdims=True)
    km = jnp.broadcast_to(k_mean, (B, Hkv, 8, D)).astype(jnp.float32)
    sm_scale = 1.0 / float(np.sqrt(D))

    grid = (B, H, S // block_q, T // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, block_k=block_k,
                          n_kv=T // block_k, ts_off=T - S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, qi_, ki_: (b, h, qi_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, qi_, ki_, rep=rep:
                         (b, h // rep, ki_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, qi_, ki_, rep=rep:
                         (b, h // rep, ki_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, D),
                         lambda b, h, qi_, ki_, rep=rep:
                         (b, h // rep, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, qi_, ki_: (b, h, qi_, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v, km)
    return out
