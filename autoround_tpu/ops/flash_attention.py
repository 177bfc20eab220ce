"""Flash attention (Pallas TPU): tiled online-softmax causal attention.

The prefill/calibration attention path — replaces the materialized
(S, S) scores of the naive path for long sequences (calibration default
seqlen 2048).  Follows the canonical JAX Pallas TPU flash kernel
structure (online softmax with running m/l/acc scratch, causal tile
skipping, fp32 statistics); GQA is handled in the K/V index maps
(kv_head = head // group) so K/V are never materialized repeated.

Falls back to the naive XLA path off-TPU or for shapes below the tile
minimums.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_ref"]

_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def flash_attention_ref(q, k, v, causal: bool = True):
    """Naive reference: q (B,H,S,D), k/v (B,Hkv,T,D) → (B,H,S,D)."""
    B, H, S, D = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    rep = H // Hkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum("bhsd,bhtd->bhst", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(D)
    if causal:
        mask = jnp.tril(jnp.ones((S, T), bool), k=T - S)
        s = jnp.where(mask[None, None], s, _MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
            sm_scale: float, causal: bool, block_q: int, block_k: int,
            n_kv: int, ts_off: int = 0):
    kv_idx = pl.program_id(3)
    q_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    # causal: skip KV tiles fully above the (bottom-right-anchored) diagonal
    should_run = True
    if causal:
        should_run = ((q_idx + 1) * block_q - 1 + ts_off) >= (kv_idx * block_k)

    @pl.when(should_run)
    def _():
        q = q_ref[0, 0]                 # (block_q, D)
        k = k_ref[0, 0]                 # (block_k, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

        if causal:
            # diagonal anchored bottom-right (matches flash_attention_ref's
            # tril k=T-S): col <= row + (T - S)
            rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    + q_idx * block_q)
            cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    + kv_idx * block_k)
            s = jnp.where(cols <= rows + ts_off, s, _MASK_VALUE)

        # stats live as (block_q, 128) lane-replicated rows (TPU min tile)
        m_prev, l_prev = m_ref[:], l_ref[:]
        m_curr = jnp.max(s, axis=1)[:, None]            # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)            # (block_q, 128)
        alpha = jnp.exp(m_prev - m_next)
        reps = block_k // 128
        m_tiled = jnp.concatenate([m_next] * reps, axis=1) if reps > 1 \
            else m_next
        p = jnp.exp(s - m_tiled)
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_ref[:] = m_next
        l_ref[:] = l_next

        v = v_ref[0, 0]                 # (block_k, D)
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
        # logsumexp per row, lane-replicated (block_q, 128) — the
        # backward kernels re-normalize recomputed scores with it
        lse_ref[0, 0] = m_ref[:] + jnp.log(jnp.where(l == 0.0, 1.0, l))


def _lane_tile(x, block: int):
    """(rows, 128) lane-replicated stats → (rows, block) for broadcasting
    against a score tile (Mosaic-friendly: concat, no 1-lane broadcast)."""
    reps = block // 128
    return jnp.concatenate([x] * reps, axis=1) if reps > 1 else x


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_ref, *, sm_scale: float, causal: bool,
                   block_q: int, block_k: int, n_kv: int, ts_off: int = 0):
    """dQ pass: for each q tile, stream kv tiles and accumulate
    dQ = sum_k dS @ K with dS = P * (dO V^T - delta) * scale."""
    kv_idx = pl.program_id(3)
    q_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    should_run = True
    if causal:
        should_run = ((q_idx + 1) * block_q - 1 + ts_off) >= (kv_idx * block_k)

    @pl.when(should_run)
    def _():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if causal:
            rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    + q_idx * block_q)
            cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    + kv_idx * block_k)
            s = jnp.where(cols <= rows + ts_off, s, _MASK_VALUE)
        p = jnp.exp(s - _lane_tile(lse_ref[0, 0], block_k))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - _lane_tile(delta_ref[0, 0], block_k)) * sm_scale
        acc_ref[:] = acc_ref[:] + jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, sm_scale: float,
                    causal: bool, block_q: int, block_k: int, n_q: int,
                    ts_off: int = 0):
    """dK/dV pass: for each kv tile, stream q tiles and accumulate
    dV = sum_q P^T dO,  dK = sum_q dS^T Q."""
    q_idx = pl.program_id(3)
    kv_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _():
        dk_acc[:] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[:] = jnp.zeros(dv_acc.shape, jnp.float32)

    should_run = True
    if causal:
        should_run = ((q_idx + 1) * block_q - 1 + ts_off) >= (kv_idx * block_k)

    @pl.when(should_run)
    def _():
        q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if causal:
            rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    + q_idx * block_q)
            cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    + kv_idx * block_k)
            s = jnp.where(cols <= rows + ts_off, s, _MASK_VALUE)
        p = jnp.exp(s - _lane_tile(lse_ref[0, 0], block_k))
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - _lane_tile(delta_ref[0, 0], block_k)) * sm_scale
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(q_idx == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, causal: bool = True, block_q: int = 256,
                    block_k: int = 256):
    """q (B,H,S,D), k/v (B,Hkv,T,D) → (B,H,S,D).  S,T multiples of the
    block sizes and D a lane multiple for the kernel path.

    Differentiable: forward AND backward run fused Pallas kernels
    (backward recomputes P tiles from the saved logsumexp — no (S, T)
    materialization in either direction).
    """
    out, _ = _flash_fwd_impl(q, k, v, causal, block_q, block_k)
    return out


def _flash_fwd(q, k, v, causal, block_q, block_k):
    out, lse = _flash_fwd_impl(q, k, v, causal, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, block_q, block_k, res, g):
    q, k, v, out, lse = res
    if lse is None:  # forward ran the XLA fallback
        _, vjp = jax.vjp(
            lambda q_, k_, v_: flash_attention_ref(q_, k_, v_, causal),
            q, k, v)
        return vjp(g)

    B, H, S, D = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    rep = H // Hkv
    bq, bk = min(block_q, S), min(block_k, T)
    sm_scale = 1.0 / float(np.sqrt(D))

    # delta_i = rowsum(dO * O): cheap elementwise+reduce in XLA, stored
    # lane-replicated like the lse
    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32),
                    axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 128))

    common = dict(compiler_params=pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel",
                             "arbitrary")))
    qspec = pl.BlockSpec((1, 1, bq, D), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, bk, D),
                         lambda b, h, qi, ki, rep=rep: (b, h // rep, ki, 0),
                         memory_space=pltpu.VMEM)
    statspec = pl.BlockSpec((1, 1, bq, 128),
                            lambda b, h, qi, ki: (b, h, qi, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=bq, block_k=bk, n_kv=T // bk,
                          ts_off=T - S),
        grid=(B, H, S // bq, T // bk),
        in_specs=[qspec, kspec, kspec, qspec, statspec, statspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        **common,
    )(q, k, v, g, lse, delta)

    # dK/dV per Q-HEAD (grid writes would race on shared kv heads);
    # the rep-group reduction happens in XLA afterwards
    kv_q = pl.BlockSpec((1, 1, bq, D), lambda b, h, ki, qi: (b, h, qi, 0),
                        memory_space=pltpu.VMEM)
    kv_k = pl.BlockSpec((1, 1, bk, D),
                        lambda b, h, ki, qi, rep=rep: (b, h // rep, ki, 0),
                        memory_space=pltpu.VMEM)
    kv_kout = pl.BlockSpec((1, 1, bk, D), lambda b, h, ki, qi: (b, h, ki, 0),
                           memory_space=pltpu.VMEM)
    kv_stat = pl.BlockSpec((1, 1, bq, 128),
                           lambda b, h, ki, qi: (b, h, qi, 0),
                           memory_space=pltpu.VMEM)
    dkh, dvh = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale,
                          causal=causal, block_q=bq, block_k=bk,
                          n_q=S // bq, ts_off=T - S),
        grid=(B, H, T // bk, S // bq),
        in_specs=[kv_q, kv_k, kv_k, kv_q, kv_stat, kv_stat],
        out_specs=(kv_kout, kv_kout),
        out_shape=(jax.ShapeDtypeStruct((B, H, T, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, T, D), v.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
        **common,
    )(q, k, v, g, lse, delta)
    if rep > 1:
        dk = dkh.reshape(B, Hkv, rep, T, D).sum(axis=2)
        dv = dvh.reshape(B, Hkv, rep, T, D).sum(axis=2)
    else:
        dk, dv = dkh, dvh
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k"))
def _flash_fwd_impl(q, k, v, causal: bool = True, block_q: int = 256,
                    block_k: int = 256):
    """Returns (out, lse) — lse is None on the XLA fallback path."""
    B, H, S, D = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    rep = H // Hkv

    block_q = min(block_q, S)
    block_k = min(block_k, T)
    usable = (jax.devices()[0].platform == "tpu"
              and S % block_q == 0 and T % block_k == 0
              and block_q >= 8 and block_k >= 128 and D % 128 == 0)
    if not usable:
        return flash_attention_ref(q, k, v, causal), None

    sm_scale = 1.0 / float(np.sqrt(D))
    grid = (B, H, S // block_q, T // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, block_k=block_k,
                          n_kv=T // block_k, ts_off=T - S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, qi, ki, rep=rep: (b, h // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, qi, ki, rep=rep: (b, h // rep, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, S, 128), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v)
    return out, lse


def _flash_attention_impl(q, k, v, causal: bool = True, block_q: int = 256,
                          block_k: int = 256):
    """Back-compat alias returning only the output."""
    return _flash_fwd_impl(q, k, v, causal, block_q, block_k)[0]
