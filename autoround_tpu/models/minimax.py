"""MiniMax-Text-01/M1: hybrid lightning (linear) + softmax attention MoE.

Reference parity: the reference quantizes MiniMax through its generic HF
path (``auto-round`` supported-archs table); here the family is a first
-class citizen: norm-everything residuals (the residual stream is the
*normed* hidden, scaled by alpha/beta factors), Mixtral-style sparse MoE
(``mixtral._moe_mlp`` verbatim — w1/w2/w3 naming matches), standard rope
attention on ``full_attention`` layers, and **lightning attention** on
``linear_attention`` layers: per-head ALiBi-like exponential decay linear
attention, computed as a chunked intra/inter scan (TPU-friendly: two
MXU matmuls per chunk + one (d, d) state per head) with an O(1)
recurrent decode step.

HF reference: ``transformers/models/minimax/modeling_minimax.py``
(MiniMaxLightningAttention.forward: block loop with query/key/diagonal
decay; decode branch ``state = e^{-s}·state + kᵀv``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama, mixtral
from .llama import rms_norm
from .mixtral import MixtralConfig

__all__ = ["MiniMaxConfig", "init_params", "block_fwd", "block_fwd_for",
           "model_fwd", "block_with_cache", "block_linear_names",
           "lightning_attention", "lightning_step", "slope_rate",
           "CONFIG_PRESETS"]


@dataclass(frozen=True)
class MiniMaxConfig(MixtralConfig):
    # "linear_attention" / "full_attention" per layer (HF layer_types)
    layer_types: Tuple[str, ...] = ()
    block_size: int = 256
    # norm-everything residual scaling (MiniMaxDecoderLayer)
    full_attn_alpha_factor: float = 1.0
    full_attn_beta_factor: float = 1.0
    linear_attn_alpha_factor: float = 1.0
    linear_attn_beta_factor: float = 1.0
    mlp_alpha_factor: float = 1.0
    mlp_beta_factor: float = 1.0


def slope_rate(cfg: MiniMaxConfig, layer_idx: int) -> np.ndarray:
    """Per-head decay rates (HF ``get_slope_rate``): ALiBi-style
    geometric slopes scaled down for deeper layers."""
    nh = cfg.num_heads
    base = 1.0 / (2.0 ** (8.0 / nh))
    rate = base ** (np.arange(nh, dtype=np.float64) + 1)
    factor = 1.0 - layer_idx / (cfg.num_layers - 1 + 1e-5) + 1e-5
    return (rate * factor).astype(np.float32)          # (nh,)


def layer_is_linear(cfg: MiniMaxConfig, li: int) -> bool:
    return bool(cfg.layer_types) and cfg.layer_types[li] == "linear_attention"


_LIN = ("qkv_proj", "out_proj", "output_gate")
_FULL = ("q_proj", "k_proj", "v_proj", "o_proj")


def block_linear_names(cfg: MiniMaxConfig) -> Tuple[str, ...]:
    """Union over layer kinds; ``prune_missing_layers`` trims per block."""
    experts = tuple(f"experts.{e}.{w}" for e in range(cfg.num_experts)
                    for w in ("w1", "w2", "w3"))
    return _LIN + _FULL + experts


def init_params(cfg: MiniMaxConfig, key: jax.Array) -> Dict[str, Any]:
    H, hd, nh = cfg.hidden_size, cfg.hd, cfg.num_heads
    kvd = cfg.num_kv_heads * hd
    keys = jax.random.split(key, cfg.num_layers + 2)
    sc = 0.02

    def lin(k, o, i):
        return (jax.random.normal(k, (o, i), cfg.dtype) * sc)

    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 12)
        b: Dict[str, Any] = {
            "input_layernorm": jnp.ones((H,), jnp.float32),
            "post_attention_layernorm": jnp.ones((H,), jnp.float32),
            "router": lin(bk[0], cfg.num_experts, H),
            "experts": [
                {"w1": lin(jax.random.fold_in(bk[1], 3 * e), cfg.intermediate_size, H),
                 "w3": lin(jax.random.fold_in(bk[1], 3 * e + 1), cfg.intermediate_size, H),
                 "w2": lin(jax.random.fold_in(bk[1], 3 * e + 2), H, cfg.intermediate_size)}
                for e in range(cfg.num_experts)],
        }
        if layer_is_linear(cfg, li):
            b["qkv_proj"] = lin(bk[2], nh * hd * 3, H)
            b["out_proj"] = lin(bk[3], H, nh * hd)
            b["output_gate"] = lin(bk[4], nh * hd, H)
            b["attn_norm"] = jnp.ones((nh * hd,), jnp.float32)
            b["slope_rate"] = jnp.asarray(slope_rate(cfg, li))
        else:
            b["q_proj"] = lin(bk[2], nh * hd, H)
            b["k_proj"] = lin(bk[3], kvd, H)
            b["v_proj"] = lin(bk[4], kvd, H)
            b["o_proj"] = lin(bk[5], H, nh * hd)
        blocks.append(b)
    return {
        "embed_tokens": jax.random.normal(
            keys[-2], (cfg.vocab_size, H), cfg.dtype) * sc,
        "blocks": blocks,
        "norm": jnp.ones((H,), jnp.float32),
        "lm_head": jax.random.normal(
            keys[-1], (cfg.vocab_size, H), cfg.dtype) * sc,
    }


# ------------------------------------------------------- lightning attention
def _decays(rate: jax.Array, C: int):
    """(query, key, diagonal, block) decay tensors for a C-token chunk."""
    r = jnp.arange(1, C + 1, dtype=jnp.float32)           # 1..C
    qd = jnp.exp(-rate[None, :] * r[:, None])             # (C, nh)
    kd = jnp.exp(-rate[None, :] * (C - r)[:, None])       # (C, nh)
    dd = r[:, None] - r[None, :]                          # i - j
    dd = jnp.where(dd >= 0, jnp.exp(-rate[:, None, None] * dd[None]),
                   0.0)                                   # (nh, C, C)
    bd = jnp.exp(-rate * C)                               # (nh,)
    return qd, kd, dd, bd


def _lightning_block(q, k, v, state, rate):
    """One chunk: q/k/v (B, C, nh, d) fp32, state (B, nh, d, d) fp32."""
    C = q.shape[1]
    qd, kd, dd, bd = _decays(rate, C)
    inter = jnp.einsum("bcnd,bnde->bcne", q * qd[None, :, :, None], state)
    s = jnp.einsum("bcnd,bknd->bnck", q, k) * dd[None]
    intra = jnp.einsum("bnck,bknd->bcnd", s, v)
    new_state = (state * bd[None, :, None, None]
                 + jnp.einsum("bcnd,bcne->bnde",
                              k * kd[None, :, :, None], v))
    return inter + intra, new_state


def lightning_attention(q, k, v, rate, block: int,
                        state: Optional[jax.Array] = None,
                        return_state: bool = False):
    """Chunked decay-linear attention: q/k/v (B, S, nh, d) → (B, S, nh, d).

    Exactly HF's block recursion (intra QKᵀ·decay·V + inter Q·state with
    per-position query/key decays); full chunks ride a ``lax.scan``, a
    static-size remainder chunk runs as an epilogue so the final state is
    exact for any S."""
    B, S, nh, d = q.shape
    f32 = jnp.float32
    q, k, v = q.astype(f32), k.astype(f32), v.astype(f32)
    if state is None:
        state = jnp.zeros((B, nh, d, d), f32)
    n_full, rem = S // block, S % block
    outs = []
    if n_full:
        qs = q[:, :n_full * block].reshape(B, n_full, block, nh, d)
        ks = k[:, :n_full * block].reshape(B, n_full, block, nh, d)
        vs = v[:, :n_full * block].reshape(B, n_full, block, nh, d)

        def step(st, qkv):
            qc, kc, vc = qkv
            o, st = _lightning_block(qc, kc, vc, st, rate)
            return st, o

        state, o = jax.lax.scan(
            step, state, (qs.transpose(1, 0, 2, 3, 4),
                          ks.transpose(1, 0, 2, 3, 4),
                          vs.transpose(1, 0, 2, 3, 4)))
        outs.append(o.transpose(1, 0, 2, 3, 4).reshape(B, -1, nh, d))
    if rem:
        o, state = _lightning_block(q[:, n_full * block:],
                                    k[:, n_full * block:],
                                    v[:, n_full * block:], state, rate)
        outs.append(o)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return (out, state) if return_state else out


def lightning_step(q, k, v, rate, state):
    """O(1) decode: q/k/v (B, 1, nh, d); state (B, nh, d, d) fp32."""
    f32 = jnp.float32
    q, k, v = q.astype(f32), k.astype(f32), v.astype(f32)
    ratio = jnp.exp(-rate)[None, :, None, None]
    state = state * ratio + jnp.einsum("bnd,bne->bnde", k[:, 0], v[:, 0])
    out = jnp.einsum("bnd,bnde->bne", q[:, 0], state)[:, None]
    return out, state


def _lightning_attn_out(weights, h, cfg, lf, qkv_out):
    """Shared epilogue: head-concat RMSNorm, sigmoid output gate, proj."""
    B, S = h.shape[:2]
    y = qkv_out.reshape(B, S, -1).astype(h.dtype)
    y = rms_norm(y, weights["attn_norm"], cfg.rms_eps)
    gate = jax.nn.sigmoid(
        lf("output_gate", h, weights["output_gate"]).astype(jnp.float32))
    return lf("out_proj", (y.astype(jnp.float32) * gate).astype(h.dtype),
              weights["out_proj"])


def _lightning_qkv(weights, h, cfg, lf):
    B, S, _ = h.shape
    nh, hd = cfg.num_heads, cfg.hd
    act = llama._act(cfg.hidden_act)
    qkv = act(lf("qkv_proj", h, weights["qkv_proj"]))
    qkv = qkv.reshape(B, S, nh, 3 * hd)
    return qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:]


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: MiniMaxConfig, mask=None, linear_fn=None,
              linear_attn: bool = False) -> jax.Array:
    """MiniMax decoder block.  Norm-everything residuals: the residual
    branch is the NORMED hidden (``h``), scaled by alpha/beta factors —
    not the raw input (MiniMaxDecoderLayer.forward)."""
    lf = linear_fn or llama._plain_linear
    B, S, H = x.shape
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    if linear_attn:
        q, k, v = _lightning_qkv(weights, h, cfg, lf)
        o = lightning_attention(q, k, v, weights["slope_rate"],
                                cfg.block_size)
        y = _lightning_attn_out(weights, h, cfg, lf, o)
        a, b = cfg.linear_attn_alpha_factor, cfg.linear_attn_beta_factor
    else:
        hd = cfg.hd
        q = lf("q_proj", h, weights["q_proj"]).reshape(B, S, cfg.num_heads,
                                                       hd)
        k = lf("k_proj", h, weights["k_proj"]).reshape(
            B, S, cfg.num_kv_heads, hd)
        v = lf("v_proj", h, weights["v_proj"]).reshape(
            B, S, cfg.num_kv_heads, hd)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        attn = llama.attention(q, k, v, mask, cfg)
        y = lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])
        a, b = cfg.full_attn_alpha_factor, cfg.full_attn_beta_factor
    x = h * a + y * b
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    from .. import envs
    moe = mixtral._moe_mlp(weights, h, cfg, lf,
                           capacity_factor=envs.AR_MOE_CAPACITY_FACTOR)
    return h * cfg.mlp_alpha_factor + moe * cfg.mlp_beta_factor


@functools.lru_cache(maxsize=None)
def _variant_fn(linear_attn: bool):
    def fn(weights, x, cos, sin, cfg, mask=None, linear_fn=None):
        return block_fwd(weights, x, cos, sin, cfg, mask, linear_fn,
                         linear_attn=linear_attn)
    return fn


def block_fwd_for(cfg: MiniMaxConfig, block_idx: int):
    """Stable per-kind forward callables (jit caches on identity)."""
    return _variant_fn(layer_is_linear(cfg, block_idx))


def block_with_cache(weights, x, cos, sin, cfg: MiniMaxConfig, cache_in,
                     pos, lf):
    """Serving block: returns (out, cache_pieces).

    Same protocol as ``qwen3next.block_with_cache`` so the hybrid serving
    cores are shared: ("lin", tail, state) / ("full", k, v).  MiniMax has
    no conv window, so the tail is a zero-width placeholder."""
    B, S, H = x.shape
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    if "qkv_proj" in weights:
        q, k, v = _lightning_qkv(weights, h, cfg, lf)
        if cache_in is None:
            o, state = lightning_attention(q, k, v, weights["slope_rate"],
                                           cfg.block_size,
                                           return_state=True)
        else:
            o, state = lightning_step(q, k, v, weights["slope_rate"],
                                      cache_in[2])
        y = _lightning_attn_out(weights, h, cfg, lf, o)
        pieces = ("lin", jnp.zeros((B, 0, 0), x.dtype), state)
        a, b = cfg.linear_attn_alpha_factor, cfg.linear_attn_beta_factor
    else:
        hd = cfg.hd
        q = lf("q_proj", h, weights["q_proj"]).reshape(B, S, cfg.num_heads,
                                                       hd)
        k = lf("k_proj", h, weights["k_proj"]).reshape(
            B, S, cfg.num_kv_heads, hd)
        v = lf("v_proj", h, weights["v_proj"]).reshape(
            B, S, cfg.num_kv_heads, hd)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        if cache_in is None:
            attn = llama.attention(q, k, v, None, cfg)
            k_new, v_new = k, v
        else:
            k_all, v_all = cache_in[1], cache_in[2]
            k_full = jax.lax.dynamic_update_slice(
                k_all, k.astype(k_all.dtype), (0, pos, 0, 0))
            v_full = jax.lax.dynamic_update_slice(
                v_all, v.astype(v_all.dtype), (0, pos, 0, 0))
            T = k_full.shape[1]
            bias = jnp.where(jnp.arange(T) <= pos, 0.0,
                             -1e30)[None, None, None, :]
            attn = llama.attention(q, k_full, v_full, bias, cfg)
            k_new, v_new = k, v
        y = lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])
        pieces = ("full", k_new, v_new)
        a, b = cfg.full_attn_alpha_factor, cfg.full_attn_beta_factor
    x = h * a + y * b
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    from .. import envs
    moe = mixtral._moe_mlp(weights, h, cfg, lf,
                           capacity_factor=envs.AR_MOE_CAPACITY_FACTOR)
    return h * cfg.mlp_alpha_factor + moe * cfg.mlp_beta_factor, pieces


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: MiniMaxConfig) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    S = input_ids.shape[1]
    cos, sin = llama.rope_tables(cfg, S)
    for li, w in enumerate(params["blocks"]):
        x = block_fwd(w, x, cos, sin, cfg,
                      linear_attn=layer_is_linear(cfg, li))
    return llama.final_fwd(params, x, cfg)


def _mk_types(n, full_every=2):
    return tuple("full_attention" if i % full_every == 0
                 else "linear_attention" for i in range(n))


CONFIG_PRESETS: Dict[str, MiniMaxConfig] = {
    "tiny-minimax": MiniMaxConfig(
        vocab_size=256, hidden_size=64, intermediate_size=64,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, num_experts=4, top_k=2, norm_topk_prob=True,
        layer_types=("linear_attention", "full_attention",
                     "linear_attention", "full_attention"),
        block_size=8, dtype=jnp.float32),
    # MiniMax-Text-01 / M1 class (456B-A45.9B): 7 linear : 1 full
    "minimax-text-01": MiniMaxConfig(
        vocab_size=200064, hidden_size=6144, intermediate_size=9216,
        num_layers=80, num_heads=64, num_kv_heads=8, head_dim=128,
        rope_theta=10000000.0, num_experts=32, top_k=2,
        norm_topk_prob=True,
        layer_types=tuple("full_attention" if (i + 1) % 8 == 0
                          else "linear_attention" for i in range(80)),
        block_size=256),
}
