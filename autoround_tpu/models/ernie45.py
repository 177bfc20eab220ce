"""Ernie 4.5 MoE family (Baidu): interval-gated MoE decoder.

Role of the reference's ernie4_5 expert spec
(``modeling/unfused_moe/ernie4_5_moe.py``: per-expert linears +
``Ernie4_5_MoeTopKRouter`` semantics); modeling mirrors HF
``Ernie4_5_MoeForCausalLM``.  Distinctive wiring vs the other MoE
families in this zoo:

* router — fp32 gate → softmax over ALL experts; top-k SELECTION runs on
  ``probs + e_score_correction_bias`` (the "moe statics" bias steers
  selection only), the combine weights are the ORIGINAL probs gathered at
  the selected experts, normalized by a sum clamped at ``moe_norm_min``;
* interval gating — layer li is MoE iff ``(li+1) % moe_layer_interval
  == 0 and start <= li <= end``, everything else is a dense SwiGLU MLP
  (DeepSeek gates only a leading prefix; Ernie gates periodically);
* always-on shared experts of width ``n_shared * moe_intermediate``.

Attention is llama GQA (optional biases via ``use_bias``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig, rms_norm

__all__ = ["Ernie45Config", "init_params", "block_fwd", "model_fwd",
           "block_linear_names", "layer_is_moe", "CONFIG_PRESETS"]

_MLP = ("gate_proj", "up_proj", "down_proj")


@dataclass(frozen=True)
class Ernie45Config(LlamaConfig):
    moe_num_experts: int = 64
    moe_k: int = 6
    moe_intermediate_size: int = 1536
    moe_num_shared_experts: int = 2
    moe_layer_start_index: int = 1
    moe_layer_end_index: int = 10 ** 9   # HF default: last layer
    moe_layer_interval: int = 1
    moe_norm_min: float = 1e-12
    use_bias: bool = False


CONFIG_PRESETS: Dict[str, Ernie45Config] = {
    "tiny-ernie45": Ernie45Config(
        vocab_size=256, hidden_size=64, intermediate_size=160,
        num_layers=3, num_heads=4, num_kv_heads=2, rope_theta=5e5,
        moe_num_experts=4, moe_k=2, moe_intermediate_size=48,
        moe_num_shared_experts=1, moe_layer_start_index=1,
        moe_layer_interval=1, tie_embeddings=True, dtype=jnp.float32),
    # ERNIE-4.5-21B-A3B shapes (HF config defaults scaled to the
    # published 21B-A3B card: 28 layers, 64 experts top-6)
    "ernie4.5-21b-a3b": Ernie45Config(
        vocab_size=103424, hidden_size=2560, intermediate_size=12288,
        num_layers=28, num_heads=20, num_kv_heads=4, rope_theta=5e5,
        moe_num_experts=64, moe_k=6, moe_intermediate_size=1536,
        moe_num_shared_experts=2, moe_layer_start_index=1,
        moe_layer_interval=1, tie_embeddings=True),
}


def layer_is_moe(cfg: Ernie45Config, li: int) -> bool:
    return ((li + 1) % cfg.moe_layer_interval == 0
            and cfg.moe_layer_start_index <= li <= cfg.moe_layer_end_index)


def block_linear_names(cfg: Ernie45Config) -> Tuple[str, ...]:
    """Union across blocks; dense blocks lack expert leaves (the plan
    prunes per-block, api.py)."""
    attn = ("q_proj", "k_proj", "v_proj", "o_proj")
    experts = tuple(f"experts.{e}.{w}"
                    for e in range(cfg.moe_num_experts) for w in _MLP)
    shared = (tuple(f"shared_experts.{w}" for w in _MLP)
              if cfg.moe_num_shared_experts else ())
    return attn + _MLP + experts + shared


def _mlp_weights(key, I: int, H: int, dtype, n_layers: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate_proj": jax.random.normal(k1, (I, H), dtype) * 0.02,
        "up_proj": jax.random.normal(k2, (I, H), dtype) * 0.02,
        "down_proj": jax.random.normal(k3, (H, I), dtype) * 0.02
                     / np.sqrt(2 * n_layers),
    }


def init_params(cfg: Ernie45Config, key: jax.Array) -> Dict[str, Any]:
    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 8)
        b = {
            "q_proj": jax.random.normal(bk[0], (qd, H), cfg.dtype) * 0.02,
            "k_proj": jax.random.normal(bk[1], (kvd, H), cfg.dtype) * 0.02,
            "v_proj": jax.random.normal(bk[2], (kvd, H), cfg.dtype) * 0.02,
            "o_proj": jax.random.normal(bk[3], (H, qd), cfg.dtype) * 0.02,
            "input_layernorm": jnp.ones((H,), cfg.dtype),
            "post_attention_layernorm": jnp.ones((H,), cfg.dtype),
        }
        if cfg.use_bias:
            b["q_bias"] = jnp.zeros((qd,), cfg.dtype)
            b["k_bias"] = jnp.zeros((kvd,), cfg.dtype)
            b["v_bias"] = jnp.zeros((kvd,), cfg.dtype)
        if layer_is_moe(cfg, li):
            b["router"] = jax.random.normal(
                bk[4], (cfg.moe_num_experts, H), jnp.float32) * 0.02
            b["e_score_correction_bias"] = jnp.zeros(
                (cfg.moe_num_experts,), jnp.float32)
            b["experts"] = [
                _mlp_weights(jax.random.fold_in(bk[5], e),
                             cfg.moe_intermediate_size, H, cfg.dtype,
                             cfg.num_layers)
                for e in range(cfg.moe_num_experts)]
            if cfg.moe_num_shared_experts:
                b["shared_experts"] = _mlp_weights(
                    bk[6],
                    cfg.moe_intermediate_size * cfg.moe_num_shared_experts,
                    H, cfg.dtype, cfg.num_layers)
        else:
            b.update(_mlp_weights(bk[7], cfg.intermediate_size, H,
                                  cfg.dtype, cfg.num_layers))
        blocks.append(b)
    params = {
        "embed_tokens": jax.random.normal(keys[-2], (cfg.vocab_size, H),
                                          cfg.dtype) * 0.02,
        "norm": jnp.ones((H,), cfg.dtype),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(
            keys[-1], (cfg.vocab_size, H), cfg.dtype) * 0.02
    return params


def _apply_rope_interleaved(x: jax.Array, cos, sin) -> jax.Array:
    """GLM-style INTERLEAVED rope (HF ``Ernie4_5_Moe.rotate_half``: pairs
    are (x[2i], x[2i+1]) sharing freq i — not llama's split halves).
    ``cos/sin`` are the standard (S, hd) cat(freqs, freqs) tables; the
    leading half carries the per-pair angles."""
    hd = x.shape[-1]
    c = cos[None, :, None, : hd // 2].astype(jnp.float32)
    s = sin[None, :, None, : hd // 2].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., 0::2], xf[..., 1::2]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape).astype(x.dtype)


def _swiglu(weights, h, lf, prefix: str):
    gate = jax.nn.silu(lf(f"{prefix}gate_proj", h, weights["gate_proj"]))
    up = lf(f"{prefix}up_proj", h, weights["up_proj"])
    return lf(f"{prefix}down_proj", gate * up, weights["down_proj"])


def _ernie_moe(weights, h, cfg: Ernie45Config, lf):
    """Bias-steered selection, original-prob combine (HF
    ``Ernie4_5_MoeSparseMoeBlock.forward``)."""
    logits = lf("router", h.astype(jnp.float32),
                weights["router"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)               # (B,S,E) f32
    biased = probs + weights["e_score_correction_bias"].astype(jnp.float32)
    _, topi = jax.lax.top_k(biased, cfg.moe_k)
    topv = jnp.take_along_axis(probs, topi, axis=-1)
    topv = topv / jnp.maximum(jnp.sum(topv, axis=-1, keepdims=True),
                              cfg.moe_norm_min)
    out = jnp.zeros_like(h, dtype=jnp.float32)
    # dense-then-mask (exact; calibration default — mixtral.py note)
    for e, ew in enumerate(weights["experts"]):
        y = _swiglu(ew, h, lf, f"experts.{e}.").astype(jnp.float32)
        w_e = jnp.sum(jnp.where(topi == e, topv, 0.0), axis=-1)
        out = out + y * w_e[..., None]
    if "shared_experts" in weights:
        out = out + _swiglu(weights["shared_experts"], h, lf,
                            "shared_experts.").astype(jnp.float32)
    return out.astype(h.dtype)


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: Ernie45Config, mask=None, linear_fn=None) -> jax.Array:
    lf = linear_fn or llama._plain_linear
    B, S, H = x.shape
    hd = cfg.hd
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    q = lf("q_proj", h, weights["q_proj"], weights.get("q_bias")
           ).reshape(B, S, cfg.num_heads, hd)
    k = lf("k_proj", h, weights["k_proj"], weights.get("k_bias")
           ).reshape(B, S, cfg.num_kv_heads, hd)
    v = lf("v_proj", h, weights["v_proj"], weights.get("v_bias")
           ).reshape(B, S, cfg.num_kv_heads, hd)
    q = _apply_rope_interleaved(q, cos, sin)
    k = _apply_rope_interleaved(k, cos, sin)
    attn = llama.attention(q, k, v, mask, cfg).reshape(B, S, -1)
    x = x + lf("o_proj", attn, weights["o_proj"])

    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    if "experts" in weights:
        x = x + _ernie_moe(weights, h, cfg, lf)
    else:
        x = x + _swiglu(weights, h, lf, "")
    return x


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: Ernie45Config) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = llama.rope_tables(cfg, input_ids.shape[1])
    for b in params["blocks"]:
        x = block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
