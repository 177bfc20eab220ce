"""Pure-JAX GLM-4.5 (Glm4Moe) decoder: GQA attention with partial rotary
and optional per-head q/k norm + DeepSeek-style MoE.

Role of the reference's GLM MoE support (``auto_round/modeling/
unfused_moe/glm*.py`` — incl. ``glm_moe_dsa.py``, whose unfused expert
spec is this same DeepSeek-V3 routing verbatim: sigmoid scores +
aux-free bias, top-2-sum group limiting, shared experts; the DSA
attention variant has no public transformers modeling to lock parity
against).  The router/MoE semantics are identical to
DeepSeek-V3 (sigmoid scores + aux-free bias, top-2-sum group limiting,
routed_scaling_factor, shared experts, first_k_dense) — so
``Glm4MoeConfig`` subclasses :class:`~.deepseek.DeepseekConfig` and
reuses its ``_route``/``_moe_mlp``; only the attention differs (standard
GQA, rotary on the leading ``partial_rotary_factor``·hd dims, no MLA —
``kv_lora_rank = 0`` keeps it off the MLA serving path).

Numerics match ``transformers`` ``Glm4MoeForCausalLM`` (eager); locked
by logit parity in ``tests/test_glm4moe.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import deepseek, llama
from .deepseek import DeepseekConfig, _mlp, _moe_mlp
from .llama import rms_norm

__all__ = ["Glm4MoeConfig", "GlmMoeLiteConfig", "init_params", "block_fwd",
           "model_fwd", "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Glm4MoeConfig(DeepseekConfig):
    # no MLA: plain GQA projections (kv_lora_rank=0 is the marker the
    # registry/serving engine dispatch on)
    kv_lora_rank: int = 0
    partial_rotary_factor: float = 0.5


@dataclass(frozen=True)
class GlmMoeLiteConfig(DeepseekConfig):
    """GLM-4.6-Lite / "glmflash" (HF ``Glm4MoeLiteForCausalLM``,
    model_type ``glm4_moe_lite``): architecturally DeepSeek-V2 — MLA
    attention + DeepSeek-MoE with sigmoid scores, aux-free bias, group
    limiting and shared experts.  The reference's own GGUF converter
    exports it as ``MODEL_ARCH.DEEPSEEK2``
    (``export_to_gguf/conversion/glm.py:204-210``) and its unfused MoE
    spec (``modeling/unfused_moe/glm_moe_light.py``) is the
    DeepSeek-V3 routing verbatim, so everything dispatches through
    :mod:`.deepseek`; this subclass is the registry/loader marker plus
    GLM presets."""


CONFIG_PRESETS: Dict[str, Glm4MoeConfig] = {
    "tiny-glmlite": GlmMoeLiteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_kv_heads=4, rope_theta=10000.0,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=64,
        n_shared_experts=1, first_k_dense=1, routed_scaling_factor=1.8,
        scoring_func="sigmoid", n_group=2, topk_group=1,
        norm_topk_prob=True, dtype=jnp.float32),
    "tiny-glm4moe": Glm4MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, qk_norm=True, attn_bias=True,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=64,
        n_shared_experts=1, first_k_dense=1, routed_scaling_factor=1.0,
        scoring_func="sigmoid", n_group=2, topk_group=1,
        norm_topk_prob=True, dtype=jnp.float32),
    "glm-4.5-air": Glm4MoeConfig(
        vocab_size=151552, hidden_size=4096, intermediate_size=10944,
        num_layers=46, num_heads=96, num_kv_heads=8, head_dim=128,
        rope_theta=1000000.0, rms_eps=1e-5, qk_norm=True, attn_bias=True,
        n_routed_experts=128, num_experts_per_tok=8,
        moe_intermediate_size=1408, n_shared_experts=1, first_k_dense=1,
        routed_scaling_factor=1.0, scoring_func="sigmoid",
        norm_topk_prob=True),
}

_MLP = ("gate_proj", "up_proj", "down_proj")


def block_linear_names(cfg: Glm4MoeConfig) -> Tuple[str, ...]:
    names = ("q_proj", "k_proj", "v_proj", "o_proj") + _MLP
    if cfg.n_routed_experts:
        names += tuple(f"experts.{e}.{w}"
                       for e in range(cfg.n_routed_experts) for w in _MLP)
        if cfg.n_shared_experts:
            names += tuple(f"shared_experts.{w}" for w in _MLP)
    return names


def init_params(cfg: Glm4MoeConfig, key: jax.Array) -> Dict[str, Any]:
    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 8)
        b: Dict[str, Any] = {
            "q_proj": jax.random.normal(bk[0], (qd, H), cfg.dtype) * 0.02,
            "k_proj": jax.random.normal(bk[1], (kvd, H), cfg.dtype) * 0.02,
            "v_proj": jax.random.normal(bk[2], (kvd, H), cfg.dtype) * 0.02,
            "o_proj": jax.random.normal(bk[3], (H, qd), cfg.dtype) * 0.02
                      / np.sqrt(2 * cfg.num_layers),
            "input_layernorm": jnp.ones((H,), cfg.dtype),
            "post_attention_layernorm": jnp.ones((H,), cfg.dtype),
        }
        if cfg.attn_bias:
            b["q_bias"] = jnp.zeros((qd,), cfg.dtype)
            b["k_bias"] = jnp.zeros((kvd,), cfg.dtype)
            b["v_bias"] = jnp.zeros((kvd,), cfg.dtype)
        if cfg.qk_norm:
            b["q_norm"] = jnp.ones((hd,), cfg.dtype)
            b["k_norm"] = jnp.ones((hd,), cfg.dtype)
        if cfg.layer_is_moe(li):
            mi = cfg.moe_intermediate_size
            b["gate"] = jax.random.normal(
                bk[4], (cfg.n_routed_experts, H), cfg.dtype) * 0.02
            b["e_score_correction_bias"] = jnp.zeros(
                (cfg.n_routed_experts,), jnp.float32)
            b["experts"] = [
                deepseek._mlp_weights(jax.random.fold_in(bk[5], e), mi, H,
                                      cfg.dtype, cfg.num_layers)
                for e in range(cfg.n_routed_experts)]
            if cfg.n_shared_experts:
                b["shared_experts"] = deepseek._mlp_weights(
                    bk[6], mi * cfg.n_shared_experts, H, cfg.dtype,
                    cfg.num_layers)
        else:
            b.update(deepseek._mlp_weights(bk[4], cfg.intermediate_size, H,
                                           cfg.dtype, cfg.num_layers))
        blocks.append(b)
    params: Dict[str, Any] = {
        "embed_tokens": jax.random.normal(keys[-2], (cfg.vocab_size, H),
                                          cfg.dtype) * 0.02,
        "norm": jnp.ones((H,), cfg.dtype),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(keys[-1], (cfg.vocab_size, H),
                                              cfg.dtype) * 0.02
    return params


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: Glm4MoeConfig, mask=None, linear_fn=None) -> jax.Array:
    lf = linear_fn or llama._plain_linear
    B, S, H = x.shape
    hd = cfg.hd
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    q = lf("q_proj", h, weights["q_proj"], weights.get("q_bias"))
    k = lf("k_proj", h, weights["k_proj"], weights.get("k_bias"))
    v = lf("v_proj", h, weights["v_proj"], weights.get("v_bias"))
    q = q.reshape(B, S, cfg.num_heads, hd)
    k = k.reshape(B, S, cfg.num_kv_heads, hd)
    v = v.reshape(B, S, cfg.num_kv_heads, hd)
    if cfg.qk_norm:
        q = rms_norm(q, weights["q_norm"], cfg.rms_eps)
        k = rms_norm(k, weights["k_norm"], cfg.rms_eps)
    q = llama.apply_rope(q, cos, sin)      # partial rotary: cos is rd wide
    k = llama.apply_rope(k, cos, sin)
    attn = llama.attention(q, k, v, mask, cfg)
    x = x + lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    if "experts" in weights:
        x = x + _moe_mlp(weights, h, cfg, lf)
    else:
        x = x + _mlp(weights, h, cfg, lf)
    return x


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: Glm4MoeConfig) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = llama.rope_tables(cfg, input_ids.shape[1])
    for b in params["blocks"]:
        x = block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
