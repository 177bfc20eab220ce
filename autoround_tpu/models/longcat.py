"""LongCat-Flash family (Meituan): shortcut-connected MoE (ScMoE) with
zero-computation experts over MLA attention.

Role of the reference's longcat_next support (template registration
``compressors/mllm/template.py:130``); modeling mirrors HF
``LongcatFlashForCausalLM``.  Distinctive wiring vs every other family
in this zoo:

* each decoder block holds TWO MLA attention sublayers and TWO dense
  SwiGLU MLPs; the MoE runs on the FIRST post-attention stream and its
  output rides a SHORTCUT over the second attention+MLP pair, joining
  the residual at the block end (ScMoE: expert compute overlaps the
  next sublayer's latency in the original system);
* ZERO-COMPUTATION experts: ``zero_expert_num`` of the routed experts
  are identities — a token routed there contributes ``weight * h``
  with no FLOPs (the router learns to spend compute only where it
  matters).  Dense-then-mask form: one fused ``h * w_zero`` term;
* router: fp32 softmax scores over real+zero experts, bias-steered
  top-k selection, UNNORMALIZED original-score weights scaled by
  ``routed_scaling_factor`` (deepseek-V3 conventions minus renorm);
* MLA q/kv low-rank scale correction: ``(H / q_lora_rank)^0.5`` on the
  query halves and ``(H / kv_lora_rank)^0.5`` on the normed kv latent
  (HF ``mla_scale_q_lora`` / ``mla_scale_kv_lora``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import deepseek, llama
from .deepseek import _rope_rotate
from .llama import rms_norm

__all__ = ["LongcatConfig", "init_params", "block_fwd", "model_fwd",
           "block_linear_names", "CONFIG_PRESETS"]

_MLP = ("gate_proj", "up_proj", "down_proj")


@dataclass(frozen=True)
class LongcatConfig(deepseek.DeepseekConfig):
    zero_expert_num: int = 256

    @property
    def total_experts(self) -> int:
        return self.n_routed_experts + self.zero_expert_num


CONFIG_PRESETS: Dict[str, LongcatConfig] = {
    "tiny-longcat": LongcatConfig(
        vocab_size=256, hidden_size=96, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, rope_theta=1e7,
        q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=4, zero_expert_num=2, num_experts_per_tok=2,
        moe_intermediate_size=48, n_shared_experts=0, first_k_dense=0,
        routed_scaling_factor=1.5, scoring_func="softmax",
        norm_topk_prob=False, rope_interleave=True,
        dtype=jnp.float32),
}


def block_linear_names(cfg: LongcatConfig) -> Tuple[str, ...]:
    attn = ("q_a_proj", "q_b_proj", "kv_a_proj_with_mqa", "kv_b_proj",
            "o_proj")
    names: Tuple[str, ...] = ()
    for s in ("_0", "_1"):
        names += tuple(n + s for n in attn) + tuple(w + s for w in _MLP)
    names += tuple(f"experts.{e}.{w}"
                   for e in range(cfg.n_routed_experts) for w in _MLP)
    return names


def _mlp_weights(key, I, H, dtype, nl):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"gate_proj": jax.random.normal(k1, (I, H), dtype) * 0.02,
            "up_proj": jax.random.normal(k2, (I, H), dtype) * 0.02,
            "down_proj": jax.random.normal(k3, (H, I), dtype) * 0.02
                         / np.sqrt(2 * nl)}


def init_params(cfg: LongcatConfig, key: jax.Array) -> Dict[str, Any]:
    H = cfg.hidden_size
    nh = cfg.num_heads
    qk = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for li in range(cfg.num_layers):
        b: Dict[str, Any] = {}
        for si, s in enumerate(("_0", "_1")):
            bk = jax.random.split(jax.random.fold_in(keys[li], si), 8)
            b[f"input_layernorm{s}"] = jnp.ones((H,), cfg.dtype)
            b[f"post_attention_layernorm{s}"] = jnp.ones((H,), cfg.dtype)
            b[f"q_a_proj{s}"] = jax.random.normal(
                bk[0], (cfg.q_lora_rank, H), cfg.dtype) * 0.02
            b[f"q_a_layernorm{s}"] = jnp.ones((cfg.q_lora_rank,), cfg.dtype)
            b[f"q_b_proj{s}"] = jax.random.normal(
                bk[1], (nh * qk, cfg.q_lora_rank), cfg.dtype) * 0.02
            b[f"kv_a_proj_with_mqa{s}"] = jax.random.normal(
                bk[2], (cfg.kv_lora_rank + cfg.qk_rope_head_dim, H),
                cfg.dtype) * 0.02
            b[f"kv_a_layernorm{s}"] = jnp.ones((cfg.kv_lora_rank,),
                                               cfg.dtype)
            b[f"kv_b_proj{s}"] = jax.random.normal(
                bk[3], (nh * (cfg.qk_nope_head_dim + cfg.v_head_dim),
                        cfg.kv_lora_rank), cfg.dtype) * 0.02
            b[f"o_proj{s}"] = jax.random.normal(
                bk[4], (H, nh * cfg.v_head_dim), cfg.dtype) * 0.02
            mw = _mlp_weights(bk[5], cfg.intermediate_size, H, cfg.dtype,
                              cfg.num_layers)
            for w in _MLP:
                b[w + s] = mw[w]
        mk = jax.random.split(jax.random.fold_in(keys[li], 99), 2)
        b["router"] = jax.random.normal(
            mk[0], (cfg.total_experts, H), jnp.float32) * 0.02
        b["e_score_correction_bias"] = jnp.zeros((cfg.total_experts,),
                                                 jnp.float32)
        b["experts"] = [
            _mlp_weights(jax.random.fold_in(mk[1], e),
                         cfg.moe_intermediate_size, H, cfg.dtype,
                         cfg.num_layers)
            for e in range(cfg.n_routed_experts)]
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


def _mla_sub(weights, h, cos, sin, cfg: LongcatConfig, lf, s: str,
             mask=None):
    """One MLA sublayer with the LongCat low-rank scale corrections."""
    B, S, H = h.shape
    nh, dn, dr = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    r = cfg.kv_lora_rank
    sq = float(np.sqrt(H / cfg.q_lora_rank))
    skv = float(np.sqrt(H / r))
    qa = lf(f"q_a_proj{s}", h, weights[f"q_a_proj{s}"])
    qa = rms_norm(qa, weights[f"q_a_layernorm{s}"], cfg.rms_eps)
    q = lf(f"q_b_proj{s}", qa, weights[f"q_b_proj{s}"])
    q = q.reshape(B, S, nh, dn + dr) * sq
    q_nope, q_rope = q[..., :dn], q[..., dn:]
    q_rope = _rope_rotate(q_rope, cos, sin, cfg.rope_interleave)

    ckv = lf(f"kv_a_proj_with_mqa{s}", h, weights[f"kv_a_proj_with_mqa{s}"])
    c_kv = rms_norm(ckv[..., :r], weights[f"kv_a_layernorm{s}"],
                    cfg.rms_eps) * skv
    k_rope = _rope_rotate(ckv[..., None, r:].reshape(B, S, 1, dr),
                          cos, sin, cfg.rope_interleave)
    kv = lf(f"kv_b_proj{s}", c_kv, weights[f"kv_b_proj{s}"])
    kv = kv.reshape(B, S, nh, dn + cfg.v_head_dim)
    k_nope, v = kv[..., :dn], kv[..., dn:]
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_rope, (B, S, nh, dr))], axis=-1)
    q = jnp.concatenate([q_nope, q_rope], axis=-1)
    acfg = dataclasses.replace(cfg, attn_scale=float(np.sqrt(
        cfg.qk_head_dim)))
    attn = llama.attention(q, k, v, mask, acfg).reshape(B, S, -1)
    return lf(f"o_proj{s}", attn, weights[f"o_proj{s}"])


def _sc_moe(weights, h, cfg: LongcatConfig, lf):
    """Zero-computation-expert MoE: bias-steered top-k over real+zero
    experts; zero slots contribute ``w * h`` identity terms."""
    logits = jnp.einsum("...h,eh->...e", h.astype(jnp.float32),
                        weights["router"].astype(jnp.float32))
    scores = jax.nn.softmax(logits, axis=-1)        # (B,S,E_total)
    choice = scores + weights["e_score_correction_bias"].astype(
        jnp.float32)
    _, topi = jax.lax.top_k(choice, cfg.num_experts_per_tok)
    topw = jnp.take_along_axis(scores, topi, axis=-1) \
        * cfg.routed_scaling_factor
    out = jnp.zeros_like(h, dtype=jnp.float32)
    act = llama._act(cfg.hidden_act)
    for e, ew in enumerate(weights["experts"]):
        gate = act(lf(f"experts.{e}.gate_proj", h, ew["gate_proj"]))
        up = lf(f"experts.{e}.up_proj", h, ew["up_proj"])
        y = lf(f"experts.{e}.down_proj", gate * up,
               ew["down_proj"]).astype(jnp.float32)
        w_e = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
        out = out + y * w_e[..., None]
    # zero-computation experts: identity contribution for slots routed
    # at indices >= n_routed_experts
    w_zero = jnp.sum(jnp.where(topi >= cfg.n_routed_experts, topw, 0.0),
                     axis=-1)
    out = out + h.astype(jnp.float32) * w_zero[..., None]
    return out.astype(h.dtype)


def _dense_mlp(weights, h, cfg, lf, s: str):
    act = llama._act(cfg.hidden_act)
    gate = act(lf(f"gate_proj{s}", h, weights[f"gate_proj{s}"]))
    up = lf(f"up_proj{s}", h, weights[f"up_proj{s}"])
    return lf(f"down_proj{s}", gate * up, weights[f"down_proj{s}"])


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: LongcatConfig, mask=None, linear_fn=None) -> jax.Array:
    lf = linear_fn or llama._plain_linear
    h = rms_norm(x, weights["input_layernorm_0"], cfg.rms_eps)
    x = x + _mla_sub(weights, h, cos, sin, cfg, lf, "_0", mask)
    h = rms_norm(x, weights["post_attention_layernorm_0"], cfg.rms_eps)
    shortcut = _sc_moe(weights, h, cfg, lf)
    x = x + _dense_mlp(weights, h, cfg, lf, "_0")
    h = rms_norm(x, weights["input_layernorm_1"], cfg.rms_eps)
    x = x + _mla_sub(weights, h, cos, sin, cfg, lf, "_1", mask)
    h = rms_norm(x, weights["post_attention_layernorm_1"], cfg.rms_eps)
    return x + _dense_mlp(weights, h, cfg, lf, "_1") + shortcut


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: LongcatConfig) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = deepseek.rope_tables(cfg, input_ids.shape[1])
    for b in params["blocks"]:
        x = block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
