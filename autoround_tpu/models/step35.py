"""Pure-JAX Step-3.5 (StepFun ``Step3p5ForCausalLM``) decoder.

Role of the reference's Step-3.5 support (``modeling/fused_moe/
step3_5_moe.py`` — the MoE replacement spec: sigmoid router with
optional selection bias, renormalized gathered probs,
``routed_scaling_factor``, fp32 gate matmul, per-expert SwiGLU clamp
``limit``; the GGUF conversion ``export_to_gguf/conversion/step3.py:98``
which pins the rest of the architecture: hybrid full/sliding attention
layers with PER-TYPE head counts (``attention_other_setting``), dual
rope theta, partial rotary 0.5 on full layers vs 1.0 on sliding, (1+w)
RMSNorm folding, per-head sigmoid attention output gate ``g_proj``,
``moe_layers_enum`` leading-dense layout, shared expert of
``share_expert_dim``, appended MTP layers; ``special_model_handler.py``
"step3p5" ignore rules).

MTP draft layers (appended past ``num_layers``) are not modeled — the
reference's own handler excludes them from quantization
(``ignore_layers=[..., "layers.45"]``), and the loader here skips them.

No public ``transformers`` modeling exists in-container to lock logit
parity against (``require_version("transformers>=5.2.0")`` in the
reference spec); structure and quantization behaviour are pinned by
``tests/test_step35.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig, rms_norm

__all__ = ["Step35Config", "init_params", "block_fwd", "block_fwd_for",
           "model_fwd", "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Step35Config(LlamaConfig):
    # sliding layers may use different head counts
    # (HF ``attention_other_setting``); 0 → same as the full layers
    swa_num_heads: int = 0
    swa_num_kv_heads: int = 0
    # per-head sigmoid attention output gate (g_proj)
    attn_out_gate: bool = True
    # --- MoE (moe_layers lists the routed layers; others are dense) ---
    moe_layers: Tuple[int, ...] = ()
    moe_num_experts: int = 0
    moe_top_k: int = 1
    moe_intermediate_size: int = 0
    share_expert_dim: int = 0
    moe_router_scaling_factor: float = 1.0
    norm_expert_weight: bool = True
    use_moe_router_bias: bool = False
    # SwiGLU clamp: gate = silu(gate).clip(max=l); up = up.clip(-l, l)
    # (0 → no clamp); per the reference spec these may differ between
    # routed and shared experts
    swiglu_limit: float = 0.0
    swiglu_limit_shared: float = 0.0

    def heads_for(self, li: int) -> Tuple[int, int]:
        if llama.layer_is_sliding(self, li):
            return (self.swa_num_heads or self.num_heads,
                    self.swa_num_kv_heads or self.num_kv_heads)
        return self.num_heads, self.num_kv_heads

    def layer_is_moe(self, li: int) -> bool:
        return li in self.moe_layers


CONFIG_PRESETS: Dict[str, Step35Config] = {
    "tiny-step35": Step35Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=100000.0, rope_local_theta=10000.0,
        partial_rotary_factor=0.5, partial_rotary_factor_local=1.0,
        norm_offset=1.0, sliding_window=8,
        layer_types=("full_attention", "sliding_attention",
                     "full_attention", "sliding_attention"),
        moe_layers=(1, 2, 3), moe_num_experts=8, moe_top_k=2,
        moe_intermediate_size=32, share_expert_dim=64,
        moe_router_scaling_factor=1.5, norm_expert_weight=True,
        use_moe_router_bias=True, swiglu_limit=7.0,
        swiglu_limit_shared=7.0, dtype=jnp.float32),
}

_MLP = ("gate_proj", "up_proj", "down_proj")


def block_linear_names(cfg: Step35Config) -> Tuple[str, ...]:
    # g_proj stays FP — the reference ignores it ("g_proj shape issue",
    # special_model_handler.py step3p5); moe.gate likewise
    names = ("q_proj", "k_proj", "v_proj", "o_proj") + _MLP
    if cfg.moe_num_experts:
        names += tuple(f"experts.{e}.{w}"
                       for e in range(cfg.moe_num_experts) for w in _MLP)
        if cfg.share_expert_dim:
            names += tuple(f"shared_expert.{w}" for w in _MLP)
    return names


def _mlp_weights(key, I: int, H: int, dtype, n_layers: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate_proj": jax.random.normal(k1, (I, H), dtype) * 0.02,
        "up_proj": jax.random.normal(k2, (I, H), dtype) * 0.02,
        "down_proj": jax.random.normal(k3, (H, I), dtype) * 0.02
                     / np.sqrt(2 * n_layers),
    }


def init_params(cfg: Step35Config, key: jax.Array) -> Dict[str, Any]:
    H, hd = cfg.hidden_size, cfg.hd
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for li in range(cfg.num_layers):
        nh, nkv = cfg.heads_for(li)
        bk = jax.random.split(keys[li], 8)
        b: Dict[str, Any] = {
            "q_proj": jax.random.normal(bk[0], (nh * hd, H),
                                        cfg.dtype) * 0.02,
            "k_proj": jax.random.normal(bk[1], (nkv * hd, H),
                                        cfg.dtype) * 0.02,
            "v_proj": jax.random.normal(bk[2], (nkv * hd, H),
                                        cfg.dtype) * 0.02,
            "o_proj": jax.random.normal(bk[3], (H, nh * hd), cfg.dtype)
                      * 0.02 / np.sqrt(2 * cfg.num_layers),
            "input_layernorm": jnp.zeros((H,), cfg.dtype),
            "post_attention_layernorm": jnp.zeros((H,), cfg.dtype),
        }
        if cfg.attn_out_gate:
            b["g_proj"] = jax.random.normal(bk[4], (nh, H),
                                            cfg.dtype) * 0.02
        if cfg.layer_is_moe(li):
            b["gate"] = jax.random.normal(
                bk[5], (cfg.moe_num_experts, H), cfg.dtype) * 0.02
            if cfg.use_moe_router_bias:
                b["router_bias"] = jnp.zeros((cfg.moe_num_experts,),
                                             jnp.float32)
            b["experts"] = [
                _mlp_weights(jax.random.fold_in(bk[6], e),
                             cfg.moe_intermediate_size, H, cfg.dtype,
                             cfg.num_layers)
                for e in range(cfg.moe_num_experts)]
            if cfg.share_expert_dim:
                b["shared_expert"] = _mlp_weights(
                    bk[7], cfg.share_expert_dim, H, cfg.dtype,
                    cfg.num_layers)
        else:
            b.update(_mlp_weights(bk[5], cfg.intermediate_size, H,
                                  cfg.dtype, cfg.num_layers))
        blocks.append(b)
    params: Dict[str, Any] = {
        "embed_tokens": jax.random.normal(keys[-2], (cfg.vocab_size, H),
                                          cfg.dtype) * 0.02,
        "norm": jnp.zeros((H,), cfg.dtype),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(keys[-1], (cfg.vocab_size, H),
                                              cfg.dtype) * 0.02
    return params


def _clamped_mlp(weights, h, cfg: Step35Config, lf, limit: float,
                 prefix: str = ""):
    """SwiGLU with the Step-3.5 clamp: gate caps at +limit AFTER silu,
    up clips to ±limit (``Step3p5ExpertMLP.forward``)."""
    act = llama._act(cfg.hidden_act)
    gate = act(lf(f"{prefix}gate_proj", h, weights["gate_proj"]))
    up = lf(f"{prefix}up_proj", h, weights["up_proj"])
    if limit:
        gate = jnp.minimum(gate, limit)
        up = jnp.clip(up, -limit, limit)
    return lf(f"{prefix}down_proj", gate * up, weights["down_proj"])


def _route(h: jax.Array, weights, cfg: Step35Config):
    """Sigmoid scores; selection adds ``router_bias`` when present; the
    mixing weights are the UNBIASED gathered probs, renormalized, times
    ``moe_router_scaling_factor`` (``LinearStep3p5MoEMLP.forward`` +
    ``router_bias_func``)."""
    logits = jnp.einsum("...h,eh->...e", h.astype(jnp.float32),
                        weights["gate"].astype(jnp.float32))
    if cfg.use_moe_router_bias or "router_bias" in weights:
        scores = jax.nn.sigmoid(logits)
        choice = scores + weights["router_bias"]
    else:
        scores = jax.nn.softmax(logits, axis=-1)
        choice = scores
    _, topi = jax.lax.top_k(choice, cfg.moe_top_k)
    topw = jnp.take_along_axis(scores, topi, axis=-1)
    if cfg.norm_expert_weight:
        topw = topw / (jnp.sum(topw, axis=-1, keepdims=True) + 1e-20)
    return topi, topw * cfg.moe_router_scaling_factor


def _moe_mlp(weights, h, cfg: Step35Config, lf):
    topi, topw = _route(h, weights, cfg)
    out = jnp.zeros_like(h, dtype=jnp.float32)
    for e, ew in enumerate(weights["experts"]):
        y = _clamped_mlp(ew, h, cfg, lf, cfg.swiglu_limit,
                         prefix=f"experts.{e}.").astype(jnp.float32)
        w_e = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
        out = out + y * w_e[..., None]
    if "shared_expert" in weights:
        out = out + _clamped_mlp(
            weights["shared_expert"], h, cfg, lf, cfg.swiglu_limit_shared,
            prefix="shared_expert.").astype(jnp.float32)
    return out.astype(h.dtype)


def _block_impl(weights, x, cos, sin, cfg: Step35Config, nh: int,
                nkv: int, mask, lf):
    B, S, H = x.shape
    hd = cfg.hd
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps,
                 cfg.norm_offset)
    q = lf("q_proj", h, weights["q_proj"]).reshape(B, S, nh, hd)
    k = lf("k_proj", h, weights["k_proj"]).reshape(B, S, nkv, hd)
    v = lf("v_proj", h, weights["v_proj"]).reshape(B, S, nkv, hd)
    q = llama.apply_rope(q, cos, sin)     # partial when cos is rd < hd
    k = llama.apply_rope(k, cos, sin)
    attn = llama.attention(q, k, v, mask, cfg)
    if "g_proj" in weights:
        # per-head sigmoid output gate (kept FP, see block_linear_names)
        g = jax.nn.sigmoid(jnp.einsum(
            "bsh,nh->bsn", h.astype(jnp.float32),
            weights["g_proj"].astype(jnp.float32)))
        attn = attn * g[..., None].astype(attn.dtype)
    x = x + lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps,
                 cfg.norm_offset)
    if "experts" in weights:
        x = x + _moe_mlp(weights, h, cfg, lf)
    else:
        x = x + _clamped_mlp(weights, h, cfg, lf, cfg.swiglu_limit_shared)
    return x


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: Step35Config, mask=None, linear_fn=None) -> jax.Array:
    """Full-attention variant (num_heads / num_kv_heads)."""
    lf = linear_fn or llama._plain_linear
    return _block_impl(weights, x, cos, sin, cfg, cfg.num_heads,
                       cfg.num_kv_heads, mask, lf)


def _swa_block_fwd(weights, x, cos, sin, cfg: Step35Config, mask=None,
                   linear_fn=None):
    """Sliding variant (``attention_other_setting`` head counts)."""
    lf = linear_fn or llama._plain_linear
    nh = cfg.swa_num_heads or cfg.num_heads
    nkv = cfg.swa_num_kv_heads or cfg.num_kv_heads
    return _block_impl(weights, x, cos, sin, cfg, nh, nkv, mask, lf)


def block_fwd_for(cfg: Step35Config, li: int):
    """Stable per-kind callable (two identities max) — the orchestrator
    keys its compile caches on this."""
    return (_swa_block_fwd if llama.layer_is_sliding(cfg, li)
            else block_fwd)


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: Step35Config) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    S = input_ids.shape[1]
    cos, sin = llama.rope_tables(cfg, S)
    cosl, sinl = llama.rope_tables(cfg, S, local=True)
    smask = (llama.sliding_mask(cfg, S)
             if cfg.sliding_window and S > cfg.sliding_window else None)
    for li, b in enumerate(params["blocks"]):
        if llama.layer_is_sliding(cfg, li):
            x = _swa_block_fwd(b, x, cosl, sinl, cfg, mask=smask)
        else:
            x = block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
