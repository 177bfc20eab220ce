"""HF checkpoint ↔ functional pytree conversion for llama-family models.

Role of the reference's model loading (``auto_round/utils/model.py``
``llm_load_model`` + checkpoint-name conversion): read a HuggingFace
llama/qwen2/mistral safetensors checkpoint (sharded or single-file) into
the ``models.llama`` parameter pytree, and write one back (used to
fabricate test fixtures and to emit qdq "fake" checkpoints HF tools can
load).

Weights stay in the HF (out, in) layout — identical to ours, so loading is
copy-free aside from dtype casts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig
from .logger import logger

__all__ = ["load_hf_checkpoint", "save_hf_checkpoint", "config_from_hf"]

_BLOCK_MAP = {
    "self_attn.q_proj.weight": "q_proj",
    "self_attn.k_proj.weight": "k_proj",
    "self_attn.v_proj.weight": "v_proj",
    "self_attn.o_proj.weight": "o_proj",
    "self_attn.q_proj.bias": "q_bias",
    "self_attn.k_proj.bias": "k_bias",
    "self_attn.v_proj.bias": "v_bias",
    "mlp.gate_proj.weight": "gate_proj",
    "mlp.up_proj.weight": "up_proj",
    "mlp.down_proj.weight": "down_proj",
    "input_layernorm.weight": "input_layernorm",
    "post_attention_layernorm.weight": "post_attention_layernorm",
    # Qwen3 per-head qk-norm gains
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    # Gemma2 sandwich norms
    "pre_feedforward_layernorm.weight": "pre_feedforward_layernorm",
    "post_feedforward_layernorm.weight": "post_feedforward_layernorm",
}
_TOP_MAP = {
    "model.embed_tokens.weight": "embed_tokens",
    "model.norm.weight": "norm",
    "lm_head.weight": "lm_head",
}


def config_from_hf(cfg: Dict[str, Any], dtype=jnp.bfloat16) -> LlamaConfig:
    """HF config.json dict → LlamaConfig (per-arch quirks by model_type).
    Mixtral-style MoE configs (``num_local_experts``) yield a
    MixtralConfig (reference MoE model handling,
    ``modeling/fused_moe/replace_modules.py``)."""
    mt = cfg.get("model_type", "llama")
    gemma = mt.startswith("gemma")
    qpas = cfg.get("query_pre_attn_scalar")
    cls = LlamaConfig
    moe_kw = {}
    intermediate = cfg["intermediate_size"]
    if mt in ("deepseek_v2", "deepseek_v3"):
        return _deepseek_config_from_hf(cfg, mt, dtype)
    if mt == "glm4_moe_lite":
        # GLM-4.6-Lite: DeepSeek-V2 architecture with GLM vocab (the
        # reference exports it as DEEPSEEK2, conversion/glm.py:204)
        from ..models.glm4moe import GlmMoeLiteConfig
        return _deepseek_config_from_hf(cfg, "deepseek_v3", dtype,
                                        cls=GlmMoeLiteConfig)
    if mt == "glm_moe_dsa":
        # GLM-5: DeepSeek architecture + DSA lightning-indexer sparse
        # attention (models/glmdsa.py; ref unfused_moe/glm_moe_dsa.py)
        from ..models.glmdsa import GlmMoeDsaConfig
        return _deepseek_config_from_hf(
            cfg, "deepseek_v3", dtype, cls=GlmMoeDsaConfig,
            extra=dict(
                index_n_heads=cfg.get("index_n_heads", 64),
                index_head_dim=cfg.get("index_head_dim", 128),
                index_topk=cfg.get("index_topk", 2048),
                index_layers=tuple(cfg.get("index_layers") or ()),
            ))
    if mt == "step3p5":
        from ..models.step35 import Step35Config
        other = cfg.get("attention_other_setting") or {}
        theta = cfg.get("rope_theta", 10000.0)
        theta_local = 0.0
        if isinstance(theta, list):
            theta, theta_local = float(theta[0]), float(theta[1])
        moe_layers = ()
        enum = cfg.get("moe_layers_enum")
        if isinstance(enum, str) and enum.strip():
            moe_layers = tuple(sorted(int(i) for i in
                                      enum.strip().split(",")))
        limits = [v for v in (cfg.get("swiglu_limits") or []) if v]
        limits_sh = [v for v in (cfg.get("swiglu_limits_shared") or [])
                     if v]
        return Step35Config(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_attention_groups",
                                 cfg.get("num_key_value_heads",
                                         cfg["num_attention_heads"])),
            head_dim=cfg.get("head_dim"),
            rope_theta=theta, rope_local_theta=theta_local,
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            tie_embeddings=cfg.get("tie_word_embeddings", False),
            norm_offset=1.0,      # (1 + w) RMSNorm fold (conversion
                                  # step3.py:260 stores w+1 for llama.cpp)
            partial_rotary_factor=0.5,
            partial_rotary_factor_local=1.0,
            sliding_window=cfg.get("sliding_window"),
            layer_types=tuple(cfg.get("layer_types")
                              or ())[:cfg["num_hidden_layers"]] or None,
            swa_num_heads=other.get("num_attention_heads", 0),
            swa_num_kv_heads=other.get("num_attention_groups", 0),
            moe_layers=moe_layers,
            moe_num_experts=cfg.get("moe_num_experts", 0),
            moe_top_k=cfg.get("moe_top_k", 1),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            share_expert_dim=cfg.get("share_expert_dim", 0),
            moe_router_scaling_factor=cfg.get(
                "moe_router_scaling_factor", 1.0),
            norm_expert_weight=cfg.get("norm_expert_weight", True),
            use_moe_router_bias=cfg.get("use_moe_router_bias", False),
            swiglu_limit=float(limits[0]) if limits else 0.0,
            swiglu_limit_shared=float(limits_sh[0]) if limits_sh else 0.0,
            dtype=dtype,
        )
    if mt == "glm4_moe":
        # GLM-4.5: GQA attention (partial rotary, optional qk-norm) +
        # DeepSeek-V3-style router/MoE
        from ..models.glm4moe import Glm4MoeConfig
        return Glm4MoeConfig(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_key_value_heads",
                                 cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            tie_embeddings=cfg.get("tie_word_embeddings", False),
            attn_bias=cfg.get("attention_bias", False),
            qk_norm=cfg.get("use_qk_norm", False),
            partial_rotary_factor=cfg.get("partial_rotary_factor", 0.5),
            n_routed_experts=cfg.get("n_routed_experts") or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok", 8),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            n_shared_experts=cfg.get("n_shared_experts") or 0,
            first_k_dense=cfg.get("first_k_dense_replace", 1),
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
            scoring_func="sigmoid",
            n_group=cfg.get("n_group", 1),
            topk_group=cfg.get("topk_group", 1),
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            dtype=dtype,
        )
    if mt == "llama4_text":
        from ..models.llama4 import Llama4Config
        lt = cfg.get("layer_types")
        return Llama4Config(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            intermediate_size_mlp=cfg.get("intermediate_size_mlp",
                                          cfg["intermediate_size"]),
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_key_value_heads",
                                 cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            rope_theta=cfg.get("rope_theta", 500000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            tie_embeddings=cfg.get("tie_word_embeddings", False),
            attn_bias=cfg.get("attention_bias", False),
            num_experts=cfg.get("num_local_experts", 16),
            top_k=cfg.get("num_experts_per_tok", 1),
            moe_layers=tuple(cfg.get("moe_layers")
                             or range(cfg.get("interleave_moe_layer_step",
                                              1) - 1,
                                      cfg["num_hidden_layers"],
                                      cfg.get("interleave_moe_layer_step",
                                              1))),
            no_rope_layers=tuple(cfg.get("no_rope_layers") or ()),
            # rope layers attend chunked: chunk size rides the shared
            # sliding_window field with chunked_attention=True
            sliding_window=cfg.get("attention_chunk_size", 8192),
            layer_types=(tuple(
                "sliding_attention" if t == "chunked_attention" else t
                for t in lt) if lt else None),
            use_qk_norm=cfg.get("use_qk_norm", True),
            attn_temperature_tuning=bool(
                cfg.get("attn_temperature_tuning", True)),
            floor_scale=cfg.get("floor_scale", 8192.0),
            temp_attn_scale=cfg.get("attn_scale", 0.1),
            rope_llama3=_llama3_rope(cfg),
            dtype=dtype,
        )
    if mt in ("qwen3_next", "qwen3_5_moe", "qwen3_5"):
        # Qwen3.5(-MoE) is the Qwen3-Next hybrid with fused expert
        # checkpoint stacks + an mtp.* draft namespace (reference
        # modeling/fused_moe/qwen3_5_moe.py); text-only positions
        # collapse its interleaved MRoPE to standard rope
        from ..models.qwen3next import Qwen35MoeConfig, Qwen3NextConfig
        ncls = Qwen3NextConfig if mt == "qwen3_next" else Qwen35MoeConfig
        step = cfg.get("decoder_sparse_step", 1)
        mlp_only = set(cfg.get("mlp_only_layers") or ())
        if cfg.get("num_experts", 0) and step > 1:
            mlp_only |= {li for li in range(cfg["num_hidden_layers"])
                         if (li + 1) % step != 0}
        return ncls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_key_value_heads",
                                 cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-6),
            tie_embeddings=cfg.get("tie_word_embeddings", False),
            norm_offset=1.0,   # Qwen3NextRMSNorm is zero-centered (1+w)
            partial_rotary_factor=cfg.get("partial_rotary_factor", 0.25),
            layer_types=tuple(cfg.get("layer_types") or ()),
            linear_num_key_heads=cfg.get("linear_num_key_heads", 16),
            linear_num_value_heads=cfg.get("linear_num_value_heads", 32),
            linear_key_head_dim=cfg.get("linear_key_head_dim", 128),
            linear_value_head_dim=cfg.get("linear_value_head_dim", 128),
            linear_conv_kernel_dim=cfg.get("linear_conv_kernel_dim", 4),
            num_experts=cfg.get("num_experts", 0),
            top_k=cfg.get("num_experts_per_tok", 2),
            shared_expert_intermediate=cfg.get(
                "shared_expert_intermediate_size", 0) or 0,
            shared_expert_gate=(cfg.get(
                "shared_expert_intermediate_size", 0) or 0) > 0,
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            mlp_only_layers=tuple(sorted(mlp_only)),
            dtype=dtype,
        )
    if mt == "minimax":
        from ..models.minimax import MiniMaxConfig
        return MiniMaxConfig(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_key_value_heads",
                                 cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            rope_theta=cfg.get("rope_theta", 1e7),
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            tie_embeddings=cfg.get("tie_word_embeddings", False),
            num_experts=cfg.get("num_local_experts", 8),
            top_k=cfg.get("num_experts_per_tok", 2),
            norm_topk_prob=True,   # MiniMaxSparseMoeBlock normalizes
            layer_types=tuple(cfg.get("layer_types") or ()),
            block_size=cfg.get("block_size", 256),
            full_attn_alpha_factor=cfg.get("full_attn_alpha_factor", 1.0),
            full_attn_beta_factor=cfg.get("full_attn_beta_factor", 1.0),
            linear_attn_alpha_factor=cfg.get("linear_attn_alpha_factor",
                                             1.0),
            linear_attn_beta_factor=cfg.get("linear_attn_beta_factor",
                                            1.0),
            mlp_alpha_factor=cfg.get("mlp_alpha_factor", 1.0),
            mlp_beta_factor=cfg.get("mlp_beta_factor", 1.0),
            dtype=dtype,
        )
    if mt == "gpt_oss":
        from ..models.gptoss import GptOssConfig
        rs = cfg.get("rope_scaling") or {}
        return GptOssConfig(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_key_value_heads",
                                 cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            rope_theta=cfg.get("rope_theta", 150000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            tie_embeddings=cfg.get("tie_word_embeddings", False),
            attn_bias=cfg.get("attention_bias", True),
            sliding_window=cfg.get("sliding_window"),
            num_experts=cfg.get("num_local_experts", 32),
            top_k=cfg.get("num_experts_per_tok", 4),
            yarn_factor=(rs.get("factor", 0.0)
                         if rs.get("rope_type") == "yarn" else 0.0),
            yarn_beta_fast=rs.get("beta_fast", 32.0),
            yarn_beta_slow=rs.get("beta_slow", 1.0),
            yarn_original_max_pos=rs.get(
                "original_max_position_embeddings",
                cfg.get("max_position_embeddings", 4096)),
            yarn_truncate=rs.get("truncate", True),
            yarn_attention_factor=rs.get("attention_factor") or 0.0,
            dtype=dtype,
        )
    if cfg.get("num_local_experts") or mt == "mixtral":
        from ..models.mixtral import MixtralConfig
        cls = MixtralConfig
        moe_kw = dict(num_experts=cfg.get("num_local_experts", 8),
                      top_k=cfg.get("num_experts_per_tok", 2))
    elif mt in ("qwen2_moe", "qwen3_moe") or cfg.get("num_experts"):
        # Qwen2-MoE: routed experts at moe_intermediate_size + an
        # always-on sigmoid-gated shared expert.  Qwen3-MoE: same expert
        # layout, no shared expert, per-head q/k RMSNorm.
        from ..models.mixtral import MixtralConfig
        cls = MixtralConfig
        intermediate = cfg.get("moe_intermediate_size", intermediate)
        moe_kw = dict(
            num_experts=cfg.get("num_experts", 8),
            top_k=cfg.get("num_experts_per_tok", 2),
            shared_expert_intermediate=cfg.get(
                "shared_expert_intermediate_size", 0) or 0,
            shared_expert_gate=(cfg.get(
                "shared_expert_intermediate_size", 0) or 0) > 0,
            norm_topk_prob=cfg.get("norm_topk_prob", True))
    return cls(
        **moe_kw,
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=intermediate,
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg.get("num_key_value_heads",
                             cfg["num_attention_heads"]),
        head_dim=cfg.get("head_dim"),
        rope_theta=cfg.get("rope_theta", 10000.0),
        rms_eps=cfg.get("rms_norm_eps", 1e-5),
        tie_embeddings=cfg.get("tie_word_embeddings", gemma),
        attn_bias=cfg.get("attention_bias", mt in ("qwen2", "qwen2_moe")),
        qk_norm=mt in ("qwen3", "qwen3_moe", "gemma3_text"),
        norm_offset=1.0 if gemma else 0.0,
        # Gemma2 names the field hidden_activation; others hidden_act
        hidden_act=("gelu_tanh" if cfg.get(
            "hidden_activation", cfg.get("hidden_act", "silu"))
            in ("gelu_pytorch_tanh", "gelu_tanh") else "silu"),
        embed_scale=gemma,
        sandwich_norms=mt in ("gemma2", "gemma3_text"),
        attn_logit_softcap=cfg.get("attn_logit_softcapping") or 0.0,
        final_logit_softcap=cfg.get("final_logit_softcapping") or 0.0,
        attn_scale=(float(qpas) ** 0.5 if qpas else None),
        sliding_window=(cfg.get("sliding_window")
                        if mt in ("gemma2", "gemma3_text") else None),
        # Gemma3: arbitrary sliding pattern + dual rope (local base
        # frequency on sliding layers, linear scaling on global layers)
        layer_types=(tuple(cfg["layer_types"])
                     if mt == "gemma3_text" and cfg.get("layer_types")
                     else None),
        rope_local_theta=(cfg.get("rope_local_base_freq", 0.0)
                          if mt == "gemma3_text" else 0.0),
        rope_scaling_factor=(
            (cfg.get("rope_scaling") or {}).get("factor", 1.0)
            if mt == "gemma3_text" and (cfg.get("rope_scaling") or {}
                                        ).get("rope_type") == "linear"
            else 1.0),
        rope_llama3=_llama3_rope(cfg),
        dtype=dtype,
    )


def _llama3_rope(cfg: Dict[str, Any]):
    """HF rope_scaling rope_type 'llama3' → (factor, low, high, orig)
    (Llama-3.1+, Llama-4 Scout)."""
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) != "llama3":
        return None
    return (rs.get("factor", 8.0), rs.get("low_freq_factor", 1.0),
            rs.get("high_freq_factor", 4.0),
            rs.get("original_max_position_embeddings", 8192))


def _deepseek_config_from_hf(cfg: Dict[str, Any], mt: str, dtype,
                             cls=None, extra=None):
    """DeepSeek V2/V3 (MLA + DeepSeek-MoE) HF config → DeepseekConfig.

    V3 routers score with sigmoid + aux-free bias and group by top-2 sum
    (``noaux_tc``); V2 scores with softmax (``greedy`` /
    ``group_limited_greedy``).  Yarn's mscale folds into the softmax
    scale (reference handles this inside the model; here it is one
    config scalar)."""
    from ..models.deepseek import DeepseekConfig

    v3 = mt == "deepseek_v3"
    rs = cfg.get("rope_scaling") or {}
    is_yarn = rs.get("rope_type", rs.get("type")) == "yarn"
    mscale = 1.0
    if rs.get("mscale_all_dim") and rs.get("factor", 1.0) > 1.0:
        mscale = 0.1 * rs["mscale_all_dim"] * float(
            np.log(rs["factor"])) + 1.0
    topk_method = cfg.get("topk_method", "noaux_tc" if v3 else "greedy")
    grouped = topk_method in ("noaux_tc", "group_limited_greedy")
    return (cls or DeepseekConfig)(
        **(extra or {}),
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg.get("num_key_value_heads",
                             cfg["num_attention_heads"]),
        rope_theta=cfg.get("rope_theta", 10000.0),
        rms_eps=cfg.get("rms_norm_eps", 1e-6),
        tie_embeddings=cfg.get("tie_word_embeddings", False),
        q_lora_rank=cfg.get("q_lora_rank") or 0,
        kv_lora_rank=cfg.get("kv_lora_rank", 512),
        qk_nope_head_dim=cfg.get("qk_nope_head_dim", 128),
        qk_rope_head_dim=cfg.get("qk_rope_head_dim", 64),
        v_head_dim=cfg.get("v_head_dim", 128),
        # V2's complex-pair rope is score-equivalent to the interleaved
        # permutation (both q and k share it)
        rope_interleave=cfg.get("rope_interleave", True),
        mscale=mscale,
        # yarn NTK-by-parts frequency interpolation (the matching half of
        # the mscale score correction above — deepseek.rope_tables)
        yarn_factor=rs.get("factor", 0.0) if is_yarn else 0.0,
        yarn_beta_fast=rs.get("beta_fast", 32.0),
        yarn_beta_slow=rs.get("beta_slow", 1.0),
        yarn_original_max_pos=rs.get(
            "original_max_position_embeddings", 4096),
        yarn_mscale=rs.get("mscale", 1.0),
        yarn_mscale_all_dim=rs.get("mscale_all_dim", 0.0),
        n_routed_experts=cfg.get("n_routed_experts") or 0,
        num_experts_per_tok=cfg.get("num_experts_per_tok", 6),
        moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
        n_shared_experts=cfg.get("n_shared_experts") or 0,
        first_k_dense=cfg.get("first_k_dense_replace", 1),
        routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
        scoring_func=cfg.get("scoring_func",
                             "sigmoid" if v3 else "softmax"),
        n_group=cfg.get("n_group", 1) if grouped else 1,
        topk_group=cfg.get("topk_group", 1) if grouped else 1,
        norm_topk_prob=cfg.get("norm_topk_prob", v3),
        dtype=dtype,
    )


def _map_llama4_key(sub: str, block: Dict[str, Any], arr,
                    n_experts: int) -> bool:
    """Llama4 feed_forward keys; the fused expert tensors split into
    per-expert linears (gate_up_proj (E, H, 2I) gate/up CHUNKED halves,
    down_proj (E, I, H) — HF ``Llama4TextExperts``)."""
    simple = {"feed_forward.gate_proj.weight": "gate_proj",
              "feed_forward.up_proj.weight": "up_proj",
              "feed_forward.down_proj.weight": "down_proj",
              "feed_forward.router.weight": "router"}
    if sub in simple:
        block[simple[sub]] = arr
        return True
    if sub.startswith("feed_forward.shared_expert."):
        wname = sub.split(".")[2]
        if wname in ("gate_proj", "up_proj", "down_proj"):
            block.setdefault("shared_expert", {})[wname] = arr
            return True
        return False
    if not sub.startswith("feed_forward.experts."):
        return False
    exps = block.setdefault("experts", [dict() for _ in range(n_experts)])
    name = sub[len("feed_forward.experts."):]
    if name == "gate_up_proj":                # (E, H, 2I) chunked halves
        I = arr.shape[2] // 2
        for e in range(n_experts):
            exps[e]["gate_proj"] = arr[e, :, :I].T
            exps[e]["up_proj"] = arr[e, :, I:].T
    elif name == "down_proj":                 # (E, I, H)
        for e in range(n_experts):
            exps[e]["down_proj"] = arr[e].T
    else:
        return False
    return True


def _map_gptoss_key(sub: str, block: Dict[str, Any], arr,
                    n_experts: int) -> bool:
    """GPT-OSS fused expert tensors split into per-expert linears so each
    expert quantizes independently (role of the reference's fused-MoE
    replacement, ``modeling/fused_moe/replace_modules.py``).  The fused
    ``gate_up_proj`` (E, H, 2I) interleaves gate/up columns (gate even,
    up odd — HF ``GptOssExperts.forward``)."""
    simple = {"self_attn.sinks": "sinks",
              "mlp.router.weight": "router",
              "mlp.router.bias": "router_bias",
              "self_attn.o_proj.bias": "o_bias"}
    if sub in simple:
        block[simple[sub]] = arr
        return True
    if not sub.startswith("mlp.experts."):
        return False
    exps = block.setdefault("experts",
                            [dict() for _ in range(n_experts)])
    name = sub[len("mlp.experts."):]
    if name == "gate_up_proj":                 # (E, H, 2I)
        for e in range(n_experts):
            exps[e]["gate_proj"] = arr[e, :, 0::2].T
            exps[e]["up_proj"] = arr[e, :, 1::2].T
    elif name == "gate_up_proj_bias":          # (E, 2I)
        for e in range(n_experts):
            exps[e]["gate_bias"] = arr[e, 0::2]
            exps[e]["up_bias"] = arr[e, 1::2]
    elif name == "down_proj":                  # (E, I, H)
        for e in range(n_experts):
            exps[e]["down_proj"] = arr[e].T
    elif name == "down_proj_bias":             # (E, H)
        for e in range(n_experts):
            exps[e]["down_bias"] = arr[e]
    else:
        return False
    return True


_DS_ATTN_MAP = {
    "self_attn.q_proj.weight": "q_proj",
    "self_attn.q_a_proj.weight": "q_a_proj",
    "self_attn.q_a_layernorm.weight": "q_a_layernorm",
    "self_attn.q_b_proj.weight": "q_b_proj",
    "self_attn.kv_a_proj_with_mqa.weight": "kv_a_proj_with_mqa",
    "self_attn.kv_a_layernorm.weight": "kv_a_layernorm",
    "self_attn.kv_b_proj.weight": "kv_b_proj",
    "self_attn.o_proj.weight": "o_proj",
    "input_layernorm.weight": "input_layernorm",
    "post_attention_layernorm.weight": "post_attention_layernorm",
    "mlp.gate_proj.weight": "gate_proj",
    "mlp.up_proj.weight": "up_proj",
    "mlp.down_proj.weight": "down_proj",
    "mlp.gate.weight": "gate",
    "mlp.gate.e_score_correction_bias": "e_score_correction_bias",
}


def _map_deepseek_key(sub: str, block: Dict[str, Any], arr) -> bool:
    if sub in _DS_ATTN_MAP:
        block[_DS_ATTN_MAP[sub]] = arr
        return True
    # GLM-5 DSA lightning indexer (models/glmdsa.py)
    if sub.startswith("self_attn.indexer."):
        wname = sub[len("self_attn.indexer."):].rsplit(".weight", 1)[0]
        if wname in ("q_proj", "k_proj", "weights_proj"):
            block.setdefault("indexer", {})[wname] = arr
            return True
    for moe_prefix, dest in (("mlp.experts.", "experts"),
                             ("mlp.shared_experts.", "shared_experts")):
        if not sub.startswith(moe_prefix):
            continue
        rest = sub[len(moe_prefix):]
        if dest == "experts":
            e_s, rest = rest.split(".", 1)
            exp = block.setdefault("experts", {})
            tgt = exp.setdefault(int(e_s), {})
        else:
            tgt = block.setdefault("shared_experts", {})
        wname = rest.rsplit(".weight", 1)[0]
        if wname in ("gate_proj", "up_proj", "down_proj"):
            tgt[wname] = arr
            return True
    return False


def _iter_shards(path: str):
    """Yield (key, numpy tensor) over all safetensors shards.

    FP8-source checkpoints (DeepSeek-V3/R1 layout: float8 weights with
    per-128x128-block ``weight_scale_inv`` grids, reference
    ``modeling/fp8_quant.py:27`` / ``finegrained_fp8_patch.py``) are
    dequantized to f32 on the fly so they enter the FULL tuning
    pipeline, not just model-free streaming: the scale tensors are
    consumed (never yielded) and each fp8 weight is yielded already
    multiplied out.  Scales are prefetched in a first cheap pass since
    a weight and its scale may live in different shards."""
    from safetensors import safe_open

    from ..quantize.model_free import _dequant_fp8_source, _load_fp8_as_f32

    index_path = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shard_files = sorted(set(index["weight_map"].values()))
    else:
        shard_files = ["model.safetensors"]

    scales: Dict[str, Any] = {}
    for shard in shard_files:
        with safe_open(os.path.join(path, shard), framework="numpy") as f:
            for key in f.keys():
                if key.endswith((".weight_scale_inv", ".weight_scale")):
                    scales[key] = f.get_tensor(key)

    for shard in shard_files:
        sp = os.path.join(path, shard)
        with safe_open(sp, framework="numpy") as f:
            for key in f.keys():
                if key in scales:
                    continue
                try:
                    t = f.get_tensor(key)
                except Exception:
                    # float8 payload: numpy safetensors cannot decode it
                    t = _load_fp8_as_f32(sp, key)
                    base = key[:-len(".weight")] if key.endswith(
                        ".weight") else key
                    s = scales.get(base + ".weight_scale_inv",
                                   scales.get(base + ".weight_scale"))
                    if t.ndim == 2:
                        t = _dequant_fp8_source(t, s)
                    elif s is not None and s.ndim <= 1 and s.size == 1:
                        t = t * float(s.reshape(()))
                yield key, t


def load_hf_checkpoint(path: str, dtype=jnp.bfloat16
                       ) -> Tuple[Dict[str, Any], LlamaConfig]:
    """Load an HF llama/qwen2/mistral checkpoint directory."""
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, dtype)

    from ..models.deepseek import DeepseekConfig
    from ..models.gptoss import GptOssConfig
    from ..models.llama4 import Llama4Config
    from ..models.minimax import MiniMaxConfig
    from ..models.qwen3next import Qwen3NextConfig
    is_deepseek = isinstance(cfg, DeepseekConfig)
    is_gptoss = isinstance(cfg, GptOssConfig)
    is_llama4 = isinstance(cfg, Llama4Config)
    is_q3next = isinstance(cfg, Qwen3NextConfig)
    is_minimax = isinstance(cfg, MiniMaxConfig)
    n_experts = getattr(cfg, "num_experts", 0)
    blocks = [
        ({"experts": [dict() for _ in range(n_experts)]} if n_experts
         else dict())
        for _ in range(cfg.num_layers)]
    params: Dict[str, Any] = {"blocks": blocks}
    n = 0
    for key, tensor in _iter_shards(path):
        arr = jnp.asarray(tensor).astype(dtype)
        if key in _TOP_MAP:
            params[_TOP_MAP[key]] = arr
            n += 1
            continue
        if key.startswith("model.layers."):
            rest = key[len("model.layers."):]
            li, sub = rest.split(".", 1)
            if is_deepseek:
                if sub == "mlp.gate.e_score_correction_bias":
                    arr = jnp.asarray(tensor).astype(jnp.float32)
                if _map_deepseek_key(sub, blocks[int(li)], arr):
                    n += 1
                    continue
            if is_gptoss:
                if sub in ("self_attn.sinks", "mlp.router.bias"):
                    arr = jnp.asarray(tensor).astype(jnp.float32)
                if _map_gptoss_key(sub, blocks[int(li)], arr, n_experts):
                    n += 1
                    continue
            if is_llama4 and _map_llama4_key(sub, blocks[int(li)], arr,
                                             n_experts):
                n += 1
                continue
            if is_q3next and sub.startswith("linear_attn."):
                if sub in ("linear_attn.dt_bias", "linear_attn.A_log"):
                    arr = jnp.asarray(tensor).astype(jnp.float32)
                name = {
                    "linear_attn.in_proj_qkvz.weight": "in_proj_qkvz",
                    "linear_attn.in_proj_ba.weight": "in_proj_ba",
                    "linear_attn.out_proj.weight": "out_proj",
                    "linear_attn.norm.weight": "linear_norm",
                    "linear_attn.dt_bias": "dt_bias",
                    "linear_attn.A_log": "A_log",
                }.get(sub)
                if sub == "linear_attn.conv1d.weight":
                    # (conv_dim, 1, K) depthwise → (conv_dim, K)
                    blocks[int(li)]["conv1d"] = arr[:, 0, :]
                    n += 1
                    continue
                if name:
                    blocks[int(li)][name] = arr
                    n += 1
                    continue
            if sub in _BLOCK_MAP:
                blocks[int(li)][_BLOCK_MAP[sub]] = arr
                n += 1
                continue
            # Mixtral MoE keys (reference expert mapping,
            # modeling/fused_moe/replace_modules.py:173):
            #   block_sparse_moe.gate.weight          -> router
            #   block_sparse_moe.experts.E.w{1,2,3}.weight
            if sub == "block_sparse_moe.gate.weight":
                blocks[int(li)]["router"] = arr
                n += 1
                continue
            if sub.startswith("block_sparse_moe.experts."):
                parts = sub.split(".")
                e, wname = int(parts[2]), parts[3]
                if wname in ("w1", "w2", "w3"):
                    blocks[int(li)]["experts"][e][wname] = arr
                    n += 1
                    continue
            # MiniMax lightning attention: qkv stays FUSED (3*nh*hd,
            # split per head inside the block); decay buffers are
            # recomputed from the formula, not loaded
            if is_minimax:
                mm = {"self_attn.qkv_proj.weight": "qkv_proj",
                      "self_attn.out_proj.weight": "out_proj",
                      "self_attn.output_gate.weight": "output_gate",
                      "self_attn.norm.weight": "attn_norm"}.get(sub)
                if mm:
                    blocks[int(li)][mm] = arr
                    n += 1
                    continue
                if sub.startswith("self_attn.") and sub.endswith(
                        ("slope_rate", "query_decay", "key_decay",
                         "diagonal_decay")):
                    n += 1
                    continue
            # Phi-3 fused projections: split on load so every projection
            # quantizes/tunes independently (role of the reference's
            # fused-layer handling, utils/model.py)
            if sub == "self_attn.qkv_proj.weight":
                qd = cfg.num_heads * cfg.hd
                kvd = cfg.num_kv_heads * cfg.hd
                blocks[int(li)]["q_proj"] = arr[:qd]
                blocks[int(li)]["k_proj"] = arr[qd: qd + kvd]
                blocks[int(li)]["v_proj"] = arr[qd + kvd:]
                n += 1
                continue
            if sub == "mlp.gate_up_proj.weight":
                half = arr.shape[0] // 2
                blocks[int(li)]["gate_proj"] = arr[:half]
                blocks[int(li)]["up_proj"] = arr[half:]
                n += 1
                continue
            # Qwen2-MoE keys: mlp.gate -> router, per-expert
            # gate/up/down -> w1/w3/w2, plus the shared expert
            qmap = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}
            if sub == "mlp.gate.weight":
                blocks[int(li)]["router"] = arr
                n += 1
                continue
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                # Qwen3.5-MoE fused stacks: gate_up_proj (E, 2I, H) /
                # down_proj (E, H, I) split per expert on load (role of
                # the reference's SequentialQwen3_5MoeExperts
                # _materialize_weights, modeling/fused_moe/qwen3_5_moe.py)
                if parts[2] in ("gate_up_proj", "down_proj") \
                        and arr.ndim == 3:
                    exps = blocks[int(li)]["experts"]
                    if parts[2] == "gate_up_proj":
                        I2 = arr.shape[1] // 2
                        for e in range(arr.shape[0]):
                            exps[e]["w1"] = arr[e, :I2]
                            exps[e]["w3"] = arr[e, I2:]
                    else:
                        for e in range(arr.shape[0]):
                            exps[e]["w2"] = arr[e]
                    n += 1
                    continue
                e, wname = int(parts[2]), qmap.get(parts[3])
                if wname:
                    blocks[int(li)]["experts"][e][wname] = arr
                    n += 1
                    continue
            if sub.startswith("mlp.shared_expert."):
                wname = qmap.get(sub.split(".")[2])
                if wname:
                    blocks[int(li)].setdefault("shared_expert", {})[wname] \
                        = arr
                    n += 1
                    continue
            if sub == "mlp.shared_expert_gate.weight":
                blocks[int(li)]["shared_expert_gate"] = arr
                n += 1
                continue
        logger.debug("skipping unmapped tensor %s", key)
    if cfg.tie_embeddings:
        params.pop("lm_head", None)
    if is_deepseek:
        # expert dicts keyed by index → ordered lists (pytree layout)
        for b in blocks:
            if isinstance(b.get("experts"), dict):
                exp = b["experts"]
                b["experts"] = [exp[e] for e in sorted(exp)]
        from ..models.glmdsa import GlmMoeDsaConfig
        if isinstance(cfg, GlmMoeDsaConfig):
            # shared-indexer layers carry a copy of the governing
            # indexer so per-block calibration stays self-contained
            # (models/glmdsa.py module docstring)
            governing = None
            for b in blocks:
                if "indexer" in b:
                    governing = b["indexer"]
                elif governing is not None:
                    b["indexer"] = dict(governing)
    if is_llama4 or is_q3next:
        # dense (non-MoE) layers got pre-seeded empty expert lists
        for b in blocks:
            if isinstance(b.get("experts"), list) and \
                    all(not d for d in b["experts"]):
                b.pop("experts", None)
    if is_minimax:
        from ..models.minimax import layer_is_linear, slope_rate
        for li, b in enumerate(blocks):
            if layer_is_linear(cfg, li):
                b["slope_rate"] = jnp.asarray(slope_rate(cfg, li))
    q_key = ("q_a_proj" if is_deepseek and cfg.q_lora_rank else "q_proj")
    missing = [i for i, b in enumerate(blocks)
               if q_key not in b and "in_proj_qkvz" not in b
               and "qkv_proj" not in b]
    if missing:
        raise ValueError(f"blocks missing attention weights: {missing}")
    logger.info("loaded %d tensors from %s", n, path)
    return params, cfg


def _save_deepseek_checkpoint(params, cfg, path: str,
                              hf_extra: Optional[Dict[str, Any]] = None
                              ) -> str:
    from safetensors.numpy import save_file

    inv = {v: k for k, v in _DS_ATTN_MAP.items()}
    # GLM-4.5 blocks carry llama-style extras (q/k/v bias, q/k norm)
    inv.update({v: k for k, v in _BLOCK_MAP.items() if v not in inv})
    tensors: Dict[str, np.ndarray] = {}
    for hf_key, ours in _TOP_MAP.items():
        if params.get(ours) is not None:
            tensors[hf_key] = np.asarray(params[ours])
    for li, block in enumerate(params["blocks"]):
        pre = f"model.layers.{li}."
        for ours, arr in block.items():
            if ours in inv:
                tensors[pre + inv[ours]] = np.asarray(arr)
            elif ours == "experts":
                for e, ew in enumerate(arr):
                    for wn, wv in ew.items():
                        tensors[f"{pre}mlp.experts.{e}.{wn}.weight"] = \
                            np.asarray(wv)
            elif ours == "shared_experts":
                for wn, wv in arr.items():
                    tensors[f"{pre}mlp.shared_experts.{wn}.weight"] = \
                        np.asarray(wv)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    from ..models.glm4moe import Glm4MoeConfig
    glm = isinstance(cfg, Glm4MoeConfig)
    v3 = cfg.scoring_func == "sigmoid"
    hf_cfg = {
        "model_type": ("glm4_moe" if glm
                       else "deepseek_v3" if v3 else "deepseek_v2"),
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "moe_intermediate_size": cfg.moe_intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": cfg.tie_embeddings,
        "q_lora_rank": cfg.q_lora_rank or None,
        "kv_lora_rank": cfg.kv_lora_rank,
        "qk_nope_head_dim": cfg.qk_nope_head_dim,
        "qk_rope_head_dim": cfg.qk_rope_head_dim,
        "v_head_dim": cfg.v_head_dim,
        "n_routed_experts": cfg.n_routed_experts or None,
        "num_experts_per_tok": cfg.num_experts_per_tok,
        "n_shared_experts": cfg.n_shared_experts or None,
        "first_k_dense_replace": cfg.first_k_dense,
        "routed_scaling_factor": cfg.routed_scaling_factor,
        "scoring_func": cfg.scoring_func,
        "n_group": cfg.n_group,
        "topk_group": cfg.topk_group,
        "norm_topk_prob": cfg.norm_topk_prob,
        "topk_method": "noaux_tc" if v3 else (
            "group_limited_greedy" if cfg.n_group > 1 else "greedy"),
        "torch_dtype": "bfloat16",
    }
    if glm:
        hf_cfg.update(
            head_dim=cfg.head_dim, attention_bias=cfg.attn_bias,
            use_qk_norm=cfg.qk_norm,
            partial_rotary_factor=cfg.partial_rotary_factor)
        for k in ("q_lora_rank", "kv_lora_rank", "qk_nope_head_dim",
                  "qk_rope_head_dim", "v_head_dim", "topk_method",
                  "scoring_func"):
            hf_cfg.pop(k, None)
    elif v3:
        hf_cfg["rope_interleave"] = cfg.rope_interleave
    if hf_extra:
        hf_cfg.update(hf_extra)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return path


def save_hf_checkpoint(params: Dict[str, Any], cfg: LlamaConfig, path: str,
                       hf_extra: Optional[Dict[str, Any]] = None) -> str:
    """Write params as an HF-layout single-shard safetensors checkpoint."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    from ..models.deepseek import DeepseekConfig
    if isinstance(cfg, DeepseekConfig):
        return _save_deepseek_checkpoint(params, cfg, path, hf_extra)
    inv_block = {v: k for k, v in _BLOCK_MAP.items()}
    qwen_moe = bool(getattr(cfg, "shared_expert_intermediate", 0))
    inv_q = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}
    tensors: Dict[str, np.ndarray] = {}
    for hf_key, ours in _TOP_MAP.items():
        if ours in params:
            tensors[hf_key] = np.asarray(params[ours])
    for li, block in enumerate(params["blocks"]):
        for ours, arr in block.items():
            if ours in inv_block:
                tensors[f"model.layers.{li}.{inv_block[ours]}"] = np.asarray(arr)
            elif ours == "router":
                key = ("mlp.gate.weight" if qwen_moe
                       else "block_sparse_moe.gate.weight")
                tensors[f"model.layers.{li}.{key}"] = np.asarray(arr)
            elif ours == "experts":
                for e, ew in enumerate(arr):
                    for wn, wv in ew.items():
                        key = (f"mlp.experts.{e}.{inv_q[wn]}.weight"
                               if qwen_moe else
                               f"block_sparse_moe.experts.{e}.{wn}.weight")
                        tensors[f"model.layers.{li}.{key}"] = np.asarray(wv)
            elif ours == "shared_expert":
                for wn, wv in arr.items():
                    tensors[f"model.layers.{li}.mlp.shared_expert."
                            f"{inv_q[wn]}.weight"] = np.asarray(wv)
            elif ours == "shared_expert_gate":
                tensors[f"model.layers.{li}.mlp.shared_expert_gate"
                        ".weight"] = np.asarray(arr)
    save_file(tensors, os.path.join(path, "model.safetensors"))

    n_experts = getattr(cfg, "num_experts", 0)
    hf_cfg = {
        "model_type": ("qwen2_moe" if qwen_moe else "mixtral" if n_experts
                       else "qwen2" if cfg.attn_bias else "llama"),
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": cfg.tie_embeddings,
        "attention_bias": cfg.attn_bias,
        "torch_dtype": "bfloat16",
    }
    if qwen_moe:
        hf_cfg["num_experts"] = n_experts
        hf_cfg["num_experts_per_tok"] = getattr(cfg, "top_k", 2)
        hf_cfg["moe_intermediate_size"] = cfg.intermediate_size
        hf_cfg["shared_expert_intermediate_size"] = \
            cfg.shared_expert_intermediate
        hf_cfg["norm_topk_prob"] = cfg.norm_topk_prob
    elif n_experts:
        hf_cfg["num_local_experts"] = n_experts
        hf_cfg["num_experts_per_tok"] = getattr(cfg, "top_k", 2)
    if hf_extra:
        hf_cfg.update(hf_extra)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return path
