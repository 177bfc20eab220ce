"""DeepSeek-VL2 family: SigLIP vision tower + pixel-shuffle projector
splicing soft tokens into a DeepSeek (MLA) decoder.

Role of the reference's deepseek_vl_v2 support (template registration
``compressors/mllm/template.py:126``, multimodal block getter
``special_model_handler.py:405-520``); modeling mirrors HF/DeepSeek
``DeepseekVLV2ForCausalLM``:

* vision tower — SigLIP (no class token); reuses the Gemma3-VL encoder
  (identical wiring, own weights).
* projector — 2x2 PIXEL SHUFFLE: the (g, g, Dv) patch grid folds into
  (g/r, g/r, r²·Dv), compressing 4 patches into one soft token, then a
  2-layer GELU MLP into the text width (DeepSeek-VL2
  ``MlpProjector(projector_type="downsample_mlp_gelu")``).
* decoder — the DeepSeek MLA blocks unchanged: latent-compressed
  attention + (optionally) leading-dense MoE; soft tokens REPLACE text
  embeddings at ``image_token_id`` positions, llava-style.

The interesting wiring vs llava/gemma3: the decoder is the MLA family,
so VLM calibration chains through kv-compressed blocks (and the MoE
plan prunes per-block) — the quantize path is the deepseek one.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp

from . import deepseek, llama
from .gemma3vl import _siglip_fwd

__all__ = ["DeepseekVLConfig", "CONFIG_PRESETS", "init_params",
           "embed_fwd", "model_fwd", "block_linear_names"]


@dataclass(frozen=True)
class DeepseekVLConfig(deepseek.DeepseekConfig):
    # SigLIP tower (field names shared with Gemma3VL so the encoder fn
    # is reusable)
    v_hidden: int = 64
    v_layers: int = 2
    v_heads: int = 4
    v_intermediate: int = 128
    image_size: int = 64
    patch_size: int = 16
    v_eps: float = 1e-6
    downsample_ratio: int = 2
    image_token_id: int = 250

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_image_tokens(self) -> int:
        g = self.image_size // self.patch_size
        return (g // self.downsample_ratio) ** 2


CONFIG_PRESETS: Dict[str, DeepseekVLConfig] = {
    "tiny-deepseek-vl2": DeepseekVLConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=3, num_heads=4, num_kv_heads=4, rope_theta=1e4,
        q_lora_rank=0, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32,
        n_routed_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=64, n_shared_experts=1, first_k_dense=1,
        routed_scaling_factor=1.0, scoring_func="softmax",
        norm_topk_prob=False,
        v_hidden=48, v_layers=2, v_heads=4, v_intermediate=96,
        image_size=64, patch_size=16, downsample_ratio=2,
        dtype=jnp.float32),
}


def block_linear_names(cfg: DeepseekVLConfig) -> Tuple[str, ...]:
    return deepseek.block_linear_names(cfg)


def init_params(cfg: DeepseekVLConfig, key: jax.Array) -> Dict[str, Any]:
    params = deepseek.init_params(cfg, key)
    vk = jax.random.split(jax.random.fold_in(key, 77), cfg.v_layers + 5)
    D = cfg.v_hidden
    patch_dim = 3 * cfg.patch_size ** 2
    vt = {
        "patch_embed": jax.random.normal(vk[0], (D, patch_dim),
                                         cfg.dtype) * 0.02,
        "patch_embed_b": jnp.zeros((D,), cfg.dtype),
        "pos_embed": jax.random.normal(vk[1], (cfg.num_patches, D),
                                       cfg.dtype) * 0.02,
        "blocks": [],
        "post_ln_g": jnp.ones((D,), cfg.dtype),
        "post_ln_b": jnp.zeros((D,), cfg.dtype),
    }
    for li in range(cfg.v_layers):
        bk = jax.random.split(vk[2 + li], 4)
        vt["blocks"].append({
            "ln1_g": jnp.ones((D,), cfg.dtype),
            "ln1_b": jnp.zeros((D,), cfg.dtype),
            "qkv": jax.random.normal(bk[0], (3 * D, D), cfg.dtype) * 0.02,
            "qkv_b": jnp.zeros((3 * D,), cfg.dtype),
            "proj": jax.random.normal(bk[1], (D, D), cfg.dtype) * 0.02,
            "proj_b": jnp.zeros((D,), cfg.dtype),
            "ln2_g": jnp.ones((D,), cfg.dtype),
            "ln2_b": jnp.zeros((D,), cfg.dtype),
            "fc1": jax.random.normal(bk[2], (cfg.v_intermediate, D),
                                     cfg.dtype) * 0.02,
            "fc1_b": jnp.zeros((cfg.v_intermediate,), cfg.dtype),
            "fc2": jax.random.normal(bk[3], (D, cfg.v_intermediate),
                                     cfg.dtype) * 0.02,
            "fc2_b": jnp.zeros((D,), cfg.dtype),
        })
    params["vision_tower"] = vt
    r2d = cfg.downsample_ratio ** 2 * D
    params["mm_projector"] = {
        "fc1": jax.random.normal(vk[-2], (cfg.hidden_size, r2d),
                                 cfg.dtype) * 0.02,
        "fc1_b": jnp.zeros((cfg.hidden_size,), cfg.dtype),
        "fc2": jax.random.normal(vk[-1],
                                 (cfg.hidden_size, cfg.hidden_size),
                                 cfg.dtype) * 0.02,
        "fc2_b": jnp.zeros((cfg.hidden_size,), cfg.dtype),
    }
    return params


def _pixel_shuffle(feats: jax.Array, cfg: DeepseekVLConfig) -> jax.Array:
    """(B, g*g, Dv) → (B, (g/r)², r²·Dv): fold r x r patch
    neighborhoods into the channel dim (DeepSeek-VL2 downsample)."""
    B, P, D = feats.shape
    g = cfg.image_size // cfg.patch_size
    r = cfg.downsample_ratio
    x = feats.reshape(B, g // r, r, g // r, r, D)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (g // r) ** 2, r * r * D)


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, jax.Array]],
              cfg: DeepseekVLConfig) -> jax.Array:
    if not isinstance(inputs, dict):
        return llama.embed_fwd(params, inputs, cfg)
    ids = inputs["input_ids"]
    x = llama.embed_fwd(params, ids, cfg)
    pixels = inputs.get("pixel_values")
    if pixels is None:
        return x
    feats = _siglip_fwd(params["vision_tower"], pixels, cfg)
    feats = _pixel_shuffle(feats, cfg)
    mm = params["mm_projector"]
    feats = jax.nn.gelu(
        jnp.einsum("bpd,hd->bph", feats.astype(mm["fc1"].dtype),
                   mm["fc1"]) + mm["fc1_b"])
    feats = jnp.einsum("bph,oh->bpo", feats, mm["fc2"]) + mm["fc2_b"]
    is_img = ids == cfg.image_token_id
    tok_idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                       cfg.num_image_tokens - 1)
    gathered = jnp.take_along_axis(feats, tok_idx[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered.astype(x.dtype), x)


def model_fwd(params: Dict[str, Any], inputs,
              cfg: DeepseekVLConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    S = x.shape[1]
    cos, sin = deepseek.rope_tables(cfg, S)
    for bi, b in enumerate(params["blocks"]):
        x = deepseek.block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
