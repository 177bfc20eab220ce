"""Llava-style vision-language model (ViT tower → projector → llama).

Role of the reference's MLLM support (``compressors/mllm/`` datasets/
templates/processor + ``MLLMMixin`` calibration overrides): VLM
quantization needs the calibration forward to run image features through
the language blocks.  Functionally that is just a different embedding
front-end — the block chain, tuning loop, and export are unchanged — so
the family plugs in via ``embed_fwd`` taking a multimodal batch dict.

The vision tower is a compact pre-norm ViT (LayerNorm, learned position
embeddings, GELU MLP) with a two-layer GELU projector, llava-1.5 style.
Text-side decoder blocks are the llama family; by default only text
blocks quantize (the reference's default for VLMs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig

__all__ = ["LlavaConfig", "init_params", "embed_fwd", "model_fwd",
           "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class LlavaConfig(LlamaConfig):
    image_size: int = 64
    patch_size: int = 16
    v_hidden: int = 64
    v_layers: int = 2
    v_heads: int = 4
    image_token_id: int = 0   # placeholder token replaced by image embeds
    # CLIP-faithful options (real llava-hf checkpoints): class token +
    # pre-LN, quick_gelu activation, and llava's vision_feature_layer
    # (-2 = features taken before the last encoder layer, class dropped)
    v_class_token: bool = False
    v_quick_gelu: bool = False
    v_feature_layer: int = -1   # -1 = final post-LN output (synthetic ViT)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CONFIG_PRESETS: Dict[str, LlavaConfig] = {
    "tiny-llava": LlavaConfig(vocab_size=256, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              rope_theta=10000.0, dtype=jnp.float32,
                              image_size=32, patch_size=8, v_hidden=32,
                              v_layers=2, v_heads=2, image_token_id=1),
}


def block_linear_names(cfg: LlavaConfig) -> Tuple[str, ...]:
    return llama.LINEAR_KEYS


def _layer_norm(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def init_params(cfg: LlavaConfig, key: jax.Array) -> Dict[str, Any]:
    params = llama.init_params(cfg, key)
    vk = jax.random.split(jax.random.fold_in(key, 99), cfg.v_layers + 4)
    D = cfg.v_hidden
    patch_dim = 3 * cfg.patch_size ** 2
    vt = {
        "patch_embed": jax.random.normal(vk[0], (D, patch_dim),
                                         cfg.dtype) * 0.02,
        "pos_embed": jax.random.normal(vk[1], (cfg.num_patches, D),
                                       cfg.dtype) * 0.02,
        "blocks": [],
        "ln_f_g": jnp.ones((D,), cfg.dtype),
        "ln_f_b": jnp.zeros((D,), cfg.dtype),
    }
    for li in range(cfg.v_layers):
        bk = jax.random.split(vk[2 + li], 6)
        vt["blocks"].append({
            "ln1_g": jnp.ones((D,), cfg.dtype),
            "ln1_b": jnp.zeros((D,), cfg.dtype),
            "qkv": jax.random.normal(bk[0], (3 * D, D), cfg.dtype) * 0.02,
            "proj": jax.random.normal(bk[1], (D, D), cfg.dtype) * 0.02,
            "ln2_g": jnp.ones((D,), cfg.dtype),
            "ln2_b": jnp.zeros((D,), cfg.dtype),
            "fc1": jax.random.normal(bk[2], (4 * D, D), cfg.dtype) * 0.02,
            "fc2": jax.random.normal(bk[3], (D, 4 * D), cfg.dtype) * 0.02,
        })
    params["vision_tower"] = vt
    params["mm_projector"] = {
        "fc1": jax.random.normal(vk[-2], (cfg.hidden_size, D),
                                 cfg.dtype) * 0.02,
        "fc2": jax.random.normal(vk[-1], (cfg.hidden_size, cfg.hidden_size),
                                 cfg.dtype) * 0.02,
    }
    return params


def _lin(x, w, b=None):
    y = jnp.einsum("bpd,od->bpo", x, w)
    return y if b is None else y + b


def _vit_fwd(vt: Dict[str, Any], pixels: jax.Array,
             cfg: LlavaConfig, keep_class: bool = False) -> jax.Array:
    """pixels (B, H, W, 3) → patch features (B, num_patches, v_hidden).

    CLIP-faithful when the checkpoint carries the extras (class token,
    qkv/proj/fc biases, pre-LN, quick_gelu, llava feature-layer
    selection); the synthetic tiny tower simply omits them."""
    B = pixels.shape[0]
    P = cfg.patch_size
    n = cfg.image_size // P
    x = pixels.reshape(B, n, P, n, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, n * n, P * P * 3).astype(vt["patch_embed"].dtype)
    x = jnp.einsum("bpi,di->bpd", x, vt["patch_embed"])
    if cfg.v_class_token:
        cls = jnp.broadcast_to(vt["class_embed"][None, None],
                               (B, 1, cfg.v_hidden)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + vt["pos_embed"][None]
    if "pre_ln_g" in vt:  # CLIP pre_layrnorm
        x = _layer_norm(x, vt["pre_ln_g"], vt["pre_ln_b"])
    act = ((lambda y: y * jax.nn.sigmoid(1.702 * y)) if cfg.v_quick_gelu
           else jax.nn.gelu)
    nh = cfg.v_heads
    hd = cfg.v_hidden // nh
    # llava takes features from an intermediate layer (vision_feature_layer
    # -2 = run all but the last block, skip the final LN)
    n_run = (len(vt["blocks"]) if cfg.v_feature_layer == -1
             else len(vt["blocks"]) + 1 + cfg.v_feature_layer)
    for blk in vt["blocks"][:n_run]:
        h = _layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = _lin(h, blk["qkv"], blk.get("qkv_b"))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, -1, nh, hd)
        k = k.reshape(B, -1, nh, hd)
        v = v.reshape(B, -1, nh, hd)
        s = jnp.einsum("bsnh,btnh->bnst", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("bnst,btnh->bsnh", p, v).reshape(B, -1, cfg.v_hidden)
        x = x + _lin(a, blk["proj"], blk.get("proj_b"))
        h = _layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        h = act(_lin(h, blk["fc1"], blk.get("fc1_b")))
        x = x + _lin(h, blk["fc2"], blk.get("fc2_b"))
    if cfg.v_feature_layer == -1:
        x = _layer_norm(x, vt["ln_f_g"], vt["ln_f_b"])
    if cfg.v_class_token and not keep_class:
        x = x[:, 1:]   # llava "patch" feature selection drops the class tok
    return x


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, jax.Array]],
              cfg: LlavaConfig) -> jax.Array:
    """Multimodal embedding: text tokens, with positions equal to
    ``image_token_id`` replaced by projected patch features in order.

    inputs: token array, or {"input_ids": (B,S), "pixel_values": (B,H,W,3)}.
    The number of image-token positions per row must equal num_patches.
    """
    if not isinstance(inputs, dict):
        return llama.embed_fwd(params, inputs, cfg)
    ids = inputs["input_ids"]
    x = llama.embed_fwd(params, ids, cfg)
    pixels = inputs.get("pixel_values")
    if pixels is None:
        return x
    feats = _vit_fwd(params["vision_tower"], pixels, cfg)
    mm = params["mm_projector"]
    feats = jnp.einsum("bpd,hd->bph", feats, mm["fc1"])
    if "fc1_b" in mm:
        feats = feats + mm["fc1_b"]
    feats = jax.nn.gelu(feats)
    feats = jnp.einsum("bph,oh->bpo", feats, mm["fc2"])  # (B, P, H)
    if "fc2_b" in mm:
        feats = feats + mm["fc2_b"]

    is_img = ids == cfg.image_token_id                    # (B, S)
    # k-th image token of each row takes patch k
    patch_idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                         cfg.num_patches - 1)
    gathered = jnp.take_along_axis(feats, patch_idx[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered.astype(x.dtype), x)


def model_fwd(params: Dict[str, Any], inputs, cfg: LlavaConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    ids = inputs["input_ids"] if isinstance(inputs, dict) else inputs
    cos, sin = llama.rope_tables(cfg, ids.shape[1])
    for b in params["blocks"]:
        x = llama.block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
