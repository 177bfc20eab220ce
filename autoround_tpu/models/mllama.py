"""Mllama (Llama-3.2 Vision) family: CLIP-class vision tower feeding
CROSS-ATTENTION decoder layers — a genuinely different VLM wiring than
soft-token splicing (reference template registration
``compressors/mllm/template.py:125`` and the mllama entries of
``special_model_handler.py``; modeling mirrors HF
``MllamaForConditionalGeneration``):

* vision tower — ViT with a class token: patchify (reshape+matmul),
  learned position embeddings, pre-LN blocks with biased qkv/proj/fcs;
  features project into the text width (``multi_modal_projector``).
* text decoder — llama self-attention blocks EXCEPT the configured
  ``cross_attention_layers``, which replace self-attention with
  cross-attention over the projected vision states: q from text (with
  per-head RMSNorm), k/v from vision, no causal mask, and
  tanh-GATED residuals (``gate_attn``/``gate_ffn`` scalars, init 0 —
  a fresh model is exactly the text-only llama, which the parity test
  exploits).

Orchestrator integration uses the augmented-cache trick (same as
MMDiT/DiT): ``embed_fwd`` returns ``concat([text_embeds, vision_states],
axis=1)``; every block splits at the STATIC ``cfg.vision_tokens``
boundary, self blocks run llama.block_fwd on the text slice (vision
passes through untouched), cross blocks attend text → vision.  The
quantizable linears differ per block kind — ``block_linear_names``
returns the union and the per-block plan prunes (as for MoE models).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama

__all__ = ["MllamaConfig", "CONFIG_PRESETS", "init_params", "embed_fwd",
           "block_fwd_for", "model_fwd", "block_linear_names"]


@dataclass(frozen=True)
class MllamaConfig(llama.LlamaConfig):
    # decoder cross-attention layer indices (HF cross_attention_layers)
    cross_attention_layers: Tuple[int, ...] = ()
    # vision tower
    v_hidden: int = 64
    v_layers: int = 2
    v_heads: int = 4
    v_intermediate: int = 128
    image_size: int = 64
    patch_size: int = 16
    v_eps: float = 1e-5
    image_token_id: int = 250     # the single <|image|> text marker

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def vision_tokens(self) -> int:
        return self.num_patches + 1   # class token


CONFIG_PRESETS: Dict[str, MllamaConfig] = {
    "tiny-mllama": MllamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=4, num_heads=4, num_kv_heads=2, rope_theta=1e4,
        cross_attention_layers=(1, 3), v_hidden=48, v_layers=2,
        v_heads=4, v_intermediate=96, image_size=32, patch_size=16,
        dtype=jnp.float32),
}

_SELF_KEYS = llama.LINEAR_KEYS
_CROSS_KEYS = ("cross_q_proj", "cross_k_proj", "cross_v_proj",
               "cross_o_proj", "gate_proj", "up_proj", "down_proj")


def block_linear_names(cfg: MllamaConfig) -> Tuple[str, ...]:
    return tuple(dict.fromkeys(_SELF_KEYS + _CROSS_KEYS))


def _layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def init_params(cfg: MllamaConfig, key: jax.Array) -> Dict[str, Any]:
    params = llama.init_params(cfg, key)
    H, hd = cfg.hidden_size, cfg.hd
    kvd = cfg.num_kv_heads * hd
    # swap the cross layers' self-attn weights for cross-attn slots
    for li in cfg.cross_attention_layers:
        bk = jax.random.split(jax.random.fold_in(key, 1000 + li), 4)
        b = params["blocks"][li]
        for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
            b.pop(k, None)
        b["cross_q_proj"] = jax.random.normal(
            bk[0], (cfg.num_heads * hd, H), cfg.dtype) * 0.02
        b["cross_k_proj"] = jax.random.normal(bk[1], (kvd, H),
                                              cfg.dtype) * 0.02
        b["cross_v_proj"] = jax.random.normal(bk[2], (kvd, H),
                                              cfg.dtype) * 0.02
        b["cross_o_proj"] = jax.random.normal(
            bk[3], (H, cfg.num_heads * hd), cfg.dtype) * 0.02
        b["cross_q_norm"] = jnp.ones((hd,), cfg.dtype)
        b["cross_k_norm"] = jnp.ones((hd,), cfg.dtype)
        # tanh gates init 0: a fresh model IS the text-only llama
        b["gate_attn"] = jnp.zeros((), jnp.float32)
        b["gate_ffn"] = jnp.zeros((), jnp.float32)

    vk = jax.random.split(jax.random.fold_in(key, 77), cfg.v_layers + 5)
    D = cfg.v_hidden
    patch_dim = 3 * cfg.patch_size ** 2
    vt = {
        "patch_embed": jax.random.normal(vk[0], (D, patch_dim),
                                         cfg.dtype) * 0.02,
        "cls_token": jax.random.normal(vk[1], (D,), cfg.dtype) * 0.02,
        "pos_embed": jax.random.normal(
            vk[2], (cfg.num_patches + 1, D), cfg.dtype) * 0.02,
        "pre_ln_g": jnp.ones((D,), cfg.dtype),
        "pre_ln_b": jnp.zeros((D,), cfg.dtype),
        "blocks": [],
        "post_ln_g": jnp.ones((D,), cfg.dtype),
        "post_ln_b": jnp.zeros((D,), cfg.dtype),
    }
    for li in range(cfg.v_layers):
        bk = jax.random.split(vk[3 + li], 4)
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
    params["mm_projector"] = {
        "proj": jax.random.normal(vk[-1], (cfg.hidden_size, D),
                                  cfg.dtype) * 0.02,
        "proj_b": jnp.zeros((cfg.hidden_size,), cfg.dtype),
    }
    return params


def _lin(x, w, b=None):
    y = jnp.einsum("bpd,od->bpo", x, w)
    return y if b is None else y + b


def _vision_fwd(vt: Dict[str, Any], pixels: jax.Array,
                cfg: MllamaConfig) -> jax.Array:
    """(B, H, W, 3) → (B, num_patches+1, Dv) ViT features."""
    B = pixels.shape[0]
    P = cfg.patch_size
    g = cfg.image_size // P
    x = pixels.reshape(B, g, P, g, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, g * g, 3 * P * P).astype(vt["patch_embed"].dtype)
    x = jnp.einsum("bpi,di->bpd", x, vt["patch_embed"])
    cls = jnp.broadcast_to(vt["cls_token"][None, None],
                           (B, 1, cfg.v_hidden))
    x = jnp.concatenate([cls, x], axis=1) + vt["pos_embed"][None]
    x = _layer_norm(x, vt["pre_ln_g"], vt["pre_ln_b"], cfg.v_eps)
    nh = cfg.v_heads
    hd = cfg.v_hidden // nh
    for b in vt["blocks"]:
        h = _layer_norm(x, b["ln1_g"], b["ln1_b"], cfg.v_eps)
        qkv = _lin(h, b["qkv"], b["qkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        T = q.shape[1]
        q = q.reshape(B, T, nh, hd)
        k = k.reshape(B, T, nh, hd)
        v = v.reshape(B, T, nh, hd)
        s = jnp.einsum("bsnh,btnh->bnst", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("bnst,btnh->bsnh", p, v).reshape(B, T, -1)
        x = x + _lin(a, b["proj"], b["proj_b"])
        h = _layer_norm(x, b["ln2_g"], b["ln2_b"], cfg.v_eps)
        x = x + _lin(jax.nn.gelu(_lin(h, b["fc1"], b["fc1_b"])),
                     b["fc2"], b["fc2_b"])
    return _layer_norm(x, vt["post_ln_g"], vt["post_ln_b"], cfg.v_eps)


def embed_fwd(params: Dict[str, Any],
              inputs, cfg: MllamaConfig) -> jax.Array:
    """{"input_ids" (B, S), "pixel_values" (B, H, W, 3)} → augmented
    cache (B, S + vision_tokens, H): text embeddings then projected
    vision states (which feed the cross-attention layers as k/v)."""
    if isinstance(inputs, dict):
        ids = inputs["input_ids"]
        pixels = inputs.get("pixel_values")
    else:
        ids, pixels = inputs, None
    text = llama.embed_fwd(params, ids, cfg)
    B = text.shape[0]
    if pixels is None:
        vis = jnp.zeros((B, cfg.vision_tokens, cfg.hidden_size),
                        text.dtype)
    else:
        feats = _vision_fwd(params["vision_tower"], pixels, cfg)
        mp = params["mm_projector"]
        vis = (jnp.einsum("bpd,hd->bph",
                          feats.astype(mp["proj"].dtype), mp["proj"])
               + mp["proj_b"]).astype(text.dtype)
    return jnp.concatenate([text, vis], axis=1)


def _self_block_fwd(weights, x_aug, cos, sin, cfg: MllamaConfig,
                    mask=None, linear_fn=None):
    Tv = cfg.vision_tokens
    x, vis = x_aug[:, :-Tv], x_aug[:, -Tv:]
    S = x.shape[1]
    x = llama.block_fwd(weights, x, cos[:S], sin[:S], cfg, mask=mask,
                        linear_fn=linear_fn)
    return jnp.concatenate([x, vis], axis=1)


def _cross_block_fwd(weights, x_aug, cos, sin, cfg: MllamaConfig,
                     mask=None, linear_fn=None):
    lf = linear_fn or (lambda name, x, w, b=None:
                       jnp.einsum("...i,oi->...o", x, w)
                       + (b if b is not None else 0))
    Tv = cfg.vision_tokens
    x, vis = x_aug[:, :-Tv], x_aug[:, -Tv:]
    B, S, H = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.hd

    h = llama.rms_norm(x, weights["input_layernorm"], cfg.rms_eps,
                       cfg.norm_offset)
    q = lf("cross_q_proj", h, weights["cross_q_proj"]).reshape(
        B, S, nh, hd)
    k = lf("cross_k_proj", vis, weights["cross_k_proj"]).reshape(
        B, Tv, nkv, hd)
    v = lf("cross_v_proj", vis, weights["cross_v_proj"]).reshape(
        B, Tv, nkv, hd)
    q = llama.rms_norm(q, weights["cross_q_norm"], cfg.rms_eps, 0.0)
    k = llama.rms_norm(k, weights["cross_k_norm"], cfg.rms_eps, 0.0)
    if nkv != nh:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("bsnh,btnh->bnst", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    a = jnp.einsum("bnst,btnh->bsnh", p, v).reshape(B, S, nh * hd)
    attn = lf("cross_o_proj", a, weights["cross_o_proj"])
    x = x + jnp.tanh(weights["gate_attn"]).astype(x.dtype) * attn

    h = llama.rms_norm(x, weights["post_attention_layernorm"],
                       cfg.rms_eps, cfg.norm_offset)
    mlp = lf("down_proj", jax.nn.silu(
        lf("gate_proj", h, weights["gate_proj"]))
        * lf("up_proj", h, weights["up_proj"]), weights["down_proj"])
    x = x + jnp.tanh(weights["gate_ffn"]).astype(x.dtype) * mlp
    return jnp.concatenate([x, vis], axis=1)


def block_fwd_for(cfg: MllamaConfig, bi: int):
    """Stable per-kind callables (jit-cache friendly, like llama4's
    rope/NoPE split)."""
    return (_cross_block_fwd if bi in cfg.cross_attention_layers
            else _self_block_fwd)


def model_fwd(params: Dict[str, Any], inputs,
              cfg: MllamaConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    S = x.shape[1] - cfg.vision_tokens
    cos, sin = llama.rope_tables(cfg, S)
    for bi, b in enumerate(params["blocks"]):
        x = block_fwd_for(cfg, bi)(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x[:, :S], cfg)
