"""Diffusion transformer (DiT) model family for diffusion-model quantization.

Role of the reference's diffusion support (``DiffusionMixin``
``diffusion_mixin.py:32``: denoise-step input capture, per-step
calibration): modern text2img stacks (SD3/Flux) are DiT transformers, so
the TPU build quantizes a DiT — patchified latents + timestep/class
conditioning through adaLN-zero blocks — rather than porting UNet hooks.

Chaining trick: the orchestrator's block-chain interface carries one
``(nsamples, T, H)`` cache between blocks.  A DiT block also needs the
conditioning vector ``c``, so the cache is augmented with one extra
position: ``x_aug = concat([tokens, c[:, None]], axis=1)``.  Each block
slices ``c`` off, runs adaLN attention/MLP on the tokens, and re-appends
``c`` — the standard orchestrator then chains denoise-step inputs through
blocks unchanged.  (cos/sin rope args are unused; DiT uses learned
positional embeddings.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig

__all__ = ["DiTConfig", "init_params", "embed_fwd", "block_fwd",
           "final_fwd", "model_fwd", "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class DiTConfig(LlamaConfig):
    # reuses hidden_size/num_layers/num_heads fields; LM fields unused
    image_size: int = 32
    patch_size: int = 4
    in_channels: int = 4      # latent channels
    num_classes: int = 10

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size ** 2


CONFIG_PRESETS: Dict[str, DiTConfig] = {
    "tiny-dit": DiTConfig(vocab_size=1, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=4, dtype=jnp.float32,
                          image_size=16, patch_size=4, in_channels=4,
                          num_classes=10),
}

LINEAR_KEYS = ("qkv", "proj", "fc1", "fc2")


def block_linear_names(cfg: DiTConfig) -> Tuple[str, ...]:
    return LINEAR_KEYS


def _timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def init_params(cfg: DiTConfig, key: jax.Array) -> Dict[str, Any]:
    H = cfg.hidden_size
    keys = jax.random.split(key, cfg.num_layers + 6)
    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 6)
        blocks.append({
            "qkv": jax.random.normal(bk[0], (3 * H, H), cfg.dtype) * 0.02,
            "proj": jax.random.normal(bk[1], (H, H), cfg.dtype) * 0.02,
            "fc1": jax.random.normal(bk[2], (cfg.intermediate_size, H),
                                     cfg.dtype) * 0.02,
            "fc2": jax.random.normal(bk[3], (H, cfg.intermediate_size),
                                     cfg.dtype) * 0.02,
            # adaLN-zero: 6 modulation vectors from c (kept FP — tiny and
            # numerically sensitive, like norms)
            "ada": jax.random.normal(bk[4], (6 * H, H), cfg.dtype) * 0.02,
            "ada_bias": jnp.zeros((6 * H,), cfg.dtype),
        })
    params = {
        "patch_embed": jax.random.normal(keys[-5], (H, cfg.patch_dim),
                                         cfg.dtype) * 0.02,
        "pos_embed": jax.random.normal(keys[-4], (cfg.num_tokens, H),
                                       cfg.dtype) * 0.02,
        "t_mlp1": jax.random.normal(keys[-3], (H, H), cfg.dtype) * 0.02,
        "t_mlp2": jax.random.normal(keys[-2], (H, H), cfg.dtype) * 0.02,
        "class_embed": jax.random.normal(keys[-1], (cfg.num_classes, H),
                                         cfg.dtype) * 0.02,
        "final_linear": jax.random.normal(
            jax.random.fold_in(key, 7), (cfg.patch_dim, H),
            cfg.dtype) * 0.02,
        "blocks": blocks,
    }
    return params


def _ln(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def embed_fwd(params: Dict[str, Any],
              inputs: Dict[str, jax.Array], cfg: DiTConfig) -> jax.Array:
    """inputs: {"pixel_values" (B,H,W,C) latents, "timesteps" (B,),
    optional "labels" (B,)} → augmented cache (B, T+1, H)."""
    px = inputs["pixel_values"]
    B = px.shape[0]
    P, n = cfg.patch_size, cfg.image_size // cfg.patch_size
    x = px.reshape(B, n, P, n, P, cfg.in_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n * n, cfg.patch_dim)
    x = jnp.einsum("bpi,hi->bph", x.astype(params["patch_embed"].dtype),
                   params["patch_embed"]) + params["pos_embed"][None]

    c = _timestep_embedding(inputs["timesteps"], cfg.hidden_size)
    c = c.astype(params["t_mlp1"].dtype)
    c = jnp.einsum("bh,oh->bo", jax.nn.silu(
        jnp.einsum("bh,oh->bo", c, params["t_mlp1"])), params["t_mlp2"])
    if "labels" in inputs:
        c = c + jnp.take(params["class_embed"], inputs["labels"], axis=0)
    return jnp.concatenate([x, c[:, None, :]], axis=1)


def block_fwd(weights: Dict[str, Any], x_aug: jax.Array, cos, sin,
              cfg: DiTConfig, mask=None, linear_fn=None) -> jax.Array:
    """adaLN-zero DiT block on the augmented cache (cos/sin unused)."""
    lf = linear_fn or (lambda name, x, w, b=None:
                       jnp.einsum("...i,oi->...o", x, w)
                       + (b if b is not None else 0))
    x, c = x_aug[:, :-1], x_aug[:, -1]
    B, T, H = x.shape
    mods = (jnp.einsum("bh,oh->bo", jax.nn.silu(c.astype(jnp.float32)),
                       weights["ada"].astype(jnp.float32))
            + weights["ada_bias"].astype(jnp.float32))
    sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods.astype(x.dtype), 6, axis=-1)

    h = _ln(x) * (1 + sc1[:, None]) + sh1[:, None]
    qkv = lf("qkv", h, weights["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    nh = cfg.num_heads
    hd = H // nh
    q = q.reshape(B, T, nh, hd)
    k = k.reshape(B, T, nh, hd)
    v = v.reshape(B, T, nh, hd)
    s = jnp.einsum("bsnh,btnh->bnst", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    a = jnp.einsum("bnst,btnh->bsnh", p, v).reshape(B, T, H)
    x = x + g1[:, None] * lf("proj", a, weights["proj"])

    h = _ln(x) * (1 + sc2[:, None]) + sh2[:, None]
    h = jax.nn.gelu(lf("fc1", h, weights["fc1"]))
    x = x + g2[:, None] * lf("fc2", h, weights["fc2"])
    return jnp.concatenate([x, c[:, None]], axis=1)


def final_fwd(params: Dict[str, Any], x_aug: jax.Array,
              cfg: DiTConfig) -> jax.Array:
    """→ predicted noise patches (B, T, patch_dim)."""
    x = _ln(x_aug[:, :-1])
    return jnp.einsum("bph,oh->bpo", x, params["final_linear"])


def model_fwd(params: Dict[str, Any], inputs, cfg: DiTConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    for b in params["blocks"]:
        x = block_fwd(b, x, None, None, cfg)
    return final_fwd(params, x, cfg)
