"""MMDiT (SD3/Flux-class) diffusion transformer: JOINT text-image
attention blocks with per-stream adaLN-zero modulation.

One step realer than the class-conditioned DiT (round-2 VERDICT item):
this is the architecture of modern text-to-image stacks — two token
streams (latent image patches and text-encoder states), each with its
own qkv/mlp weights and adaLN gates, attending JOINTLY over the
concatenated sequence every block (reference counterpart: the diffusion
pipelines ``DiffusionMixin`` calibrates, ``diffusion_mixin.py:32``;
SD3's ``JointTransformerBlock``).

Chaining trick (same augmentation idea as ``models/dit.py``): the
orchestrator carries ONE (nsamples, T, H) cache between blocks, so both
streams and the conditioning vector ride one augmented sequence::

    x_aug = concat([img_tokens (T_img), txt_tokens (T_txt), c (1)], 1)

Each block splits them by the STATIC config sizes, runs joint
attention, and re-concatenates.  The quantizable linears are the
per-stream qkv/out/mlp projections — 8 per block (adaLN modulations
stay FP like norms).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dit import _ln, _timestep_embedding
from .llama import LlamaConfig

__all__ = ["MMDiTConfig", "init_params", "embed_fwd", "block_fwd",
           "final_fwd", "model_fwd", "block_linear_names",
           "CONFIG_PRESETS"]


@dataclass(frozen=True)
class MMDiTConfig(LlamaConfig):
    image_size: int = 32
    patch_size: int = 4
    in_channels: int = 4          # latent channels
    text_len: int = 16            # text-encoder sequence length
    text_dim: int = 64            # text-encoder hidden size
    pooled_dim: int = 64          # pooled text-conditioning size
    qk_norm: bool = True          # SD3.5-style per-head RMSNorm on q/k
    t_embed_dim: int = 0          # sinusoidal timestep dim (0 → hidden);
    #                               diffusers SD3 uses 256

    @property
    def num_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size ** 2


CONFIG_PRESETS: Dict[str, MMDiTConfig] = {
    "tiny-mmdit": MMDiTConfig(
        vocab_size=1, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, dtype=jnp.float32,
        image_size=16, patch_size=4, in_channels=4,
        text_len=8, text_dim=32, pooled_dim=32),
}

LINEAR_KEYS = ("qkv", "proj", "fc1", "fc2",
               "txt_qkv", "txt_proj", "txt_fc1", "txt_fc2")


def block_linear_names(cfg: MMDiTConfig) -> Tuple[str, ...]:
    return LINEAR_KEYS


def init_params(cfg: MMDiTConfig, key: jax.Array) -> Dict[str, Any]:
    H, I = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(key, cfg.num_layers + 8)
    n = lambda k, s: jax.random.normal(k, s, cfg.dtype) * 0.02
    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 10)
        b = {
            "qkv": n(bk[0], (3 * H, H)), "proj": n(bk[1], (H, H)),
            "fc1": n(bk[2], (I, H)), "fc2": n(bk[3], (H, I)),
            "txt_qkv": n(bk[4], (3 * H, H)), "txt_proj": n(bk[5], (H, H)),
            "txt_fc1": n(bk[6], (I, H)), "txt_fc2": n(bk[7], (H, I)),
            # per-stream adaLN-zero: 6 modulation vectors each
            "ada": n(bk[8], (6 * H, H)),
            "ada_bias": jnp.zeros((6 * H,), cfg.dtype),
            "txt_ada": n(bk[9], (6 * H, H)),
            "txt_ada_bias": jnp.zeros((6 * H,), cfg.dtype),
        }
        if cfg.qk_norm:
            hd = H // cfg.num_heads
            b["q_norm"] = jnp.ones((hd,), cfg.dtype)
            b["k_norm"] = jnp.ones((hd,), cfg.dtype)
            b["txt_q_norm"] = jnp.ones((hd,), cfg.dtype)
            b["txt_k_norm"] = jnp.ones((hd,), cfg.dtype)
        blocks.append(b)
    params = {
        "patch_embed": n(keys[-7], (H, cfg.patch_dim)),
        "pos_embed": n(keys[-6], (cfg.num_tokens, H)),
        "txt_embed": n(keys[-5], (H, cfg.text_dim)),
        "t_mlp1": n(keys[-4], (H, H)),
        "t_mlp2": n(keys[-3], (H, H)),
        "pool_mlp": n(keys[-2], (H, cfg.pooled_dim)),
        "final_ada": n(keys[-1], (2 * H, H)),
        "final_ada_bias": jnp.zeros((2 * H,), cfg.dtype),
        "final_linear": n(jax.random.fold_in(key, 7), (cfg.patch_dim, H)),
        "blocks": blocks,
    }
    return params


def embed_fwd(params: Dict[str, Any], inputs: Dict[str, jax.Array],
              cfg: MMDiTConfig) -> jax.Array:
    """inputs: {"pixel_values" (B,H,W,C) latents, "timesteps" (B,),
    "encoder_states" (B, text_len, text_dim), optional "pooled"
    (B, pooled_dim)} → augmented cache (B, T_img + T_txt + 1, H)."""
    px = inputs["pixel_values"]
    B = px.shape[0]
    P, g = cfg.patch_size, cfg.image_size // cfg.patch_size
    x = px.reshape(B, g, P, g, P, cfg.in_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, cfg.patch_dim)
    x = jnp.einsum("bpi,hi->bph", x.astype(params["patch_embed"].dtype),
                   params["patch_embed"]) + params["pos_embed"][None]
    if "patch_embed_bias" in params:
        x = x + params["patch_embed_bias"][None, None]
    txt = jnp.einsum("btd,hd->bth",
                     inputs["encoder_states"].astype(x.dtype),
                     params["txt_embed"])
    if "txt_embed_bias" in params:
        txt = txt + params["txt_embed_bias"][None, None]
    c = _timestep_embedding(inputs["timesteps"],
                            cfg.t_embed_dim or cfg.hidden_size)
    c = c.astype(params["t_mlp1"].dtype)
    h1 = jnp.einsum("bh,oh->bo", c, params["t_mlp1"])
    if "t_mlp1_bias" in params:
        h1 = h1 + params["t_mlp1_bias"][None]
    c = jnp.einsum("bh,oh->bo", jax.nn.silu(h1), params["t_mlp2"])
    if "t_mlp2_bias" in params:
        c = c + params["t_mlp2_bias"][None]
    if "pooled" in inputs:
        p1 = jnp.einsum("bd,hd->bh", inputs["pooled"].astype(c.dtype),
                        params["pool_mlp"])
        if "pool_mlp_bias" in params:
            p1 = p1 + params["pool_mlp_bias"][None]
        if "pool_mlp2" in params:
            # diffusers 2-layer pooled-text MLP (silu between)
            p1 = jnp.einsum("bh,oh->bo", jax.nn.silu(p1),
                            params["pool_mlp2"])
            if "pool_mlp2_bias" in params:
                p1 = p1 + params["pool_mlp2_bias"][None]
        c = c + p1
    return jnp.concatenate([x, txt, c[:, None, :]], axis=1)


def _rms(x, g):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, -1, keepdims=True) + 1e-6) * g).astype(x.dtype)


def _mods(c, w, b):
    m = (jnp.einsum("bh,oh->bo", jax.nn.silu(c.astype(jnp.float32)),
                    w.astype(jnp.float32)) + b.astype(jnp.float32))
    return jnp.split(m.astype(c.dtype), 6, axis=-1)


def block_fwd(weights: Dict[str, Any], x_aug: jax.Array, cos, sin,
              cfg: MMDiTConfig, mask=None, linear_fn=None) -> jax.Array:
    """Joint-attention MMDiT block on the augmented cache."""
    lf = linear_fn or (lambda name, x, w, b=None:
                       jnp.einsum("...i,oi->...o", x, w)
                       + (b if b is not None else 0))
    Ti = cfg.num_tokens
    x, txt, c = (x_aug[:, :Ti], x_aug[:, Ti:-1], x_aug[:, -1])
    B, _, H = x.shape
    nh = cfg.num_heads
    hd = H // nh
    sh1, sc1, g1, sh2, sc2, g2 = _mods(c, weights["ada"],
                                       weights["ada_bias"])
    tsh1, tsc1, tg1, tsh2, tsc2, tg2 = _mods(c, weights["txt_ada"],
                                             weights["txt_ada_bias"])

    def qkv_heads(h, wname, qn, kn):
        q, k, v = jnp.split(
            lf(wname, h, weights[wname], weights.get(wname + "_b")),
            3, axis=-1)
        q = q.reshape(B, -1, nh, hd)
        k = k.reshape(B, -1, nh, hd)
        v = v.reshape(B, -1, nh, hd)
        if cfg.qk_norm:
            q = _rms(q, weights[qn])
            k = _rms(k, weights[kn])
        return q, k, v

    hx = _ln(x) * (1 + sc1[:, None]) + sh1[:, None]
    ht = _ln(txt) * (1 + tsc1[:, None]) + tsh1[:, None]
    qi, ki, vi = qkv_heads(hx, "qkv", "q_norm", "k_norm")
    qt, kt, vt = qkv_heads(ht, "txt_qkv", "txt_q_norm", "txt_k_norm")
    # JOINT attention over [image ; text]
    q = jnp.concatenate([qi, qt], axis=1)
    k = jnp.concatenate([ki, kt], axis=1)
    v = jnp.concatenate([vi, vt], axis=1)
    s = jnp.einsum("bsnh,btnh->bnst", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    a = jnp.einsum("bnst,btnh->bsnh", p, v).reshape(B, -1, H)
    ai, at = a[:, :Ti], a[:, Ti:]
    x = x + g1[:, None] * lf("proj", ai, weights["proj"],
                             weights.get("proj_b"))
    txt = txt + tg1[:, None] * lf("txt_proj", at, weights["txt_proj"],
                                  weights.get("txt_proj_b"))

    hx = _ln(x) * (1 + sc2[:, None]) + sh2[:, None]
    x = x + g2[:, None] * lf("fc2", jax.nn.gelu(
        lf("fc1", hx, weights["fc1"], weights.get("fc1_b"))),
        weights["fc2"], weights.get("fc2_b"))
    ht = _ln(txt) * (1 + tsc2[:, None]) + tsh2[:, None]
    txt = txt + tg2[:, None] * lf("txt_fc2", jax.nn.gelu(
        lf("txt_fc1", ht, weights["txt_fc1"], weights.get("txt_fc1_b"))),
        weights["txt_fc2"], weights.get("txt_fc2_b"))
    return jnp.concatenate([x, txt, c[:, None]], axis=1)


def final_fwd(params: Dict[str, Any], x_aug: jax.Array,
              cfg: MMDiTConfig) -> jax.Array:
    """Final adaLN + linear on the IMAGE stream → noise patches."""
    Ti = cfg.num_tokens
    x, c = x_aug[:, :Ti], x_aug[:, -1]
    m = (jnp.einsum("bh,oh->bo", jax.nn.silu(c.astype(jnp.float32)),
                    params["final_ada"].astype(jnp.float32))
         + params["final_ada_bias"].astype(jnp.float32))
    sh, sc = jnp.split(m.astype(x.dtype), 2, axis=-1)
    x = _ln(x) * (1 + sc[:, None]) + sh[:, None]
    out = jnp.einsum("bph,oh->bpo", x, params["final_linear"])
    if "final_linear_bias" in params:
        out = out + params["final_linear_bias"][None, None]
    return out


def model_fwd(params: Dict[str, Any], inputs,
              cfg: MMDiTConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    for b in params["blocks"]:
        x = block_fwd(b, x, None, None, cfg)
    return final_fwd(params, x, cfg)


def unpatchify(noise: jax.Array, cfg: MMDiTConfig) -> jax.Array:
    """(B, T, patch_dim) → (B, H, W, C) latents."""
    B = noise.shape[0]
    P, g = cfg.patch_size, cfg.image_size // cfg.patch_size
    x = noise.reshape(B, g, g, P, P, cfg.in_channels)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, cfg.image_size, cfg.image_size, cfg.in_channels)


def euler_sample(params, cfg: MMDiTConfig, encoder_states, pooled,
                 key: jax.Array, steps: int = 8,
                 capture=None) -> jax.Array:
    """Rectified-flow Euler sampler (SD3-style: the model predicts
    velocity; x advances along sigma from 1 → 0).  ``capture(inputs)``
    is the denoise-loop calibration hook — the reference captures each
    step's transformer inputs during ``DiffusionMixin.calib``
    (``diffusion_mixin.py:195``); here each step's
    {latents, timestep, text} dict is handed to the callback."""
    B = encoder_states.shape[0]
    x = jax.random.normal(
        key, (B, cfg.image_size, cfg.image_size, cfg.in_channels),
        jnp.float32)
    sigmas = np.linspace(1.0, 0.0, steps + 1)
    for i in range(steps):
        t = jnp.full((B,), sigmas[i] * 1000.0, jnp.float32)
        inputs = {"pixel_values": x, "timesteps": t,
                  "encoder_states": encoder_states, "pooled": pooled}
        if capture is not None:
            capture(inputs)
        v = unpatchify(model_fwd(params, inputs, cfg), cfg)
        x = x + (sigmas[i + 1] - sigmas[i]) * v.astype(jnp.float32)
    return x
