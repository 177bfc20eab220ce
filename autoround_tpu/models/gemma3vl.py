"""Gemma3 multimodal family: SigLIP vision tower + soft-token projector
on the Gemma3 decoder.

Role of the reference's gemma3 VLM support (template registration
``auto_round/compressors/mllm/template.py:129`` and the HF-processor
path); the modeling mirrors HF ``Gemma3ForConditionalGeneration``:

* vision tower = SigLIP: valid-padded patch conv (done as a
  reshape+matmul — MXU-friendly, stride == kernel), learned position
  embeddings over every patch (no class token), pre-LN encoder layers
  with biased qkv/proj/fc and gelu-tanh MLP, final post layernorm.
* ``Gemma3MultiModalProjector``: average-pool the patch grid down to
  ``mm_tokens_per_image`` soft tokens, Gemma-RMSNorm (the (1 + w) fold)
  in the VISION width, then a bias-free projection into the text width.
* text decoder = the Gemma3 flags already carried by ``LlamaConfig``
  (sandwich norms, qk-norm, dual local/global rope, sliding pattern,
  embed scaling) — the projected features REPLACE the scaled text
  embeddings at ``image_token_id`` positions, unscaled, exactly as HF
  masked-scatters them after the embedding normalizer.

The decoder blocks are llama blocks, so quantization/serving reuse the
whole llama path; only ``embed_fwd`` differs (the orchestrator caches
block-0 inputs from it and never looks at pixels again).
"""

from dataclasses import dataclass
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import llama

__all__ = ["Gemma3VLConfig", "CONFIG_PRESETS", "init_params", "embed_fwd",
           "model_fwd", "block_linear_names"]


@dataclass(frozen=True)
class Gemma3VLConfig(llama.LlamaConfig):
    # SigLIP tower
    v_hidden: int = 64
    v_layers: int = 2
    v_heads: int = 4
    v_intermediate: int = 128
    image_size: int = 64
    patch_size: int = 16
    v_eps: float = 1e-6
    # projector
    mm_tokens_per_image: int = 4
    image_token_id: int = 250

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def block_linear_names(cfg: Gemma3VLConfig) -> Tuple[str, ...]:
    return llama.LINEAR_KEYS


def _layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def init_params(cfg: Gemma3VLConfig, key: jax.Array) -> Dict[str, Any]:
    params = llama.init_params(cfg, key)
    vk = jax.random.split(jax.random.fold_in(key, 77), cfg.v_layers + 4)
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
    params["mm_projector"] = {
        # HF mm_input_projection_weight is (Dv, Dt), applied x @ W
        "proj": jax.random.normal(vk[-1], (D, cfg.hidden_size),
                                  cfg.dtype) * 0.02,
        "soft_emb_norm": jnp.zeros((D,), cfg.dtype),  # Gemma (1+w) fold
    }
    return params


def _lin(x, w, b=None):
    y = jnp.einsum("bpd,od->bpo", x, w)
    return y if b is None else y + b


def _siglip_fwd(vt: Dict[str, Any], pixels: jax.Array,
                cfg: Gemma3VLConfig) -> jax.Array:
    """pixels (B, H, W, 3) → patch features (B, num_patches, v_hidden)."""
    B = pixels.shape[0]
    P = cfg.patch_size
    n = cfg.image_size // P
    x = pixels.reshape(B, n, P, n, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, n * n, P * P * 3).astype(vt["patch_embed"].dtype)
    x = jnp.einsum("bpi,di->bpd", x, vt["patch_embed"]) + vt["patch_embed_b"]
    x = x + vt["pos_embed"][None]
    nh = cfg.v_heads
    hd = cfg.v_hidden // nh
    for blk in vt["blocks"]:
        h = _layer_norm(x, blk["ln1_g"], blk["ln1_b"], cfg.v_eps)
        qkv = _lin(h, blk["qkv"], blk["qkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, -1, nh, hd)
        k = k.reshape(B, -1, nh, hd)
        v = v.reshape(B, -1, nh, hd)
        s = jnp.einsum("bsnh,btnh->bnst", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("bnst,btnh->bsnh", p, v).reshape(B, -1, cfg.v_hidden)
        x = x + _lin(a, blk["proj"], blk["proj_b"])
        h = _layer_norm(x, blk["ln2_g"], blk["ln2_b"], cfg.v_eps)
        h = jax.nn.gelu(_lin(h, blk["fc1"], blk["fc1_b"]), approximate=True)
        x = x + _lin(h, blk["fc2"], blk["fc2_b"])
    return _layer_norm(x, vt["post_ln_g"], vt["post_ln_b"], cfg.v_eps)


def _project_features(params: Dict[str, Any], feats: jax.Array,
                      cfg: Gemma3VLConfig) -> jax.Array:
    """(B, num_patches, Dv) → (B, mm_tokens_per_image, Dt): avg-pool the
    patch grid, Gemma-RMSNorm in vision width, project (HF
    Gemma3MultiModalProjector)."""
    mm = params["mm_projector"]
    B, P, D = feats.shape
    n = cfg.image_size // cfg.patch_size
    ts = int(cfg.mm_tokens_per_image ** 0.5)
    k = n // ts
    x = feats.reshape(B, ts, k, ts, k, D).mean(axis=(2, 4))
    x = x.reshape(B, ts * ts, D)
    x = llama.rms_norm(x, mm["soft_emb_norm"], cfg.v_eps, offset=1.0)
    return jnp.einsum("bpd,dh->bph", x, mm["proj"])


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, jax.Array]],
              cfg: Gemma3VLConfig) -> jax.Array:
    """Scaled text embeddings with ``image_token_id`` positions replaced
    by the (unscaled) projected soft tokens, in order — HF scatters after
    the embedding normalizer, so the features bypass the sqrt(H) scale."""
    if not isinstance(inputs, dict):
        return llama.embed_fwd(params, inputs, cfg)
    ids = inputs["input_ids"]
    x = llama.embed_fwd(params, ids, cfg)
    pixels = inputs.get("pixel_values")
    if pixels is None:
        return x
    feats = _siglip_fwd(params["vision_tower"], pixels, cfg)
    soft = _project_features(params, feats, cfg)      # (B, T, H)
    is_img = ids == cfg.image_token_id                 # (B, S)
    tok_idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                       cfg.mm_tokens_per_image - 1)
    gathered = jnp.take_along_axis(soft, tok_idx[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered.astype(x.dtype), x)


def model_fwd(params: Dict[str, Any], inputs, cfg: Gemma3VLConfig
              ) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    ids = inputs["input_ids"] if isinstance(inputs, dict) else inputs
    S = ids.shape[1]
    (cos, sin), (cosl, sinl) = llama.dual_rope_tables(cfg, S)
    smask = (llama.sliding_mask(cfg, S) if cfg.sliding_window is not None
             and S > cfg.sliding_window else None)
    for li, b in enumerate(params["blocks"]):
        sliding = llama.layer_is_sliding(cfg, li)
        c, s = (cosl, sinl) if sliding else (cos, sin)
        x = llama.block_fwd(b, x, c, s, cfg,
                            mask=smask if sliding else None)
    return llama.final_fwd(params, x, cfg)


CONFIG_PRESETS = {
    "tiny-gemma3vl": Gemma3VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
        qk_norm=True, rope_theta=1000000.0, rope_local_theta=10000.0,
        rope_scaling_factor=8.0, rms_eps=1e-6, norm_offset=1.0,
        hidden_act="gelu_tanh", embed_scale=True, sandwich_norms=True,
        attn_scale=16.0 ** 0.5, sliding_window=8,
        layer_types=("sliding_attention", "sliding_attention",
                     "full_attention"),
        tie_embeddings=True, dtype=jnp.float32,
        v_hidden=64, v_layers=2, v_heads=4, v_intermediate=128,
        image_size=64, patch_size=16, mm_tokens_per_image=4,
        image_token_id=250),
    # gemma3-4b-it shapes (HF google/gemma-3-4b-it)
    "gemma3-4b-vl": Gemma3VLConfig(
        vocab_size=262208, hidden_size=2560, intermediate_size=10240,
        num_layers=34, num_heads=8, num_kv_heads=4, head_dim=256,
        qk_norm=True, rope_theta=1000000.0, rope_local_theta=10000.0,
        rope_scaling_factor=8.0, rms_eps=1e-6, norm_offset=1.0,
        hidden_act="gelu_tanh", embed_scale=True, sandwich_norms=True,
        attn_scale=256.0 ** 0.5, sliding_window=1024,
        layer_types=tuple(
            "full_attention" if (i + 1) % 6 == 0 else "sliding_attention"
            for i in range(34)),
        tie_embeddings=True, dtype=jnp.bfloat16,
        v_hidden=1152, v_layers=27, v_heads=16, v_intermediate=4304,
        image_size=896, patch_size=14, mm_tokens_per_image=256,
        image_token_id=262144),
}
