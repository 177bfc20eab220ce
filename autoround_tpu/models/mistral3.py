"""Mistral-3 / Pixtral family: RMSNorm ViT with interleaved-h/w 2-D
rope and an unfold patch merger over a Mistral (llama-family) decoder.

Role of the reference's mistral3 / mistral3_2 template registrations
(``compressors/mllm/template.py:127-128``); modeling mirrors HF
``Mistral3ForConditionalGeneration`` (Pixtral vision tower).  What this
family adds over the existing VLM zoo:

* Pixtral ViT: RMSNorm pre-norm blocks, bias-free q/k/v/o, SwiGLU MLP,
  and a 2-D rope whose FREQUENCY PAIRS interleave height and width —
  pair 2j takes h-frequency ``theta^(-4j/d)``, pair 2j+1 the
  w-frequency ``theta^(-(4j+2)/d)`` (HF ``PixtralRotaryEmbedding``);
  patches stream ROW-MAJOR (not merge-block-major);
* Mistral3 projector: vision-RMSNorm → PatchMerger (m x m unfold of the
  row-major grid through a bias-free merge linear back to the vision
  width) → linear1 → GELU → linear2 into the text width;
* decoder: plain llama/mistral blocks (the [IMG]/[IMG_BREAK]/[IMG_END]
  prompt convention lives in the template registry).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig, rms_norm

__all__ = ["Mistral3Config", "init_params", "embed_fwd", "model_fwd",
           "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Mistral3Config(LlamaConfig):
    image_token_id: int = 10
    # --- Pixtral vision tower ---
    v_hidden: int = 1024
    v_layers: int = 24
    v_heads: int = 16
    v_intermediate: int = 4096
    v_image_size: int = 1024          # max side; rope table side
    patch_size: int = 16
    spatial_merge_size: int = 2
    v_rope_theta: float = 10000.0
    v_rms_eps: float = 1e-5
    projector_bias: bool = False

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size ** 2

    @property
    def v_head_dim(self) -> int:
        return self.v_hidden // self.v_heads


CONFIG_PRESETS: Dict[str, Mistral3Config] = {
    "tiny-mistral3": Mistral3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, rope_theta=1e4,
        image_token_id=10, dtype=jnp.float32,
        v_hidden=32, v_layers=2, v_heads=2, v_intermediate=64,
        v_image_size=64, patch_size=8, spatial_merge_size=2),
}


def block_linear_names(cfg: Mistral3Config) -> Tuple[str, ...]:
    return llama.LINEAR_KEYS


def init_params(cfg: Mistral3Config, key: jax.Array) -> Dict[str, Any]:
    params = llama.init_params(cfg, key)
    vk = jax.random.split(jax.random.fold_in(key, 477), cfg.v_layers + 6)
    D, M = cfg.v_hidden, cfg.v_intermediate
    n = lambda k, s: jax.random.normal(k, s, cfg.dtype) * 0.02
    o = lambda s: jnp.ones(s, cfg.dtype)
    blocks: List[Dict[str, jax.Array]] = []
    for li in range(cfg.v_layers):
        bk = jax.random.split(vk[li], 7)
        blocks.append({
            "attn_norm": o((D,)), "ffn_norm": o((D,)),
            "q_proj": n(bk[0], (D, D)), "k_proj": n(bk[1], (D, D)),
            "v_proj": n(bk[2], (D, D)), "o_proj": n(bk[3], (D, D)),
            "gate_proj": n(bk[4], (M, D)),
            "up_proj": n(bk[5], (M, D)),
            "down_proj": n(bk[6], (D, M)),
        })
    m2 = cfg.spatial_merge_size ** 2
    params["visual"] = {
        "patch_embed": n(vk[-6], (D, cfg.patch_dim)),
        "ln_pre": o((D,)),
        "blocks": blocks,
        "proj_norm": o((D,)),
        "merge": n(vk[-5], (D, D * m2)),        # PatchMerger linear
        "fc1": n(vk[-4], (cfg.hidden_size, D)),
        "fc2": n(vk[-3], (cfg.hidden_size, cfg.hidden_size)),
    }
    if cfg.projector_bias:
        params["visual"]["fc1_b"] = jnp.zeros((cfg.hidden_size,), cfg.dtype)
        params["visual"]["fc2_b"] = jnp.zeros((cfg.hidden_size,), cfg.dtype)
    return params


def _pixtral_rope(cfg: Mistral3Config,
                  grid_hw: Sequence[Tuple[int, int]]
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """(N, head_dim) cos/sin in ROW-MAJOR patch order, h/w-interleaved
    frequency pairs (HF PixtralRotaryEmbedding)."""
    d = cfg.v_head_dim
    base = cfg.v_rope_theta
    freqs = 1.0 / (base ** (np.arange(0, d, 2) / d))    # (d/2,)
    fh, fw = freqs[::2], freqs[1::2]                    # (d/4,) each
    rows = []
    for h, w in grid_hw:
        hh = np.arange(h)[:, None] * fh[None, :]        # (h, d/4)
        ww = np.arange(w)[:, None] * fw[None, :]        # (w, d/4)
        emb = np.concatenate([
            np.broadcast_to(hh[:, None, :], (h, w, fh.size)),
            np.broadcast_to(ww[None, :, :], (h, w, fw.size)),
        ], axis=-1).reshape(h * w, d // 2)
        rows.append(np.concatenate([emb, emb], axis=-1))  # (hw, d)
    emb = np.concatenate(rows, axis=0)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def vit_fwd(visual: Dict[str, Any], patches: jax.Array,
            grid_hw: Sequence[Tuple[int, int]],
            cfg: Mistral3Config) -> jax.Array:
    """Row-major flattened patches (N, patch_dim) → projected soft
    tokens (N/m², text hidden)."""
    from .qwen2vl import _rotate_half
    D, nh, hd = cfg.v_hidden, cfg.v_heads, cfg.v_head_dim
    m = cfg.spatial_merge_size
    x = jnp.einsum("ni,di->nd",
                   patches.astype(visual["patch_embed"].dtype),
                   visual["patch_embed"])
    x = rms_norm(x, visual["ln_pre"], cfg.v_rms_eps)
    cos_np, sin_np = _pixtral_rope(cfg, grid_hw)
    cos = jnp.asarray(cos_np)[:, None, :]
    sin = jnp.asarray(sin_np)[:, None, :]
    # block-diagonal attention across images
    sizes = [h * w for h, w in grid_hw]
    mask = None
    if len(sizes) > 1:
        N = sum(sizes)
        mnp = np.full((N, N), -1e9, np.float32)
        off = 0
        for s in sizes:
            mnp[off:off + s, off:off + s] = 0.0
            off += s
        mask = jnp.asarray(mnp)
    N = x.shape[0]
    for blk in visual["blocks"]:
        h = rms_norm(x, blk["attn_norm"], cfg.v_rms_eps)
        q = jnp.einsum("nd,od->no", h, blk["q_proj"]).reshape(N, nh, hd)
        k = jnp.einsum("nd,od->no", h, blk["k_proj"]).reshape(N, nh, hd)
        v = jnp.einsum("nd,od->no", h, blk["v_proj"]).reshape(N, nh, hd)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(v.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(v.dtype)
        s = jnp.einsum("snh,tnh->nst", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        if mask is not None:
            s = s + mask[None]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("nst,tnh->snh", p, v).reshape(N, D)
        x = x + jnp.einsum("nd,od->no", a, blk["o_proj"])
        h = rms_norm(x, blk["ffn_norm"], cfg.v_rms_eps)
        gate = jax.nn.silu(jnp.einsum("nd,md->nm", h, blk["gate_proj"]))
        up = jnp.einsum("nd,md->nm", h, blk["up_proj"])
        x = x + jnp.einsum("nm,dm->nd", gate * up, blk["down_proj"])
    # projector: RMSNorm → unfold patch merge → fc1 GELU fc2
    x = rms_norm(x, visual["proj_norm"], cfg.rms_eps)
    merged = []
    off = 0
    for hgrid, wgrid in grid_hw:
        img = x[off:off + hgrid * wgrid].reshape(hgrid, wgrid, D)
        off += hgrid * wgrid
        # torch unfold(kernel=m, stride=m) channel ordering: (D, m, m)
        g = img.reshape(hgrid // m, m, wgrid // m, m, D)
        g = g.transpose(0, 2, 4, 1, 3)              # (H', W', D, m, m)
        merged.append(g.reshape(-1, D * m * m))
    x = jnp.concatenate(merged, axis=0)
    x = jnp.einsum("nf,df->nd", x, visual["merge"])
    x = jnp.einsum("nd,hd->nh", x, visual["fc1"]) \
        + visual.get("fc1_b", 0.0)
    x = jax.nn.gelu(x, approximate=False)
    return jnp.einsum("nh,oh->no", x, visual["fc2"]) \
        + visual.get("fc2_b", 0.0)


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, Any]],
              cfg: Mistral3Config) -> jax.Array:
    if not isinstance(inputs, dict):
        return llama.embed_fwd(params, inputs, cfg)
    ids = inputs["input_ids"]
    x = llama.embed_fwd(params, ids, cfg)
    pixels = inputs.get("pixel_values")
    if pixels is None:
        return x
    feats = vit_fwd(params["visual"], pixels, inputs["grid_hw"], cfg)
    B = ids.shape[0]
    per_row = feats.shape[0] // B
    feats = feats.reshape(B, per_row, -1)
    is_img = ids == cfg.image_token_id
    idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, per_row - 1)
    gathered = jnp.take_along_axis(feats, idx[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered.astype(x.dtype), x)


def model_fwd(params: Dict[str, Any], inputs,
              cfg: Mistral3Config) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    S = x.shape[1]
    cos, sin = llama.rope_tables(cfg, S)
    for b in params["blocks"]:
        x = llama.block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
