"""Qwen2.5-VL: WINDOW-attention RMSNorm ViT over the Qwen2-VL m-rope
decoder.

Role of the reference's qwen2_5_vl template registration
(``compressors/mllm/template.py:121``); modeling mirrors HF
``Qwen2_5_VLForConditionalGeneration``.  vs qwen2vl's ViT: RMSNorm
pre-norms, bias'd SwiGLU MLP, and WINDOWED attention — merge-unit
groups permute into ``window_size``-pixel windows (host-precomputed
``window_index``), every block attends block-diagonally within its
window except the ``fullatt_block_indexes`` blocks (per-image full
attention), and the merger output reverse-permutes back to stream
order.  The decoder (m-rope sections, Qwen2 attention biases) is
``qwen2vl``'s unchanged.

TPU-first shape discipline: grids are static python metadata, so the
window permutation, its inverse, and both block-diagonal masks are
host-precomputed numpy constants — the trace sees fixed shapes and two
additive masks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import llama, qwen2vl
from .llama import rms_norm
from .qwen2vl import Qwen2VLConfig, _rotate_half

__all__ = ["Qwen25VLConfig", "init_params", "embed_fwd", "model_fwd",
           "rope_tables", "rope_tables_for_inputs", "block_linear_names",
           "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Qwen25VLConfig(Qwen2VLConfig):
    v_intermediate: int = 3420
    window_size: int = 112                      # pixels
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    v_rms_eps: float = 1e-6


CONFIG_PRESETS: Dict[str, Qwen25VLConfig] = {
    "tiny-qwen25vl": Qwen25VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, attn_bias=True,
        rope_theta=1e4, dtype=jnp.float32,
        mrope_section=(2, 3, 3), image_token_id=5,
        v_embed_dim=32, v_layers=3, v_heads=2, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2, v_intermediate=48,
        # window = 2 merged patches per side (16px at patch 4, merge 2)
        window_size=16, fullatt_block_indexes=(1,)),
}


def block_linear_names(cfg: Qwen25VLConfig) -> Tuple[str, ...]:
    return llama.LINEAR_KEYS


def init_params(cfg: Qwen25VLConfig, key: jax.Array) -> Dict[str, Any]:
    params = llama.init_params(cfg, key)
    vk = jax.random.split(jax.random.fold_in(key, 577), cfg.v_layers + 4)
    D, M = cfg.v_embed_dim, cfg.v_intermediate
    n = lambda k, s: jax.random.normal(k, s, cfg.dtype) * 0.02
    z = lambda s: jnp.zeros(s, cfg.dtype)
    o = lambda s: jnp.ones(s, cfg.dtype)
    blocks: List[Dict[str, jax.Array]] = []
    for li in range(cfg.v_layers):
        bk = jax.random.split(vk[li], 5)
        blocks.append({
            "norm1": o((D,)), "norm2": o((D,)),
            "qkv": n(bk[0], (3 * D, D)), "qkv_b": z((3 * D,)),
            "proj": n(bk[1], (D, D)), "proj_b": z((D,)),
            "gate_proj": n(bk[2], (M, D)), "gate_b": z((M,)),
            "up_proj": n(bk[3], (M, D)), "up_b": z((M,)),
            "down_proj": n(bk[4], (D, M)), "down_b": z((D,)),
        })
    params["visual"] = {
        "patch_embed": n(vk[-4], (D, cfg.patch_dim)),
        "blocks": blocks,
        "merger": {
            "ln_q": o((D,)),                    # RMSNorm (2.5 change)
            "fc1": n(vk[-3], (cfg.merge_dim, cfg.merge_dim)),
            "fc1_b": z((cfg.merge_dim,)),
            "fc2": n(vk[-2], (cfg.hidden_size, cfg.merge_dim)),
            "fc2_b": z((cfg.hidden_size,)),
        },
    }
    return params


def _window_index(cfg: Qwen25VLConfig,
                  grid_thw: Sequence[Tuple[int, int, int]]):
    """(window_index over merge units, per-window unit counts) — numpy
    port of HF ``get_window_index`` (static metadata)."""
    m = cfg.spatial_merge_size
    vw = cfg.window_size // m // cfg.patch_size  # merged patches / side
    order: List[np.ndarray] = []
    win_sizes: List[int] = []
    base = 0
    for t, h, w in grid_thw:
        lh, lw = h // m, w // m
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        ph, pw = (-lh) % vw, (-lw) % vw
        padded = np.pad(idx, ((0, 0), (0, ph), (0, pw)),
                        constant_values=-100)
        nh, nw = (lh + ph) // vw, (lw + pw) // vw
        padded = padded.reshape(t, nh, vw, nw, vw).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t * nh * nw, vw * vw)
        for win in padded:
            keep = win[win != -100]
            if keep.size:
                order.append(keep + base)
                win_sizes.append(keep.size)
        base += t * lh * lw
    return np.concatenate(order), np.asarray(win_sizes)


def _block_mask(sizes: Sequence[int]) -> np.ndarray:
    N = int(sum(sizes))
    mask = np.full((N, N), -1e9, np.float32)
    off = 0
    for s in sizes:
        mask[off:off + int(s), off:off + int(s)] = 0.0
        off += int(s)
    return mask


def vit_fwd(visual: Dict[str, Any], patches: jax.Array,
            grid_thw: Sequence[Tuple[int, int, int]],
            cfg: Qwen25VLConfig) -> jax.Array:
    D, nh = cfg.v_embed_dim, cfg.v_heads
    hd = D // nh
    mu = cfg.spatial_merge_size ** 2
    x = jnp.einsum("ni,di->nd",
                   patches.astype(visual["patch_embed"].dtype),
                   visual["patch_embed"])
    N = x.shape[0]
    # window permutation over merge-unit groups (host-precomputed)
    widx, win_units = _window_index(cfg, grid_thw)
    perm = (widx[:, None] * mu + np.arange(mu)[None, :]).reshape(-1)
    inv = np.argsort(perm)
    x = x[jnp.asarray(perm)]
    cos_np, sin_np = qwen2vl._vision_rope(cfg, grid_thw)
    cos = jnp.asarray(cos_np[perm])[:, None, :]
    sin = jnp.asarray(sin_np[perm])[:, None, :]
    # masks: per-window block-diag / per-image block-diag (both in
    # window order — windows never cross images)
    wmask = jnp.asarray(_block_mask(win_units * mu))
    img_sizes = [t * h * w for t, h, w in grid_thw]
    fmask = (jnp.asarray(_block_mask(img_sizes))
             if len(img_sizes) > 1 else None)
    for li, blk in enumerate(visual["blocks"]):
        mask = (fmask if li in cfg.fullatt_block_indexes else wmask)
        h = rms_norm(x, blk["norm1"], cfg.v_rms_eps)
        qkv = jnp.einsum("nd,od->no", h, blk["qkv"]) + blk["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, nh, hd)
        k = k.reshape(N, nh, hd)
        v = v.reshape(N, nh, hd)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(v.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(v.dtype)
        s = jnp.einsum("snh,tnh->nst", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        if mask is not None:
            s = s + mask[None]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("nst,tnh->snh", p, v).reshape(N, D)
        x = x + jnp.einsum("nd,od->no", a, blk["proj"]) + blk["proj_b"]
        h = rms_norm(x, blk["norm2"], cfg.v_rms_eps)
        gate = jax.nn.silu(
            jnp.einsum("nd,md->nm", h, blk["gate_proj"]) + blk["gate_b"])
        up = jnp.einsum("nd,md->nm", h, blk["up_proj"]) + blk["up_b"]
        x = x + jnp.einsum("nm,dm->nd", gate * up,
                           blk["down_proj"]) + blk["down_b"]
    mg = visual["merger"]
    x = rms_norm(x, mg["ln_q"], cfg.v_rms_eps)
    x = x.reshape(-1, cfg.merge_dim)
    x = jnp.einsum("nm,om->no", x, mg["fc1"]) + mg["fc1_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = jnp.einsum("nm,hm->nh", x, mg["fc2"]) + mg["fc2_b"]
    # merger output is per merge-unit: reverse the UNIT permutation
    return x[jnp.asarray(np.argsort(widx))]


# decoder machinery is qwen2vl's (m-rope sections, Qwen2 biases)
rope_tables = qwen2vl.rope_tables
rope_tables_for_inputs = qwen2vl.rope_tables_for_inputs


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, Any]],
              cfg: Qwen25VLConfig) -> jax.Array:
    if not isinstance(inputs, dict):
        return llama.embed_fwd(params, inputs, cfg)
    ids = inputs["input_ids"]
    x = llama.embed_fwd(params, ids, cfg)
    pixels = inputs.get("pixel_values")
    if pixels is None:
        return x
    feats = vit_fwd(params["visual"], pixels, inputs["grid_thw"], cfg)
    B = ids.shape[0]
    per_row = feats.shape[0] // B
    feats = feats.reshape(B, per_row, -1)
    is_img = ids == cfg.image_token_id
    idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, per_row - 1)
    gathered = jnp.take_along_axis(feats, idx[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered.astype(x.dtype), x)


def model_fwd(params: Dict[str, Any], inputs,
              cfg: Qwen25VLConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    cos, sin = qwen2vl.rope_tables_for_inputs(cfg, inputs)
    for b in params["blocks"]:
        x = llama.block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
