"""Qwen2-VL: 2D-rotary ViT tower → 2×2 patch merger → Qwen2 decoder
with multimodal (t/h/w) rope.

Second real VLM family beside LLaVA (role of the reference's mllm
template/processor registry entries for qwen2-vl,
``compressors/mllm/template.py:81-169`` and the special getter
``special_model_handler.py:405-520``).  Locked by logit parity against
HF ``Qwen2VLForConditionalGeneration`` (eager) in
``tests/test_qwen2vl.py``.

TPU-first shape discipline: the HF processor's flattened-patch layout
is kept (``(n_patches, C·tps·ps²)`` rows in merge-block-major order —
``image_processing_qwen2_vl.py:281-295``), the image grid
(``grid_thw``) is STATIC python metadata, and the vision rope /
block-diagonal image mask are precomputed host-side so the whole tower
traces with fixed shapes.  The 3-component m-rope collapses to standard
1D rope for text-only batches (all three position components equal), so
the decoder blocks are plain ``llama.block_fwd`` fed per-batch (B, S,
hd) cos/sin tables.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig

__all__ = ["Qwen2VLConfig", "init_params", "embed_fwd", "model_fwd",
           "rope_tables", "rope_tables_for_inputs", "get_mrope_positions",
           "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Qwen2VLConfig(LlamaConfig):
    # text side is Qwen2 (q/k/v bias); mrope sections sum to hd // 2
    mrope_section: Tuple[int, int, int] = (16, 24, 24)
    image_token_id: int = 151655
    # --- vision tower (HF Qwen2VLVisionConfig) ---
    v_embed_dim: int = 1280
    v_layers: int = 32
    v_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    v_mlp_ratio: float = 4.0
    v_rope_theta: float = 10000.0

    @property
    def patch_dim(self) -> int:
        return 3 * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_dim(self) -> int:
        return self.v_embed_dim * self.spatial_merge_size ** 2

    @property
    def v_mlp_dim(self) -> int:
        return int(self.v_embed_dim * self.v_mlp_ratio)


CONFIG_PRESETS: Dict[str, Qwen2VLConfig] = {
    "tiny-qwen2vl": Qwen2VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, attn_bias=True,
        rope_theta=10000.0, dtype=jnp.float32,
        mrope_section=(2, 3, 3), image_token_id=5,
        v_embed_dim=32, v_layers=2, v_heads=2, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2, v_mlp_ratio=2.0),
}


def block_linear_names(cfg: Qwen2VLConfig) -> Tuple[str, ...]:
    return llama.LINEAR_KEYS


def init_params(cfg: Qwen2VLConfig, key: jax.Array) -> Dict[str, Any]:
    params = llama.init_params(cfg, key)
    vk = jax.random.split(jax.random.fold_in(key, 77), cfg.v_layers + 4)
    D, M = cfg.v_embed_dim, cfg.v_mlp_dim
    n = lambda k, s: jax.random.normal(k, s, cfg.dtype) * 0.02
    z = lambda s: jnp.zeros(s, cfg.dtype)
    o = lambda s: jnp.ones(s, cfg.dtype)
    blocks: List[Dict[str, jax.Array]] = []
    for li in range(cfg.v_layers):
        bk = jax.random.split(vk[li], 4)
        blocks.append({
            "ln1_g": o((D,)), "ln1_b": z((D,)),
            "qkv": n(bk[0], (3 * D, D)), "qkv_b": z((3 * D,)),
            "proj": n(bk[1], (D, D)), "proj_b": z((D,)),
            "ln2_g": o((D,)), "ln2_b": z((D,)),
            "fc1": n(bk[2], (M, D)), "fc1_b": z((M,)),
            "fc2": n(bk[3], (D, M)), "fc2_b": z((D,)),
        })
    params["visual"] = {
        "patch_embed": n(vk[-4], (D, cfg.patch_dim)),
        "blocks": blocks,
        "merger": {
            "ln_q_g": o((D,)), "ln_q_b": z((D,)),
            "fc1": n(vk[-3], (cfg.merge_dim, cfg.merge_dim)),
            "fc1_b": z((cfg.merge_dim,)),
            "fc2": n(vk[-2], (cfg.hidden_size, cfg.merge_dim)),
            "fc2_b": z((cfg.hidden_size,)),
        },
    }
    return params


def _layer_norm(x, g, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _vision_pos_ids(grid_thw: Sequence[Tuple[int, int, int]],
                    m: int) -> np.ndarray:
    """Per-patch (h, w) indices in the processor's merge-block-major
    order (HF ``rot_pos_emb``, modeling_qwen2_vl.py:673-699)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
        perm = lambda p: p.reshape(h // m, m, w // m, m).transpose(
            0, 2, 1, 3).reshape(-1)
        hw = np.stack([perm(hp), perm(wp)], axis=-1)      # (h*w, 2)
        out.append(np.tile(hw, (t, 1)))
    return np.concatenate(out, axis=0)                     # (N, 2)


def _vision_rope(cfg: Qwen2VLConfig,
                 grid_thw: Sequence[Tuple[int, int, int]]
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin (N, v_head_dim): h-freqs then w-freqs, duplicated."""
    hd = cfg.v_embed_dim // cfg.v_heads
    dim = hd // 2
    inv = 1.0 / (cfg.v_rope_theta ** (np.arange(0, dim, 2) / dim))
    pos = _vision_pos_ids(grid_thw, cfg.spatial_merge_size)  # (N, 2)
    freqs = pos[:, :, None] * inv[None, None, :]             # (N, 2, dim/2)
    emb = freqs.reshape(len(pos), -1)                        # (N, dim)
    emb = np.concatenate([emb, emb], axis=-1)                # (N, hd)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _image_mask(grid_thw: Sequence[Tuple[int, int, int]]) -> Optional[np.ndarray]:
    """Additive block-diagonal mask: patches attend within their image
    only (HF cu_seqlens splitting).  None for a single image."""
    if len(grid_thw) <= 1:
        return None
    sizes = [t * h * w for t, h, w in grid_thw]
    N = sum(sizes)
    mask = np.full((N, N), -1e9, np.float32)
    off = 0
    for s in sizes:
        mask[off:off + s, off:off + s] = 0.0
        off += s
    return mask


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def vit_fwd(visual: Dict[str, Any], patches: jax.Array,
            grid_thw: Sequence[Tuple[int, int, int]],
            cfg: Qwen2VLConfig) -> jax.Array:
    """Flattened patches (N, patch_dim) → merged features (N/m², H).

    ``grid_thw`` is static python metadata — the vision rope tables and
    the multi-image block mask are host-precomputed numpy constants."""
    D, nh = cfg.v_embed_dim, cfg.v_heads
    hd = D // nh
    x = jnp.einsum("ni,di->nd", patches.astype(visual["patch_embed"].dtype),
                   visual["patch_embed"])
    cos_np, sin_np = _vision_rope(cfg, grid_thw)
    cos = jnp.asarray(cos_np)[:, None, :]      # (N, 1, hd)
    sin = jnp.asarray(sin_np)[:, None, :]
    mask_np = _image_mask(grid_thw)
    mask = None if mask_np is None else jnp.asarray(mask_np)
    N = x.shape[0]
    for blk in visual["blocks"]:
        h = _layer_norm(x, blk["ln1_g"], blk["ln1_b"])
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
        h = _layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        h = jnp.einsum("nd,od->no", h, blk["fc1"]) + blk["fc1_b"]
        h = h * jax.nn.sigmoid(1.702 * h)      # quick_gelu
        x = x + jnp.einsum("nm,dm->nd", h, blk["fc2"]) + blk["fc2_b"]
    mg = visual["merger"]
    x = _layer_norm(x, mg["ln_q_g"], mg["ln_q_b"])
    x = x.reshape(-1, cfg.merge_dim)           # m² consecutive patches merge
    x = jnp.einsum("nm,om->no", x, mg["fc1"]) + mg["fc1_b"]
    x = jax.nn.gelu(x, approximate=False)
    return jnp.einsum("nm,hm->nh", x, mg["fc2"]) + mg["fc2_b"]  # (Nm, H)


# ------------------------------------------------------------------ m-rope
def get_mrope_positions(ids: np.ndarray,
                        grid_thw: Sequence[Tuple[int, int, int]],
                        cfg: Qwen2VLConfig) -> np.ndarray:
    """(B, S) token ids → (3, B, S) t/h/w position ids (HF
    ``get_rope_index``, modeling_qwen2_vl.py:925).  Text tokens advance
    all three components together; an image's tokens take (t, row, col)
    offsets from the current base; later text resumes at max + 1.
    Assumes images appear per-row in ``grid_thw`` order."""
    ids = np.asarray(ids)
    B, S = ids.shape
    pos = np.zeros((3, B, S), np.int64)
    m = cfg.spatial_merge_size
    img_i = 0
    for b in range(B):
        row = ids[b]
        st = 0
        base = 0
        s_out = 0
        while st < S:
            img_positions = np.nonzero(row[st:] == cfg.image_token_id)[0]
            if img_positions.size == 0:
                n_text = S - st
                seq = base + np.arange(n_text)
                pos[:, b, s_out:s_out + n_text] = seq[None]
                break
            nxt = st + int(img_positions[0])
            n_text = nxt - st
            if n_text:
                seq = base + np.arange(n_text)
                pos[:, b, s_out:s_out + n_text] = seq[None]
                s_out += n_text
                base += n_text
            t, h, w = grid_thw[img_i]
            lh, lw = h // m, w // m
            n_img = t * lh * lw
            ti = np.repeat(np.arange(t), lh * lw)
            hi = np.tile(np.repeat(np.arange(lh), lw), t)
            wi = np.tile(np.arange(lw), t * lh)
            pos[0, b, s_out:s_out + n_img] = base + ti
            pos[1, b, s_out:s_out + n_img] = base + hi
            pos[2, b, s_out:s_out + n_img] = base + wi
            base = base + int(max(t, lh, lw))
            s_out += n_img
            st = nxt + n_img
            img_i += 1
    return pos


def mrope_tables(cfg: Qwen2VLConfig, positions: np.ndarray
                 ) -> Tuple[jax.Array, jax.Array]:
    """(3, B, S) positions → (B, S, hd) cos/sin with mrope sections
    interleaved (HF ``apply_multimodal_rotary_pos_emb``: the doubled
    section list alternates t/h/w chunks across the head dim)."""
    hd = cfg.hd
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2) / hd))
    freqs = positions[..., None].astype(np.float32) * inv  # (3,B,S,hd/2)
    emb = np.concatenate([freqs, freqs], axis=-1)          # (3,B,S,hd)
    cos3, sin3 = np.cos(emb), np.sin(emb)
    sec = list(cfg.mrope_section) * 2
    splits = np.cumsum(sec)[:-1]
    cos = np.concatenate(
        [c[i % 3] for i, c in enumerate(np.split(cos3, splits, axis=-1))],
        axis=-1)
    sin = np.concatenate(
        [s[i % 3] for i, s in enumerate(np.split(sin3, splits, axis=-1))],
        axis=-1)
    return jnp.asarray(cos), jnp.asarray(sin)


def rope_tables(cfg: Qwen2VLConfig, seqlen: int,
                positions: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Text-only tables: with equal t/h/w components the section mixing
    is the identity, so this is standard llama rope."""
    return llama.rope_tables(cfg, seqlen, positions=positions)


def rope_tables_for_inputs(cfg: Qwen2VLConfig, inputs,
                           shared: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    """Batch-dependent decoder rope: multimodal batches get m-rope
    tables from the token layout; text-only falls back to 1D rope.
    The orchestrator calls this (when the family defines it) instead of
    ``rope_tables(cfg, seqlen)`` so vision-token positions are exact
    during calibration.

    ``shared=True`` (the orchestrator's mode) returns (S, hd) tables
    from row 0 and requires every row to share the token layout — the
    tuning loop shuffles/slices sample batches under closure-captured
    tables, so per-row tables cannot ride along.  Calibration batches
    from the VLM processor are uniform by construction (same grid, same
    prompt shape).  Direct inference (``model_fwd``) gets exact per-row
    (B, S, hd) tables."""
    if not isinstance(inputs, dict) or "grid_thw" not in inputs:
        ids = inputs["input_ids"] if isinstance(inputs, dict) else inputs
        return llama.rope_tables(cfg, ids.shape[1])
    ids = np.asarray(inputs["input_ids"])
    pos = get_mrope_positions(ids, inputs["grid_thw"], cfg)
    if shared:
        if not (pos == pos[:, :1]).all():
            raise ValueError(
                "qwen2vl calibration batches must share one token layout "
                "per batch (same image grid + prompt shape); got rows "
                "with differing m-rope positions")
        cos, sin = mrope_tables(cfg, pos[:, :1])
        return cos[0], sin[0]
    return mrope_tables(cfg, pos)


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, Any]],
              cfg: Qwen2VLConfig) -> jax.Array:
    """Multimodal embedding: image-token positions take merged patch
    features in order.  inputs: token array, or {"input_ids" (B,S),
    "pixel_values" (N, patch_dim), "grid_thw" static [(t,h,w), ...]}.
    Every row must hold the same number of image tokens (uniform
    calibration grids), so the merged features reshape to (B, P, H)."""
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
    patch_idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, per_row - 1)
    gathered = jnp.take_along_axis(feats, patch_idx[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered.astype(x.dtype), x)


def model_fwd(params: Dict[str, Any], inputs,
              cfg: Qwen2VLConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    cos, sin = rope_tables_for_inputs(cfg, inputs)
    for b in params["blocks"]:
        x = llama.block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
