"""Qwen3-VL-MoE: deepstack ViT tower → Qwen3-MoE decoder with
interleaved m-rope.

Role of the reference's qwen3_vl_moe fused-expert spec
(``modeling/fused_moe/qwen3_vl_moe.py``) and its mllm template
registration; modeling mirrors HF ``Qwen3VLMoeForConditionalGeneration``.
Locked by logit parity in ``tests/test_qwen3vlmoe.py``.

What this family adds over qwen2vl + mixtral:

* DEEPSTACK (arXiv:2406.04334): the vision tower emits, besides the
  final merged features, one merged feature set per
  ``deepstack_visual_indexes`` layer; the DECODER adds feature set j to
  its hidden states AT IMAGE-TOKEN POSITIONS after layer j.  The
  injections ride the orchestrator's ``chain_extras`` hook so the
  FP/quantized calibration chains stay exact (the added constant is
  identical on both sides of every block's tuning loss).
* interleaved m-rope: the t/h/w frequency components interleave
  [T H W T H W ... T T] across the head dim (HF
  ``apply_interleaved_mrope``) instead of qwen2vl's chunked sections.
* learned 2-D pos-embed table, bilinearly interpolated to each grid
  (HF ``fast_pos_embed_interpolate``), on top of the 2-D rotary.
* text decoder = Qwen3-MoE: qk-norm GQA + softmax top-k renormalized
  experts — exactly ``mixtral.block_fwd`` with qk_norm/norm_topk_prob
  (expert leaves w1/w3/w2 = HF gate/up/down).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import llama, mixtral, qwen2vl
from .qwen2vl import _image_mask, _layer_norm, _vision_pos_ids

__all__ = ["Qwen3VLMoeConfig", "init_params", "embed_fwd", "model_fwd",
           "rope_tables", "rope_tables_for_inputs", "chain_extras",
           "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Qwen3VLMoeConfig(mixtral.MixtralConfig):
    # text decoder is qwen3-moe: qk_norm=True, norm_topk_prob=True
    mrope_section: Tuple[int, int, int] = (24, 20, 20)
    image_token_id: int = 151655
    # --- vision tower (HF Qwen3VLMoeVisionConfig) ---
    v_embed_dim: int = 1152
    v_layers: int = 27
    v_heads: int = 16
    v_intermediate: int = 4304
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    v_rope_theta: float = 10000.0
    num_position_embeddings: int = 2304       # (48 grid)²
    deepstack_visual_indexes: Tuple[int, ...] = (8, 16, 24)

    @property
    def patch_dim(self) -> int:
        return 3 * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_dim(self) -> int:
        return self.v_embed_dim * self.spatial_merge_size ** 2

    @property
    def num_grid_per_side(self) -> int:
        return int(self.num_position_embeddings ** 0.5)


CONFIG_PRESETS: Dict[str, Qwen3VLMoeConfig] = {
    # NOTE: intermediate_size is the ROUTED EXPERT width (the mixtral
    # convention this config inherits) = HF moe_intermediate_size
    "tiny-qwen3vlmoe": Qwen3VLMoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=32,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
        qk_norm=True, norm_topk_prob=True, num_experts=4, top_k=2,
        rope_theta=5e6, dtype=jnp.float32,
        mrope_section=(4, 2, 2), image_token_id=5,
        v_embed_dim=32, v_layers=3, v_heads=2, v_intermediate=64,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        num_position_embeddings=64, deepstack_visual_indexes=(0, 2)),
}


def block_linear_names(cfg: Qwen3VLMoeConfig) -> Tuple[str, ...]:
    return mixtral.block_linear_names(cfg)


def init_params(cfg: Qwen3VLMoeConfig, key: jax.Array) -> Dict[str, Any]:
    params = mixtral.init_params(cfg, key)
    vk = jax.random.split(jax.random.fold_in(key, 177), cfg.v_layers + 8)
    D, M = cfg.v_embed_dim, cfg.v_intermediate
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

    def merger(k, post: bool):
        md = cfg.merge_dim
        k1, k2 = jax.random.split(k)
        return {
            # pre-shuffle norm acts on D, post-shuffle on merge_dim
            "ln_g": o((md if post else D,)), "ln_b": z((md if post else D,)),
            "fc1": n(k1, (md, md)), "fc1_b": z((md,)),
            "fc2": n(k2, (cfg.hidden_size, md)),
            "fc2_b": z((cfg.hidden_size,)),
        }

    params["visual"] = {
        "patch_embed": n(vk[-8], (D, cfg.patch_dim)),
        "patch_embed_b": z((D,)),
        "pos_embed": n(vk[-7], (cfg.num_position_embeddings, D)),
        "blocks": blocks,
        "merger": merger(vk[-6], post=False),
        "deepstack_mergers": [
            merger(vk[-5 + j], post=True)
            for j in range(len(cfg.deepstack_visual_indexes))],
    }
    return params


# ------------------------------------------------------------------ vision
def _pos_embed_interp(table: jax.Array,
                      grid_thw: Sequence[Tuple[int, int, int]],
                      cfg: Qwen3VLMoeConfig) -> jax.Array:
    """Bilinear interpolation of the (G², D) learned table to each
    (h, w) grid, then the spatial-merge permutation into the patch
    stream's merge-block-major order (HF ``fast_pos_embed_interpolate``).
    Index/weight math is static numpy (grids are python metadata)."""
    G = cfg.num_grid_per_side
    m = cfg.spatial_merge_size
    outs = []
    for t, h, w in grid_thw:
        hi = np.linspace(0, G - 1, h)
        wi = np.linspace(0, G - 1, w)
        hf, wf = hi.astype(np.int64), wi.astype(np.int64)
        hc = np.clip(hf + 1, None, G - 1)
        wc = np.clip(wf + 1, None, G - 1)
        dh, dw = hi - hf, wi - wf
        idx = np.stack([
            (hf[:, None] * G + wf[None, :]).ravel(),
            (hf[:, None] * G + wc[None, :]).ravel(),
            (hc[:, None] * G + wf[None, :]).ravel(),
            (hc[:, None] * G + wc[None, :]).ravel()])          # (4, h*w)
        wgt = np.stack([
            ((1 - dh)[:, None] * (1 - dw)[None, :]).ravel(),
            ((1 - dh)[:, None] * dw[None, :]).ravel(),
            (dh[:, None] * (1 - dw)[None, :]).ravel(),
            (dh[:, None] * dw[None, :]).ravel()]).astype(np.float32)
        pe = jnp.einsum("kn,knd->nd",
                        jnp.asarray(wgt),
                        table[jnp.asarray(idx)].astype(jnp.float32))
        # row-major (h, w) grid → merge-block-major patch order, x t
        pe = pe.reshape(h // m, m, w // m, m, -1).transpose(0, 2, 1, 3, 4)
        pe = pe.reshape(h * w, -1)
        outs.append(jnp.tile(pe, (t, 1)))
    return jnp.concatenate(outs, axis=0)


def vit_fwd(visual: Dict[str, Any], patches: jax.Array,
            grid_thw: Sequence[Tuple[int, int, int]],
            cfg: Qwen3VLMoeConfig
            ) -> Tuple[jax.Array, List[jax.Array]]:
    """(N, patch_dim) → (merged (N/m², H), [deepstack (N/m², H), ...])."""
    D, nh = cfg.v_embed_dim, cfg.v_heads
    hd = D // nh
    x = jnp.einsum("ni,di->nd",
                   patches.astype(visual["patch_embed"].dtype),
                   visual["patch_embed"]) + visual["patch_embed_b"]
    x = x + _pos_embed_interp(visual["pos_embed"], grid_thw,
                              cfg).astype(x.dtype)
    cos_np, sin_np = qwen2vl._vision_rope(cfg, grid_thw)
    cos = jnp.asarray(cos_np)[:, None, :]
    sin = jnp.asarray(sin_np)[:, None, :]
    mask_np = _image_mask(grid_thw)
    mask = None if mask_np is None else jnp.asarray(mask_np)
    N = x.shape[0]

    def run_merger(mg, h, post: bool):
        if not post:
            h = _layer_norm(h, mg["ln_g"], mg["ln_b"])
            h = h.reshape(-1, cfg.merge_dim)
        else:
            h = h.reshape(-1, cfg.merge_dim)
            h = _layer_norm(h, mg["ln_g"], mg["ln_b"])
        h = jnp.einsum("nm,om->no", h, mg["fc1"]) + mg["fc1_b"]
        h = jax.nn.gelu(h, approximate=False)
        return jnp.einsum("nm,hm->nh", h, mg["fc2"]) + mg["fc2_b"]

    deepstack: List[jax.Array] = []
    for li, blk in enumerate(visual["blocks"]):
        h = _layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = jnp.einsum("nd,od->no", h, blk["qkv"]) + blk["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, nh, hd)
        k = k.reshape(N, nh, hd)
        v = v.reshape(N, nh, hd)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + qwen2vl._rotate_half(qf) * sin).astype(v.dtype)
        k = (kf * cos + qwen2vl._rotate_half(kf) * sin).astype(v.dtype)
        s = jnp.einsum("snh,tnh->nst", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        if mask is not None:
            s = s + mask[None]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("nst,tnh->snh", p, v).reshape(N, D)
        x = x + jnp.einsum("nd,od->no", a, blk["proj"]) + blk["proj_b"]
        h = _layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        h = jnp.einsum("nd,od->no", h, blk["fc1"]) + blk["fc1_b"]
        h = jax.nn.gelu(h, approximate=True)     # gelu_pytorch_tanh
        x = x + jnp.einsum("nm,dm->nd", h, blk["fc2"]) + blk["fc2_b"]
        if li in cfg.deepstack_visual_indexes:
            j = cfg.deepstack_visual_indexes.index(li)
            deepstack.append(run_merger(visual["deepstack_mergers"][j], x,
                                        post=True))
    return run_merger(visual["merger"], x, post=False), deepstack


# ------------------------------------------------------------------ m-rope
def mrope_tables_interleaved(cfg: Qwen3VLMoeConfig, positions: np.ndarray
                             ) -> Tuple[jax.Array, jax.Array]:
    """(3, B, S) positions → (B, S, hd) cos/sin with the INTERLEAVED
    t/h/w layout (HF ``apply_interleaved_mrope``): frequency index j
    takes H when j % 3 == 1 and j < 3·sec_h, W when j % 3 == 2 and
    j < 3·sec_w, else T."""
    hd = cfg.hd
    half = hd // 2
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2) / hd))
    freqs = positions[..., None].astype(np.float32) * inv  # (3,B,S,half)
    sec_t, sec_h, sec_w = cfg.mrope_section
    comp = np.zeros(half, np.int64)                        # default T
    j = np.arange(half)
    comp[(j % 3 == 1) & (j < 3 * sec_h)] = 1
    comp[(j % 3 == 2) & (j < 3 * sec_w)] = 2
    mixed = freqs[0].copy()                                # (B,S,half)
    mixed[..., comp == 1] = freqs[1][..., comp == 1]
    mixed[..., comp == 2] = freqs[2][..., comp == 2]
    emb = np.concatenate([mixed, mixed], axis=-1)
    return (jnp.asarray(np.cos(emb).astype(np.float32)),
            jnp.asarray(np.sin(emb).astype(np.float32)))


def rope_tables(cfg: Qwen3VLMoeConfig, seqlen: int,
                positions: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Text-only: equal t/h/w components make the interleave identity."""
    return llama.rope_tables(cfg, seqlen, positions=positions)


def rope_tables_for_inputs(cfg: Qwen3VLMoeConfig, inputs,
                           shared: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    """Same contract as qwen2vl.rope_tables_for_inputs (the orchestrator
    hook), with the interleaved table layout."""
    if not isinstance(inputs, dict) or "grid_thw" not in inputs:
        ids = inputs["input_ids"] if isinstance(inputs, dict) else inputs
        return llama.rope_tables(cfg, ids.shape[1])
    ids = np.asarray(inputs["input_ids"])
    pos = qwen2vl.get_mrope_positions(ids, inputs["grid_thw"], cfg)
    if shared:
        if not (pos == pos[:, :1]).all():
            raise ValueError(
                "qwen3vlmoe calibration batches must share one token "
                "layout per batch (same image grid + prompt shape)")
        cos, sin = mrope_tables_interleaved(cfg, pos[:, :1])
        return cos[0], sin[0]
    return mrope_tables_interleaved(cfg, pos)


# ------------------------------------------------------------- embed/chain
def _vision_outputs(params, inputs, cfg):
    ids = inputs["input_ids"]
    pixels = inputs.get("pixel_values")
    if pixels is None:
        return None, None, ids
    feats, deepstack = vit_fwd(params["visual"], pixels,
                               inputs["grid_thw"], cfg)
    return feats, deepstack, ids


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, Any]],
              cfg: Qwen3VLMoeConfig) -> jax.Array:
    if not isinstance(inputs, dict):
        return llama.embed_fwd(params, inputs, cfg)
    feats, _, ids = _vision_outputs(params, inputs, cfg)
    x = llama.embed_fwd(params, ids, cfg)
    if feats is None:
        return x
    B = ids.shape[0]
    per_row = feats.shape[0] // B
    feats = feats.reshape(B, per_row, -1)
    is_img = ids == cfg.image_token_id
    patch_idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, per_row - 1)
    gathered = jnp.take_along_axis(feats, patch_idx[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered.astype(x.dtype), x)


def chain_extras(params: Dict[str, Any], inputs,
                 cfg: Qwen3VLMoeConfig) -> Dict[int, jax.Array]:
    """Deepstack injections: {layer_idx: (B, S, H) to ADD to the hidden
    states after that decoder layer} — zeros off image positions.  The
    orchestrator applies these to BOTH calibration chains after
    advancing each block (and ``model_fwd`` applies them identically),
    so per-block tuning losses are untouched by the constant shift."""
    if not isinstance(inputs, dict):
        return {}
    feats, deepstack, ids = _vision_outputs(params, inputs, cfg)
    if feats is None:
        return {}
    B = ids.shape[0]
    is_img = ids == cfg.image_token_id
    patch_idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                         feats.shape[0] // B - 1)
    out = {}
    for j, emb in enumerate(deepstack):
        per_row = emb.shape[0] // B
        e = emb.reshape(B, per_row, -1)
        g = jnp.take_along_axis(e, patch_idx[..., None], axis=1)
        out[j] = jnp.where(is_img[..., None], g, 0.0).astype(cfg.dtype)
    return out


def model_fwd(params: Dict[str, Any], inputs,
              cfg: Qwen3VLMoeConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    cos, sin = rope_tables_for_inputs(cfg, inputs)
    extras = chain_extras(params, inputs, cfg)
    for li, b in enumerate(params["blocks"]):
        x = mixtral.block_fwd(b, x, cos, sin, cfg)
        if li in extras:
            x = x + extras[li]
    return llama.final_fwd(params, x, cfg)
