"""GLM-4.5V (Glm4vMoe): RMSNorm ViT with bicubic-resampled learned
positions over the GLM-4.5 MoE decoder with chunked m-rope.

Role of the reference's glm_image template registration
(``compressors/mllm/template.py:124``) and GLM multimodal block getters
(``special_model_handler.py``); modeling mirrors HF
``Glm4vMoeForConditionalGeneration``.  What this family adds over the
existing zoo:

* vision tower: conv3d patch embed + POST-CONV LayerNorm, RMSNorm
  pre-norm blocks (bias'd fused qkv, bias-free proj), SwiGLU vision
  MLP, qwen2vl-style 2-D rotary;
* learned position table resampled per grid by BICUBIC grid-sample
  (torch ``F.grid_sample(mode="bicubic", align_corners=False,
  padding_mode="border")`` semantics) — grids are static python
  metadata, so the resampling is a host-precomputed (N, G²) mixing
  matrix applied to the table inside the trace;
* downsample: stride-m conv2d over each m x m merge block into
  ``out_hidden_size``, then a GLM merger (proj → LN → GELU → SwiGLU);
* decoder: ``glm4moe.block_fwd`` unchanged (partial rotary, sigmoid
  router + correction bias, shared expert) driven by CHUNKED m-rope
  tables over the PARTIAL rotary width (qwen2vl section mixing at
  rd = partial_rotary_factor · hd).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import glm4moe, llama, qwen2vl
from .llama import rms_norm
from .qwen2vl import _image_mask, _layer_norm, _vision_pos_ids

__all__ = ["Glm4vMoeConfig", "init_params", "embed_fwd", "model_fwd",
           "rope_tables", "rope_tables_for_inputs", "block_linear_names",
           "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Glm4vMoeConfig(glm4moe.Glm4MoeConfig):
    mrope_section: Tuple[int, int, int] = (8, 12, 12)   # sums to rd/2
    image_token_id: int = 151363
    # --- vision tower (HF Glm4vMoeVisionConfig) ---
    v_embed_dim: int = 1536
    v_layers: int = 24
    v_heads: int = 12
    v_intermediate: int = 13696          # unused by vision mlp (HF quirk)
    out_hidden_size: int = 4096
    v_image_size: int = 336
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    v_rope_theta: float = 10000.0
    v_rms_eps: float = 1e-5
    v_attention_bias: bool = True

    @property
    def patch_dim(self) -> int:
        return 3 * self.temporal_patch_size * self.patch_size ** 2

    @property
    def v_grid(self) -> int:
        return self.v_image_size // self.patch_size


CONFIG_PRESETS: Dict[str, Glm4vMoeConfig] = {
    "tiny-glm4vmoe": Glm4vMoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        qk_norm=False, attn_bias=True,
        partial_rotary_factor=0.5, rope_theta=1e4,
        n_routed_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=48, n_shared_experts=1, first_k_dense=1,
        routed_scaling_factor=1.0, norm_topk_prob=True,
        mrope_section=(2, 1, 1),         # sums to rd/2 = 4
        image_token_id=7, dtype=jnp.float32,
        v_embed_dim=32, v_layers=2, v_heads=2, out_hidden_size=64,
        v_image_size=32, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2),
}


def block_linear_names(cfg: Glm4vMoeConfig) -> Tuple[str, ...]:
    return glm4moe.block_linear_names(cfg)


def init_params(cfg: Glm4vMoeConfig, key: jax.Array) -> Dict[str, Any]:
    params = glm4moe.init_params(cfg, key)
    vk = jax.random.split(jax.random.fold_in(key, 277), cfg.v_layers + 8)
    D, O = cfg.v_embed_dim, cfg.out_hidden_size
    n = lambda k, s: jax.random.normal(k, s, cfg.dtype) * 0.02
    z = lambda s: jnp.zeros(s, cfg.dtype)
    o = lambda s: jnp.ones(s, cfg.dtype)
    blocks: List[Dict[str, jax.Array]] = []
    for li in range(cfg.v_layers):
        bk = jax.random.split(vk[li], 5)
        blocks.append({
            "ln1": o((D,)),                 # RMSNorm weights
            "ln2": o((D,)),
            "qkv": n(bk[0], (3 * D, D)),
            **({"qkv_b": z((3 * D,))} if cfg.v_attention_bias else {}),
            "proj": n(bk[1], (D, D)),
            "gate_proj": n(bk[2], (O, D)),  # vision mlp width = out_hidden
            "up_proj": n(bk[3], (O, D)),
            "down_proj": n(bk[4], (D, O)),
        })
    params["visual"] = {
        "patch_embed": n(vk[-8], (D, cfg.patch_dim)),
        "patch_embed_b": z((D,)),
        "post_conv_ln_g": o((D,)),       # RMSNorm
        "pos_embed": n(vk[-7], (cfg.v_grid ** 2, D)),
        "blocks": blocks,
        "post_ln_g": o((D,)),            # RMSNorm
        # downsample conv2d (O, D, m, m) stride m over merge blocks
        "downsample": n(vk[-6], (O, D, cfg.spatial_merge_size,
                                 cfg.spatial_merge_size)),
        "downsample_b": z((O,)),
        "merger": {
            "proj": n(vk[-5], (O, O)),
            "ln_g": o((O,)), "ln_b": z((O,)),
            "gate_proj": n(vk[-4], (cfg.intermediate_size, O)),
            "up_proj": n(vk[-3], (cfg.intermediate_size, O)),
            "down_proj": n(vk[-2], (O, cfg.intermediate_size)),
        },
    }
    return params


# ------------------------------------------------- bicubic pos resample
def _cubic_w(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """4-tap Keys cubic convolution weights for fractional offset t
    (torch grid_sample bicubic convention)."""
    s = np.stack([t + 1.0, t, 1.0 - t, 2.0 - t])        # distances >= 0
    w = np.where(
        s <= 1.0, (a + 2.0) * s ** 3 - (a + 3.0) * s ** 2 + 1.0,
        a * s ** 3 - 5.0 * a * s ** 2 + 8.0 * a * s - 4.0 * a)
    return w                                            # (4, ...)


def _bicubic_mix(cfg: Glm4vMoeConfig,
                 grid_thw: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    """(N, G²) mixing matrix: row p holds the 16 bicubic taps that
    resample the learned (G, G) table at patch p's normalized position
    (HF ``Glm4vMoeVisionEmbeddings.forward``: align_corners=False,
    border padding)."""
    G = cfg.v_grid
    pos = _vision_pos_ids(grid_thw, cfg.spatial_merge_size)   # (N, 2)
    rows = []
    idx = 0
    for t, h, w in grid_thw:
        n_img = t * h * w
        p = pos[idx:idx + n_img]
        idx += n_img
        # source coords in table space (align_corners=False)
        sy = (p[:, 0] + 0.5) / h * G - 0.5
        sx = (p[:, 1] + 0.5) / w * G - 0.5
        fy, fx = np.floor(sy), np.floor(sx)
        wy = _cubic_w(sy - fy)                         # (4, N)
        wx = _cubic_w(sx - fx)
        M = np.zeros((n_img, G * G), np.float32)
        for i in range(4):
            yi = np.clip(fy + i - 1, 0, G - 1).astype(np.int64)
            for j in range(4):
                xi = np.clip(fx + j - 1, 0, G - 1).astype(np.int64)
                np.add.at(M, (np.arange(n_img), yi * G + xi),
                          (wy[i] * wx[j]).astype(np.float32))
        rows.append(M)
    return np.concatenate(rows, axis=0)


def vit_fwd(visual: Dict[str, Any], patches: jax.Array,
            grid_thw: Sequence[Tuple[int, int, int]],
            cfg: Glm4vMoeConfig) -> jax.Array:
    """(N, patch_dim) → (N/m², hidden) soft tokens."""
    D, nh = cfg.v_embed_dim, cfg.v_heads
    hd = D // nh
    m = cfg.spatial_merge_size
    x = jnp.einsum("ni,di->nd",
                   patches.astype(visual["patch_embed"].dtype),
                   visual["patch_embed"]) + visual["patch_embed_b"]
    x = rms_norm(x, visual["post_conv_ln_g"], cfg.v_rms_eps)
    mix = jnp.asarray(_bicubic_mix(cfg, grid_thw))
    x = x + jnp.einsum(
        "ng,gd->nd", mix,
        visual["pos_embed"].astype(jnp.float32)).astype(x.dtype)
    cos_np, sin_np = qwen2vl._vision_rope(cfg, grid_thw)
    cos = jnp.asarray(cos_np)[:, None, :]
    sin = jnp.asarray(sin_np)[:, None, :]
    mask_np = _image_mask(grid_thw)
    mask = None if mask_np is None else jnp.asarray(mask_np)
    N = x.shape[0]
    for blk in visual["blocks"]:
        h = rms_norm(x, blk["ln1"], cfg.v_rms_eps)
        qkv = jnp.einsum("nd,od->no", h, blk["qkv"])
        if "qkv_b" in blk:
            qkv = qkv + blk["qkv_b"]
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
        x = x + jnp.einsum("nd,od->no", a, blk["proj"])
        h = rms_norm(x, blk["ln2"], cfg.v_rms_eps)
        gate = jax.nn.silu(jnp.einsum("nd,od->no", h, blk["gate_proj"]))
        up = jnp.einsum("nd,od->no", h, blk["up_proj"])
        x = x + jnp.einsum("no,do->nd", gate * up, blk["down_proj"])
    x = rms_norm(x, visual["post_ln_g"], cfg.v_rms_eps)
    # downsample: merge-block-major stream → (blocks, m, m, D) → conv
    x = x.reshape(-1, m, m, D).transpose(0, 3, 1, 2)    # (B', D, m, m)
    y = jax.lax.conv_general_dilated(
        x, visual["downsample"], window_strides=(m, m), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = y.reshape(y.shape[0], -1) + visual["downsample_b"]
    mg = visual["merger"]
    y = jnp.einsum("no,po->np", y, mg["proj"])
    y = jax.nn.gelu(_layer_norm(y, mg["ln_g"], mg["ln_b"], eps=1e-5),
                    approximate=False)
    gate = jax.nn.silu(jnp.einsum("np,ip->ni", y, mg["gate_proj"]))
    up = jnp.einsum("np,ip->ni", y, mg["up_proj"])
    return jnp.einsum("ni,pi->np", gate * up, mg["down_proj"])


# ------------------------------------------------------------------ rope
def mrope_tables_partial(cfg: Glm4vMoeConfig, positions: np.ndarray
                         ) -> Tuple[jax.Array, jax.Array]:
    """(3, B, S) → (B, S, rd) section-mixed tables over the PARTIAL
    rotary width rd = partial_rotary_factor · hd (GLM's
    apply_multimodal_rotary_pos_emb ropes only the leading rd dims)."""
    rd = int(cfg.hd * cfg.partial_rotary_factor)
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, rd, 2) / rd))
    freqs = positions[..., None].astype(np.float32) * inv  # (3,B,S,rd/2)
    emb = np.concatenate([freqs, freqs], axis=-1)          # (3,B,S,rd)
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


def rope_tables(cfg: Glm4vMoeConfig, seqlen: int,
                positions: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    return llama.rope_tables(cfg, seqlen, positions=positions)


def rope_tables_for_inputs(cfg: Glm4vMoeConfig, inputs,
                           shared: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    if not isinstance(inputs, dict) or "grid_thw" not in inputs:
        ids = inputs["input_ids"] if isinstance(inputs, dict) else inputs
        return llama.rope_tables(cfg, ids.shape[1])
    ids = np.asarray(inputs["input_ids"])
    pos = qwen2vl.get_mrope_positions(ids, inputs["grid_thw"], cfg)
    if shared:
        if not (pos == pos[:, :1]).all():
            raise ValueError(
                "glm4vmoe calibration batches must share one token "
                "layout per batch")
        cos, sin = mrope_tables_partial(cfg, pos[:, :1])
        return cos[0], sin[0]
    return mrope_tables_partial(cfg, pos)


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, Any]],
              cfg: Glm4vMoeConfig) -> jax.Array:
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
              cfg: Glm4vMoeConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    cos, sin = rope_tables_for_inputs(cfg, inputs)
    for b in params["blocks"]:
        x = glm4moe.block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
