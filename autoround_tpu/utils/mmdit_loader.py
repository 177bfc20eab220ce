"""SD3/Flux-class MMDiT checkpoint loader: diffusers safetensors layout
→ :mod:`autoround_tpu.models.mmdit` params.

Role of the reference's diffusion load path (``DiffusionMixin``
``compressors/diffusion_mixin.py:32`` loads a diffusers pipeline and
quantizes its transformer): here the diffusers
``SD3Transformer2DModel`` component directory (``config.json`` +
``diffusion_pytorch_model*.safetensors``) maps by key into the
functional MMDiT pytree, after which the normal quantize → serve →
regenerate pipeline applies (see ``scripts/e2e_mmdit.py``).

Key mapping (diffusers → ours); orderings follow the diffusers module
definitions and cannot be cross-validated in this container (weights
are egress-bound) — the synthetic-layout roundtrip test
(`tests/test_mmdit_loader.py`) fabricates a checkpoint with these key
names from a native pytree and asserts load-back identity:

  pos_embed.proj.{weight (H,C,P,P) → (H, P·P·C), bias}  → patch_embed
  pos_embed.pos_embed (1, M², H)   → pos_embed (center-crop g×g grid)
  context_embedder.{weight,bias}   → txt_embed
  time_text_embed.timestep_embedder.linear_{1,2} → t_mlp1/t_mlp2
    (t_embed_dim = linear_1 input dim, diffusers uses 256)
  time_text_embed.text_embedder.linear_{1,2} → pool_mlp/pool_mlp2
  transformer_blocks.N.norm1.linear          → ada (+bias)
    chunk order (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
    gate_mlp) == our (sh1, sc1, g1, sh2, sc2, g2)
  transformer_blocks.N.norm1_context.linear  → txt_ada (+bias)
    (context_pre_only last block: the 2H continuous norm maps to
    (tsh1, tsc1) with zero gates/MLP mods; txt outputs of that block
    are discarded by final_fwd, and zeroed add_q rows only affect the
    discarded text-stream outputs)
  transformer_blocks.N.attn.to_{q,k,v}       → qkv (concat, +_b)
  transformer_blocks.N.attn.add_{q,k,v}_proj → txt_qkv (concat, +_b)
  transformer_blocks.N.attn.norm_{q,k}.weight        → q_norm/k_norm
  transformer_blocks.N.attn.norm_added_{q,k}.weight  → txt_{q,k}_norm
  transformer_blocks.N.attn.to_out.0         → proj (+_b)
  transformer_blocks.N.attn.to_add_out       → txt_proj (+_b)
  transformer_blocks.N.ff.net.0.proj / ff.net.2       → fc1 / fc2 (+_b)
  transformer_blocks.N.ff_context.net.0.proj / .net.2 → txt_fc1/2 (+_b)
  norm_out.linear (2H)             → final_ada — diffusers
    AdaLayerNormContinuous chunks (scale, shift); ours splits
    (shift, scale) → halves swapped at load
  proj_out                         → final_linear (+bias)
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.mmdit import MMDiTConfig
from .logger import logger

__all__ = ["load_mmdit_checkpoint"]


def _load_tensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    assert files, f"no safetensors under {path}"
    flat: Dict[str, np.ndarray] = {}
    for f in files:
        flat.update(load_file(f))
    return flat


def _cfg_from_json(path: str) -> MMDiTConfig:
    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    heads = c["num_attention_heads"]
    H = heads * c["attention_head_dim"]
    # diffusers stores the LATENT sample size; image_size here is the
    # latent spatial extent
    return MMDiTConfig(
        vocab_size=1,
        hidden_size=H,
        intermediate_size=4 * H,          # SD3 MLP ratio 4
        num_layers=c["num_layers"],
        num_heads=heads, num_kv_heads=heads,
        dtype=jnp.bfloat16,
        image_size=c.get("sample_size", 32),
        patch_size=c.get("patch_size", 2),
        in_channels=c.get("in_channels", 16),
        text_len=77,
        text_dim=c.get("joint_attention_dim", 4096),
        pooled_dim=c.get("pooled_projection_dim", 2048),
        qk_norm=c.get("qk_norm") is not None,
        t_embed_dim=256)


def _crop_pos_embed(pe: np.ndarray, g: int) -> np.ndarray:
    """(1, M*M, H) stored grid → centered (g*g, H) crop (diffusers
    ``cropped_pos_embed``)."""
    pe = pe[0]
    M = int(round(np.sqrt(pe.shape[0])))
    grid = pe.reshape(M, M, -1)
    o = (M - g) // 2
    return grid[o:o + g, o:o + g].reshape(g * g, -1)


def load_mmdit_checkpoint(path: str) -> Tuple[Dict[str, Any], MMDiTConfig]:
    """Load a diffusers SD3-transformer component directory."""
    import dataclasses
    cfg = _cfg_from_json(path)
    flat = _load_tensors(path)
    # MLP width from the actual ff weight, not the 4x convention
    cfg = dataclasses.replace(
        cfg, intermediate_size=int(
            flat["transformer_blocks.0.ff.net.0.proj.weight"].shape[0]))
    H = cfg.hidden_size
    g = cfg.image_size // cfg.patch_size
    dt = cfg.dtype

    def t(key, transpose=False):
        a = flat[key]
        return jnp.asarray(a.T if transpose else a, dt)

    def maybe(key):
        return jnp.asarray(flat[key], dt) if key in flat else None

    params: Dict[str, Any] = {}
    pw = flat["pos_embed.proj.weight"]               # (H, C, P, P)
    params["patch_embed"] = jnp.asarray(
        pw.transpose(0, 2, 3, 1).reshape(H, -1), dt)  # (H, P·P·C)
    if "pos_embed.proj.bias" in flat:
        params["patch_embed_bias"] = t("pos_embed.proj.bias")
    params["pos_embed"] = jnp.asarray(
        _crop_pos_embed(flat["pos_embed.pos_embed"], g), dt)
    params["txt_embed"] = t("context_embedder.weight")
    b = maybe("context_embedder.bias")
    if b is not None:
        params["txt_embed_bias"] = b
    tte = "time_text_embed"
    params["t_mlp1"] = t(f"{tte}.timestep_embedder.linear_1.weight")
    params["t_mlp2"] = t(f"{tte}.timestep_embedder.linear_2.weight")
    for ours, theirs in (("t_mlp1_bias", "timestep_embedder.linear_1"),
                         ("t_mlp2_bias", "timestep_embedder.linear_2")):
        b = maybe(f"{tte}.{theirs}.bias")
        if b is not None:
            params[ours] = b
    params["pool_mlp"] = t(f"{tte}.text_embedder.linear_1.weight")
    params["pool_mlp2"] = t(f"{tte}.text_embedder.linear_2.weight")
    for ours, theirs in (("pool_mlp_bias", "text_embedder.linear_1"),
                         ("pool_mlp2_bias", "text_embedder.linear_2")):
        b = maybe(f"{tte}.{theirs}.bias")
        if b is not None:
            params[ours] = b

    blocks = []
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        blk: Dict[str, Any] = {}
        blk["ada"] = t(f"{p}.norm1.linear.weight")
        blk["ada_bias"] = (maybe(f"{p}.norm1.linear.bias")
                           if f"{p}.norm1.linear.bias" in flat
                           else jnp.zeros((6 * H,), dt))
        pre_only = f"{p}.attn.to_add_out.weight" not in flat
        ctx_w = flat[f"{p}.norm1_context.linear.weight"]
        ctx_b = flat.get(f"{p}.norm1_context.linear.bias",
                         np.zeros(ctx_w.shape[0], np.float32))
        if pre_only and ctx_w.shape[0] == 2 * H:
            # continuous norm: (scale, shift) only → zero gates/MLP mods
            w6 = np.zeros((6 * H, H), np.float32)
            b6 = np.zeros((6 * H,), np.float32)
            # ours: (sh1, sc1, g1, sh2, sc2, g2); theirs: (scale, shift)
            w6[0:H] = ctx_w[H:2 * H]
            b6[0:H] = ctx_b[H:2 * H]
            w6[H:2 * H] = ctx_w[0:H]
            b6[H:2 * H] = ctx_b[0:H]
            blk["txt_ada"] = jnp.asarray(w6, dt)
            blk["txt_ada_bias"] = jnp.asarray(b6, dt)
        else:
            blk["txt_ada"] = jnp.asarray(ctx_w, dt)
            blk["txt_ada_bias"] = jnp.asarray(ctx_b, dt)

        def cat3(prefix, names):
            ws = [flat[f"{prefix}.{n}.weight"] for n in names]
            return jnp.asarray(np.concatenate(ws, axis=0), dt)

        def cat3b(prefix, names):
            if f"{prefix}.{names[1]}.bias" not in flat:
                return None
            bs = [flat.get(f"{prefix}.{n}.bias",
                           np.zeros(H, np.float32)) for n in names]
            return jnp.asarray(np.concatenate(bs, axis=0), dt)

        blk["qkv"] = cat3(f"{p}.attn", ("to_q", "to_k", "to_v"))
        bb = cat3b(f"{p}.attn", ("to_q", "to_k", "to_v"))
        if bb is not None:
            blk["qkv_b"] = bb
        if pre_only and f"{p}.attn.add_q_proj.weight" not in flat:
            # context provides K/V only in the last block; zero q rows
            # touch only the (discarded) text-stream outputs
            kq = np.zeros_like(flat[f"{p}.attn.add_k_proj.weight"])
            tq = jnp.asarray(np.concatenate(
                [kq, flat[f"{p}.attn.add_k_proj.weight"],
                 flat[f"{p}.attn.add_v_proj.weight"]], axis=0), dt)
            blk["txt_qkv"] = tq
        else:
            blk["txt_qkv"] = cat3(f"{p}.attn",
                                  ("add_q_proj", "add_k_proj",
                                   "add_v_proj"))
            bb = cat3b(f"{p}.attn",
                       ("add_q_proj", "add_k_proj", "add_v_proj"))
            if bb is not None:
                blk["txt_qkv_b"] = bb
        if cfg.qk_norm:
            hd = H // cfg.num_heads
            blk["q_norm"] = (maybe(f"{p}.attn.norm_q.weight")
                             if f"{p}.attn.norm_q.weight" in flat
                             else jnp.ones((hd,), dt))
            blk["k_norm"] = (maybe(f"{p}.attn.norm_k.weight")
                             if f"{p}.attn.norm_k.weight" in flat
                             else jnp.ones((hd,), dt))
            blk["txt_q_norm"] = (maybe(f"{p}.attn.norm_added_q.weight")
                                 if f"{p}.attn.norm_added_q.weight"
                                 in flat else jnp.ones((hd,), dt))
            blk["txt_k_norm"] = (maybe(f"{p}.attn.norm_added_k.weight")
                                 if f"{p}.attn.norm_added_k.weight"
                                 in flat else jnp.ones((hd,), dt))
        blk["proj"] = t(f"{p}.attn.to_out.0.weight")
        b = maybe(f"{p}.attn.to_out.0.bias")
        if b is not None:
            blk["proj_b"] = b
        if pre_only:
            blk["txt_proj"] = jnp.zeros((H, H), dt)
        else:
            blk["txt_proj"] = t(f"{p}.attn.to_add_out.weight")
            b = maybe(f"{p}.attn.to_add_out.bias")
            if b is not None:
                blk["txt_proj_b"] = b
        blk["fc1"] = t(f"{p}.ff.net.0.proj.weight")
        blk["fc2"] = t(f"{p}.ff.net.2.weight")
        for ours, theirs in (("fc1_b", "ff.net.0.proj"),
                             ("fc2_b", "ff.net.2")):
            b = maybe(f"{p}.{theirs}.bias")
            if b is not None:
                blk[ours] = b
        if pre_only:
            I = cfg.intermediate_size
            blk["txt_fc1"] = jnp.zeros((I, H), dt)
            blk["txt_fc2"] = jnp.zeros((H, I), dt)
        else:
            blk["txt_fc1"] = t(f"{p}.ff_context.net.0.proj.weight")
            blk["txt_fc2"] = t(f"{p}.ff_context.net.2.weight")
            for ours, theirs in (("txt_fc1_b", "ff_context.net.0.proj"),
                                 ("txt_fc2_b", "ff_context.net.2")):
                b = maybe(f"{p}.{theirs}.bias")
                if b is not None:
                    blk[ours] = b
        blocks.append(blk)
    params["blocks"] = blocks

    # final continuous norm: diffusers chunks (scale, shift); our
    # final_fwd splits (shift, scale) — swap halves
    fw = flat["norm_out.linear.weight"]
    fb = flat.get("norm_out.linear.bias", np.zeros(2 * H, np.float32))
    params["final_ada"] = jnp.asarray(
        np.concatenate([fw[H:2 * H], fw[0:H]], axis=0), dt)
    params["final_ada_bias"] = jnp.asarray(
        np.concatenate([fb[H:2 * H], fb[0:H]], axis=0), dt)
    params["final_linear"] = t("proj_out.weight")
    b = maybe("proj_out.bias")
    if b is not None:
        params["final_linear_bias"] = b

    n_bias = sum(1 for blk in blocks for k in blk if k.endswith("_b"))
    logger.info("mmdit loader: %d blocks, H=%d, %d attention/MLP biases "
                "mapped", cfg.num_layers, H, n_bias)
    return params, cfg
