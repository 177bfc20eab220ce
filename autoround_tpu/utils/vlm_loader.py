"""Real llava-hf VLM checkpoint loading + image processing.

Role of the reference's MLLM plumbing (``compressors/mllm/processor.py``
BasicProcessor, ``mllm/template.py`` templates, and ``utils/model.py``
``mllm_load_model``): map a HuggingFace ``LlavaForConditionalGeneration``
checkpoint (CLIP ViT tower + 2-layer projector + llama LM) into the
functional pytree of ``models.llava``, preprocess images the CLIP way,
and expand ``<image>`` placeholders into the per-patch image token runs
the embedding splice consumes.

Key layout handled (both the classic ``language_model.model.*`` and the
newer ``model.language_model.*`` prefixes):

  vision_tower.vision_model.embeddings.{class_embedding,
      patch_embedding.weight, position_embedding.weight}
  vision_tower.vision_model.pre_layrnorm.{weight,bias}
  vision_tower.vision_model.encoder.layers.N.{self_attn.{q,k,v,out}_proj,
      layer_norm1, layer_norm2, mlp.fc1, mlp.fc2}.{weight,bias}
  vision_tower.vision_model.post_layernorm.{weight,bias}
  multi_modal_projector.linear_{1,2}.{weight,bias}
  language_model.model.layers.N.* (llama keys)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.llava import LlavaConfig
from .hf_loader import _BLOCK_MAP, config_from_hf
from .logger import logger

__all__ = ["load_llava_checkpoint", "save_llava_checkpoint",
           "preprocess_images", "expand_image_prompt"]

# CLIP normalization constants (openai/clip-vit preprocessing)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _llava_config(hf: Dict[str, Any], dtype) -> LlavaConfig:
    tc = dict(hf.get("text_config", {}))
    tc.setdefault("model_type", "llama")
    tc.setdefault("vocab_size", hf.get("vocab_size", 32000))
    base = config_from_hf(tc, dtype)
    vc = hf.get("vision_config", {})
    fields = {f.name: getattr(base, f.name)
              for f in dataclasses.fields(type(base))}
    return LlavaConfig(
        **fields,
        image_size=vc.get("image_size", 336),
        patch_size=vc.get("patch_size", 14),
        v_hidden=vc.get("hidden_size", 1024),
        v_layers=vc.get("num_hidden_layers", 24),
        v_heads=vc.get("num_attention_heads", 16),
        image_token_id=hf.get("image_token_index", 32000),
        v_class_token=True,
        v_quick_gelu=vc.get("hidden_act", "quick_gelu") == "quick_gelu",
        v_feature_layer=hf.get("vision_feature_layer", -2),
    )


def _strip_lm(key: str) -> Optional[str]:
    """Normalize language-model key prefixes to llama-checkpoint form."""
    for pre, rep in (("language_model.model.", "model."),
                     ("model.language_model.", "model."),
                     ("language_model.lm_head.", "lm_head."),
                     ("lm_head.", "lm_head.")):
        if key.startswith(pre):
            return rep + key[len(pre):]
    return None


def load_llava_checkpoint(path: str, dtype=None
                          ) -> Tuple[Dict[str, Any], LlavaConfig]:
    dtype = dtype or jnp.bfloat16
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = _llava_config(hf_cfg, dtype)

    from .hf_loader import _iter_shards
    blocks = [dict() for _ in range(cfg.num_layers)]
    vt: Dict[str, Any] = {"blocks": [dict() for _ in range(cfg.v_layers)]}
    mm: Dict[str, Any] = {}
    params: Dict[str, Any] = {"blocks": blocks, "vision_tower": vt,
                              "mm_projector": mm}

    vln = {"layer_norm1.weight": "ln1_g", "layer_norm1.bias": "ln1_b",
           "layer_norm2.weight": "ln2_g", "layer_norm2.bias": "ln2_b",
           "mlp.fc1.weight": "fc1", "mlp.fc1.bias": "fc1_b",
           "mlp.fc2.weight": "fc2", "mlp.fc2.bias": "fc2_b",
           "self_attn.out_proj.weight": "proj",
           "self_attn.out_proj.bias": "proj_b"}
    qkv_parts: Dict[int, Dict[str, np.ndarray]] = {}

    n = 0
    for key, tensor in _iter_shards(path):
        arr = jnp.asarray(tensor).astype(dtype)
        lm_key = _strip_lm(key)
        if lm_key is not None:
            if lm_key == "model.embed_tokens.weight":
                params["embed_tokens"] = arr
            elif lm_key == "model.norm.weight":
                params["norm"] = arr
            elif lm_key == "lm_head.weight":
                params["lm_head"] = arr
            elif lm_key.startswith("model.layers."):
                rest = lm_key[len("model.layers."):]
                li, sub = rest.split(".", 1)
                if sub in _BLOCK_MAP:
                    blocks[int(li)][_BLOCK_MAP[sub]] = arr
            n += 1
            continue
        vkey = key
        for pre in ("model.vision_tower.vision_model.",
                    "vision_tower.vision_model."):
            if vkey.startswith(pre):
                vkey = vkey[len(pre):]
                break
        else:
            if key.startswith(("multi_modal_projector.",
                               "model.multi_modal_projector.")):
                sub = key.split("multi_modal_projector.", 1)[1]
                name = {"linear_1.weight": "fc1", "linear_1.bias": "fc1_b",
                        "linear_2.weight": "fc2", "linear_2.bias": "fc2_b"
                        }.get(sub)
                if name:
                    mm[name] = arr
                    n += 1
            continue
        if vkey == "embeddings.class_embedding":
            vt["class_embed"] = arr.reshape(-1)
        elif vkey == "embeddings.patch_embedding.weight":
            # conv (D, 3, P, P) -> (D, P*P*3) matching the (P, P, 3)
            # row-major patch flattening of _vit_fwd
            w = np.asarray(tensor)
            vt["patch_embed"] = jnp.asarray(
                w.transpose(0, 2, 3, 1).reshape(w.shape[0], -1)).astype(dtype)
        elif vkey == "embeddings.position_embedding.weight":
            vt["pos_embed"] = arr
        elif vkey == "pre_layrnorm.weight":
            vt["pre_ln_g"] = arr
        elif vkey == "pre_layrnorm.bias":
            vt["pre_ln_b"] = arr
        elif vkey == "post_layernorm.weight":
            vt["ln_f_g"] = arr
        elif vkey == "post_layernorm.bias":
            vt["ln_f_b"] = arr
        elif vkey.startswith("encoder.layers."):
            rest = vkey[len("encoder.layers."):]
            li, sub = rest.split(".", 1)
            li = int(li)
            if sub in vln:
                vt["blocks"][li][vln[sub]] = arr
            else:
                # q/k/v projections fuse row-wise into qkv/qkv_b
                for pn in ("q_proj", "k_proj", "v_proj"):
                    for suffix, tag in ((".weight", "w"), (".bias", "b")):
                        if sub == f"self_attn.{pn}{suffix}":
                            qkv_parts.setdefault(li, {})[f"{pn}.{tag}"] = \
                                np.asarray(tensor)
        else:
            logger.debug("skipping unmapped vlm tensor %s", key)
            continue
        n += 1

    for li, parts in qkv_parts.items():
        if all(f"{p}.w" in parts for p in ("q_proj", "k_proj", "v_proj")):
            vt["blocks"][li]["qkv"] = jnp.asarray(np.concatenate(
                [parts["q_proj.w"], parts["k_proj.w"], parts["v_proj.w"]],
                axis=0)).astype(dtype)
        if all(f"{p}.b" in parts for p in ("q_proj", "k_proj", "v_proj")):
            vt["blocks"][li]["qkv_b"] = jnp.asarray(np.concatenate(
                [parts["q_proj.b"], parts["k_proj.b"], parts["v_proj.b"]]
            )).astype(dtype)

    if cfg.tie_embeddings:
        params.pop("lm_head", None)
    logger.info("loaded llava checkpoint: %d tensors, %d LM blocks, "
                "%d ViT blocks", n, cfg.num_layers, cfg.v_layers)
    return params, cfg


def save_llava_checkpoint(params: Dict[str, Any], cfg: LlavaConfig,
                          path: str) -> str:
    """Write params in llava-hf key layout (fixture fabrication + fake
    export)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    inv_block = {v: k for k, v in _BLOCK_MAP.items()}
    t: Dict[str, np.ndarray] = {}
    t["language_model.model.embed_tokens.weight"] = np.asarray(
        params["embed_tokens"])
    t["language_model.model.norm.weight"] = np.asarray(params["norm"])
    if "lm_head" in params:
        t["language_model.lm_head.weight"] = np.asarray(params["lm_head"])
    for li, b in enumerate(params["blocks"]):
        for ours, arr in b.items():
            if ours in inv_block:
                t[f"language_model.model.layers.{li}.{inv_block[ours]}"] = \
                    np.asarray(arr)
    vt = params["vision_tower"]
    vp = "vision_tower.vision_model."
    P, D = cfg.patch_size, cfg.v_hidden
    t[vp + "embeddings.patch_embedding.weight"] = np.ascontiguousarray(
        np.asarray(vt["patch_embed"]).reshape(D, P, P, 3)
        .transpose(0, 3, 1, 2))
    t[vp + "embeddings.position_embedding.weight"] = np.asarray(
        vt["pos_embed"])
    if "class_embed" in vt:
        t[vp + "embeddings.class_embedding"] = np.asarray(vt["class_embed"])
    if "pre_ln_g" in vt:
        t[vp + "pre_layrnorm.weight"] = np.asarray(vt["pre_ln_g"])
        t[vp + "pre_layrnorm.bias"] = np.asarray(vt["pre_ln_b"])
    t[vp + "post_layernorm.weight"] = np.asarray(vt["ln_f_g"])
    t[vp + "post_layernorm.bias"] = np.asarray(vt["ln_f_b"])
    vln = {"ln1_g": "layer_norm1.weight", "ln1_b": "layer_norm1.bias",
           "ln2_g": "layer_norm2.weight", "ln2_b": "layer_norm2.bias",
           "fc1": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
           "fc2": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias",
           "proj": "self_attn.out_proj.weight",
           "proj_b": "self_attn.out_proj.bias"}
    for li, blk in enumerate(vt["blocks"]):
        bp = vp + f"encoder.layers.{li}."
        for ours, hf in vln.items():
            if ours in blk:
                t[bp + hf] = np.asarray(blk[ours])
        qkv = np.asarray(blk["qkv"])
        qw, kw, vw = np.split(qkv, 3, axis=0)
        t[bp + "self_attn.q_proj.weight"] = qw
        t[bp + "self_attn.k_proj.weight"] = kw
        t[bp + "self_attn.v_proj.weight"] = vw
        if "qkv_b" in blk:
            qb, kb, vb = np.split(np.asarray(blk["qkv_b"]), 3)
            t[bp + "self_attn.q_proj.bias"] = qb
            t[bp + "self_attn.k_proj.bias"] = kb
            t[bp + "self_attn.v_proj.bias"] = vb
    mm = params["mm_projector"]
    t["multi_modal_projector.linear_1.weight"] = np.asarray(mm["fc1"])
    t["multi_modal_projector.linear_2.weight"] = np.asarray(mm["fc2"])
    if "fc1_b" in mm:
        t["multi_modal_projector.linear_1.bias"] = np.asarray(mm["fc1_b"])
        t["multi_modal_projector.linear_2.bias"] = np.asarray(mm["fc2_b"])
    save_file(t, os.path.join(path, "model.safetensors"))

    hf_cfg = {
        "model_type": "llava",
        "image_token_index": cfg.image_token_id,
        "vision_feature_layer": cfg.v_feature_layer,
        "vision_feature_select_strategy": "default",
        "text_config": {
            "model_type": "llama",
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim,
            "rope_theta": cfg.rope_theta,
            "rms_norm_eps": cfg.rms_eps,
            "tie_word_embeddings": cfg.tie_embeddings,
        },
        "vision_config": {
            "image_size": cfg.image_size,
            "patch_size": cfg.patch_size,
            "hidden_size": cfg.v_hidden,
            "num_hidden_layers": cfg.v_layers,
            "num_attention_heads": cfg.v_heads,
            "hidden_act": "quick_gelu" if cfg.v_quick_gelu else "gelu",
        },
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return path


def preprocess_images(images: List[Any], image_size: int) -> np.ndarray:
    """CLIP preprocessing: resize shortest edge → center crop → scale to
    [0,1] → normalize with the CLIP mean/std.  Accepts PIL images or
    (H, W, 3) uint8/float arrays; returns (B, S, S, 3) float32 (the
    channels-last layout ``_vit_fwd`` patches)."""
    out = np.empty((len(images), image_size, image_size, 3), np.float32)
    for i, img in enumerate(images):
        if not hasattr(img, "convert"):         # numpy -> PIL
            from PIL import Image
            a = np.asarray(img)
            if a.dtype != np.uint8:
                a = np.clip(a * 255.0 if a.max() <= 1.0 else a,
                            0, 255).astype(np.uint8)
            img = Image.fromarray(a)
        img = img.convert("RGB")
        w, h = img.size
        scale = image_size / min(w, h)
        img = img.resize((max(image_size, round(w * scale)),
                          max(image_size, round(h * scale))))
        w, h = img.size
        left, top = (w - image_size) // 2, (h - image_size) // 2
        img = img.crop((left, top, left + image_size, top + image_size))
        a = np.asarray(img, np.float32) / 255.0
        out[i] = (a - CLIP_MEAN) / CLIP_STD
    return out


def expand_image_prompt(tokenizer, text: str, cfg: LlavaConfig,
                        seqlen: int, placeholder: str = "<image>"
                        ) -> np.ndarray:
    """Tokenize a prompt and expand each ``<image>`` placeholder into
    ``num_patches`` image tokens (role of the reference templates'
    ``_encode`` image splicing).  Pads/truncates to seqlen."""
    parts = text.split(placeholder)
    ids: List[int] = []
    for i, part in enumerate(parts):
        if i > 0:
            ids.extend([cfg.image_token_id] * cfg.num_patches)
        toks = tokenizer(part)
        toks = toks["input_ids"] if isinstance(toks, dict) else toks
        ids.extend(toks)
    ids = ids[:seqlen]
    ids += [0] * (seqlen - len(ids))
    return np.asarray(ids, np.int32)


# ------------------------------------------------------------- Qwen2-VL
def _qwen2vl_config(hf: Dict[str, Any], dtype) -> "Qwen2VLConfig":
    """HF Qwen2VLConfig dict → models.qwen2vl.Qwen2VLConfig."""
    from ..models.qwen2vl import Qwen2VLConfig
    vc = hf.get("vision_config", {}) or {}
    rs = hf.get("rope_scaling") or {}
    sec = tuple(rs.get("mrope_section", (16, 24, 24)))
    return Qwen2VLConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads",
                            hf["num_attention_heads"]),
        rope_theta=hf.get("rope_theta", 1000000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-6),
        tie_embeddings=hf.get("tie_word_embeddings", False),
        attn_bias=True,
        mrope_section=sec,
        image_token_id=hf.get("image_token_id", 151655),
        v_embed_dim=vc.get("embed_dim", 1280),
        v_layers=vc.get("depth", 32),
        v_heads=vc.get("num_heads", 16),
        patch_size=vc.get("patch_size", 14),
        temporal_patch_size=vc.get("temporal_patch_size", 2),
        spatial_merge_size=vc.get("spatial_merge_size", 2),
        v_mlp_ratio=float(vc.get("mlp_ratio", 4)),
        dtype=dtype)


_Q2VL_VBLOCK = {
    "norm1.weight": "ln1_g", "norm1.bias": "ln1_b",
    "norm2.weight": "ln2_g", "norm2.bias": "ln2_b",
    "attn.qkv.weight": "qkv", "attn.qkv.bias": "qkv_b",
    "attn.proj.weight": "proj", "attn.proj.bias": "proj_b",
    "mlp.fc1.weight": "fc1", "mlp.fc1.bias": "fc1_b",
    "mlp.fc2.weight": "fc2", "mlp.fc2.bias": "fc2_b",
}
_Q2VL_MERGER = {
    "ln_q.weight": "ln_q_g", "ln_q.bias": "ln_q_b",
    "mlp.0.weight": "fc1", "mlp.0.bias": "fc1_b",
    "mlp.2.weight": "fc2", "mlp.2.bias": "fc2_b",
}


_Q3VL_VBLOCK = {
    "norm1.weight": "ln1_g", "norm1.bias": "ln1_b",
    "norm2.weight": "ln2_g", "norm2.bias": "ln2_b",
    "attn.qkv.weight": "qkv", "attn.qkv.bias": "qkv_b",
    "attn.proj.weight": "proj", "attn.proj.bias": "proj_b",
    "mlp.linear_fc1.weight": "fc1", "mlp.linear_fc1.bias": "fc1_b",
    "mlp.linear_fc2.weight": "fc2", "mlp.linear_fc2.bias": "fc2_b",
}
_Q3VL_MERGER = {
    "norm.weight": "ln_g", "norm.bias": "ln_b",
    "linear_fc1.weight": "fc1", "linear_fc1.bias": "fc1_b",
    "linear_fc2.weight": "fc2", "linear_fc2.bias": "fc2_b",
}
_Q3VL_TEXT = {
    "input_layernorm.weight": "input_layernorm",
    "post_attention_layernorm.weight": "post_attention_layernorm",
    "self_attn.q_proj.weight": "q_proj",
    "self_attn.k_proj.weight": "k_proj",
    "self_attn.v_proj.weight": "v_proj",
    "self_attn.o_proj.weight": "o_proj",
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    "mlp.gate.weight": "router",
}


_Q25VL_VBLOCK = {
    "norm1.weight": "norm1", "norm2.weight": "norm2",
    "attn.qkv.weight": "qkv", "attn.qkv.bias": "qkv_b",
    "attn.proj.weight": "proj", "attn.proj.bias": "proj_b",
    "mlp.gate_proj.weight": "gate_proj", "mlp.gate_proj.bias": "gate_b",
    "mlp.up_proj.weight": "up_proj", "mlp.up_proj.bias": "up_b",
    "mlp.down_proj.weight": "down_proj", "mlp.down_proj.bias": "down_b",
}
_Q25VL_MERGER = {
    "ln_q.weight": "ln_q",
    "mlp.0.weight": "fc1", "mlp.0.bias": "fc1_b",
    "mlp.2.weight": "fc2", "mlp.2.bias": "fc2_b",
}


def qwen25vl_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """Map a flat Qwen2.5-VL state dict (``model.visual.*`` /
    ``model.language_model.*`` or classic prefixes) into the functional
    pytree of ``models.qwen25vl`` (RMSNorm ViT, bias'd SwiGLU)."""
    import jax.numpy as jnp
    dtype = dtype or cfg.dtype
    blocks = [dict() for _ in range(cfg.num_layers)]
    vblocks = [dict() for _ in range(cfg.v_layers)]
    visual: Dict[str, Any] = {"blocks": vblocks, "merger": {}}
    params: Dict[str, Any] = {"blocks": blocks, "visual": visual}
    for key, tensor in state.items():
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        lm_key = _strip_lm(key)
        if lm_key is None and key.startswith(
                ("model.layers.", "model.embed_tokens.", "model.norm.")):
            lm_key = key
        if lm_key is not None:
            if lm_key == "model.embed_tokens.weight":
                params["embed_tokens"] = arr
            elif lm_key == "model.norm.weight":
                params["norm"] = arr
            elif lm_key == "lm_head.weight":
                params["lm_head"] = arr
            elif lm_key.startswith("model.layers."):
                rest = lm_key[len("model.layers."):]
                li, sub = rest.split(".", 1)
                if sub in _BLOCK_MAP:
                    blocks[int(li)][_BLOCK_MAP[sub]] = arr
            continue
        vkey = key
        for pre in ("model.visual.", "visual."):
            if vkey.startswith(pre):
                vkey = vkey[len(pre):]
                break
        else:
            continue
        if vkey == "patch_embed.proj.weight":
            w = np.asarray(tensor)
            visual["patch_embed"] = jnp.asarray(
                w.reshape(w.shape[0], -1)).astype(dtype)
        elif vkey.startswith("blocks."):
            li, sub = vkey[len("blocks."):].split(".", 1)
            if sub in _Q25VL_VBLOCK:
                vblocks[int(li)][_Q25VL_VBLOCK[sub]] = arr
        elif vkey.startswith("merger."):
            sub = vkey[len("merger."):]
            if sub in _Q25VL_MERGER:
                visual["merger"][_Q25VL_MERGER[sub]] = arr
    if cfg.tie_embeddings:
        params.pop("lm_head", None)
    return params


def qwen3vlmoe_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """Map a flat {hf_key: array} Qwen3-VL-MoE state dict
    (``model.visual.*`` / ``model.language_model.*``, FUSED expert
    tensors ``mlp.experts.gate_up_proj`` (E, H, 2I) and ``down_proj``
    (E, I, H)) into the functional pytree of ``models.qwen3vlmoe``
    (per-expert ``experts.<e>.{w1,w3,w2}`` leaves — the unfused layout
    every expert quantizes independently under, the role of the
    reference's fused-moe replace_modules for qwen3_vl_moe)."""
    import jax.numpy as jnp
    dtype = dtype or cfg.dtype
    I = cfg.intermediate_size  # routed expert width in our MixtralConfig
    blocks = [
        {"experts": [dict() for _ in range(cfg.num_experts)]}
        for _ in range(cfg.num_layers)]
    vblocks = [dict() for _ in range(cfg.v_layers)]
    nds = len(cfg.deepstack_visual_indexes)
    visual: Dict[str, Any] = {
        "blocks": vblocks, "merger": {},
        "deepstack_mergers": [dict() for _ in range(nds)]}
    params: Dict[str, Any] = {"blocks": blocks, "visual": visual}
    for key, tensor in state.items():
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        lm_key = _strip_lm(key)
        if lm_key is not None:
            if lm_key == "model.embed_tokens.weight":
                params["embed_tokens"] = arr
            elif lm_key == "model.norm.weight":
                params["norm"] = arr
            elif lm_key == "lm_head.weight":
                params["lm_head"] = arr
            elif lm_key.startswith("model.layers."):
                rest = lm_key[len("model.layers."):]
                li, sub = rest.split(".", 1)
                b = blocks[int(li)]
                if sub in _Q3VL_TEXT:
                    b[_Q3VL_TEXT[sub]] = arr
                elif sub == "mlp.experts.gate_up_proj":
                    for e in range(cfg.num_experts):
                        b["experts"][e]["w1"] = arr[e, :, :I].T
                        b["experts"][e]["w3"] = arr[e, :, I:].T
                elif sub == "mlp.experts.down_proj":
                    for e in range(cfg.num_experts):
                        b["experts"][e]["w2"] = arr[e].T
            continue
        vkey = key
        for pre in ("model.visual.", "visual."):
            if vkey.startswith(pre):
                vkey = vkey[len(pre):]
                break
        else:
            continue
        if vkey == "patch_embed.proj.weight":
            w = np.asarray(tensor)
            visual["patch_embed"] = jnp.asarray(
                w.reshape(w.shape[0], -1)).astype(dtype)
        elif vkey == "patch_embed.proj.bias":
            visual["patch_embed_b"] = arr
        elif vkey == "pos_embed.weight":
            visual["pos_embed"] = arr
        elif vkey.startswith("blocks."):
            li, sub = vkey[len("blocks."):].split(".", 1)
            if sub in _Q3VL_VBLOCK:
                vblocks[int(li)][_Q3VL_VBLOCK[sub]] = arr
        elif vkey.startswith("merger."):
            sub = vkey[len("merger."):]
            if sub in _Q3VL_MERGER:
                visual["merger"][_Q3VL_MERGER[sub]] = arr
        elif vkey.startswith("deepstack_merger_list."):
            li, sub = vkey[len("deepstack_merger_list."):].split(".", 1)
            if sub in _Q3VL_MERGER:
                visual["deepstack_mergers"][int(li)][_Q3VL_MERGER[sub]] = arr
    if cfg.tie_embeddings:
        params.pop("lm_head", None)
    return params


def qwen2vl_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """Map a flat {hf_key: array} dict (both the classic
    ``model.layers.*``/``visual.*`` and the newer
    ``model.language_model.*``/``model.visual.*`` prefixes) into the
    functional pytree of ``models.qwen2vl``."""
    dtype = dtype or cfg.dtype
    blocks = [dict() for _ in range(cfg.num_layers)]
    vblocks = [dict() for _ in range(cfg.v_layers)]
    visual: Dict[str, Any] = {"blocks": vblocks, "merger": {}}
    params: Dict[str, Any] = {"blocks": blocks, "visual": visual}
    for key, tensor in state.items():
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        lm_key = _strip_lm(key)
        if lm_key is None and key.startswith("model.layers."):
            lm_key = key
        if lm_key is not None:
            if lm_key == "model.embed_tokens.weight":
                params["embed_tokens"] = arr
            elif lm_key == "model.norm.weight":
                params["norm"] = arr
            elif lm_key == "lm_head.weight":
                params["lm_head"] = arr
            elif lm_key.startswith("model.layers."):
                rest = lm_key[len("model.layers."):]
                li, sub = rest.split(".", 1)
                if sub in _BLOCK_MAP:
                    blocks[int(li)][_BLOCK_MAP[sub]] = arr
            continue
        vkey = key
        for pre in ("model.visual.", "visual."):
            if vkey.startswith(pre):
                vkey = vkey[len(pre):]
                break
        else:
            continue
        if vkey == "patch_embed.proj.weight":
            # conv3d (D, C, tps, ps, ps) → (D, C·tps·ps²): matches the
            # HF processor's flattened-patch feature order
            w = np.asarray(tensor)
            visual["patch_embed"] = jnp.asarray(
                w.reshape(w.shape[0], -1)).astype(dtype)
        elif vkey.startswith("blocks."):
            li, sub = vkey[len("blocks."):].split(".", 1)
            if sub in _Q2VL_VBLOCK:
                vblocks[int(li)][_Q2VL_VBLOCK[sub]] = arr
        elif vkey.startswith("merger."):
            sub = vkey[len("merger."):]
            if sub in _Q2VL_MERGER:
                visual["merger"][_Q2VL_MERGER[sub]] = arr
    if cfg.tie_embeddings:
        params.pop("lm_head", None)
    return params


def load_qwen2vl_checkpoint(path: str, dtype=None):
    """Load a HF Qwen2-VL checkpoint directory → (params, cfg)."""
    dtype = dtype or jnp.bfloat16
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = _qwen2vl_config(hf_cfg, dtype)
    from .hf_loader import _iter_shards
    state = {k: t for k, t in _iter_shards(path)}
    params = qwen2vl_params_from_state(state, cfg, dtype)
    logger.info("loaded Qwen2-VL %s: %d blocks, %d vision blocks", path,
                cfg.num_layers, cfg.v_layers)
    return params, cfg


def preprocess_qwen2vl_images(images: List[Any], cfg) -> Tuple[np.ndarray,
                                                               List[Tuple[int, int, int]]]:
    """(B images as (H, W, 3) float [0,1] arrays) → flattened patches
    (N, C·tps·ps²) + grid_thw, mirroring HF Qwen2VLImageProcessor's
    merge-block-major layout (``image_processing_qwen2_vl.py:281-295``).
    Images must be pre-sized to multiples of patch·merge."""
    ps, tps, m = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
    flat, grids = [], []
    for img in images:
        a = np.asarray(img, np.float32)
        a = (a - CLIP_MEAN) / CLIP_STD
        a = a.transpose(2, 0, 1)[None]                    # (1, C, H, W)
        a = np.repeat(a, tps, axis=0)                     # duplicate frame
        C, H, W = a.shape[1:]
        gh, gw = H // ps, W // ps
        p = a.reshape(1, tps, C, gh // m, m, ps, gw // m, m, ps)
        p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        flat.append(p.reshape(gh * gw, C * tps * ps * ps))
        grids.append((1, gh, gw))
    return np.concatenate(flat, axis=0), grids


# ------------------------------------------------------------- gemma3-vl
def _gemma3vl_config(hf: Dict[str, Any], dtype) -> "Gemma3VLConfig":
    from ..models.gemma3vl import Gemma3VLConfig
    tc = dict(hf.get("text_config", {}))
    tc.setdefault("model_type", "gemma3_text")
    base = config_from_hf(tc, dtype)
    vc = hf.get("vision_config", {})
    fields = {f.name: getattr(base, f.name)
              for f in dataclasses.fields(type(base))}
    return Gemma3VLConfig(
        **fields,
        v_hidden=vc.get("hidden_size", 1152),
        v_layers=vc.get("num_hidden_layers", 27),
        v_heads=vc.get("num_attention_heads", 16),
        v_intermediate=vc.get("intermediate_size", 4304),
        image_size=vc.get("image_size", 896),
        patch_size=vc.get("patch_size", 14),
        v_eps=vc.get("layer_norm_eps", 1e-6),
        mm_tokens_per_image=hf.get("mm_tokens_per_image", 256),
        image_token_id=hf.get("image_token_index", 262144),
    )


def gemma3vl_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """Map a flat {hf_key: array} dict of HF
    ``Gemma3ForConditionalGeneration`` into the functional pytree of
    ``models.gemma3vl`` (SigLIP tower + soft-token projector + gemma3
    decoder)."""
    dtype = dtype or cfg.dtype
    blocks = [dict() for _ in range(cfg.num_layers)]
    vt: Dict[str, Any] = {"blocks": [dict() for _ in range(cfg.v_layers)]}
    mm: Dict[str, Any] = {}
    params: Dict[str, Any] = {"blocks": blocks, "vision_tower": vt,
                              "mm_projector": mm}
    vln = {"layer_norm1.weight": "ln1_g", "layer_norm1.bias": "ln1_b",
           "layer_norm2.weight": "ln2_g", "layer_norm2.bias": "ln2_b",
           "mlp.fc1.weight": "fc1", "mlp.fc1.bias": "fc1_b",
           "mlp.fc2.weight": "fc2", "mlp.fc2.bias": "fc2_b",
           "self_attn.out_proj.weight": "proj",
           "self_attn.out_proj.bias": "proj_b"}
    qkv_parts: Dict[int, Dict[str, np.ndarray]] = {}
    for key, tensor in state.items():
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        lm_key = _strip_lm(key)
        if lm_key is None and key.startswith(("model.layers.",
                                              "model.embed_tokens.",
                                              "model.norm.")):
            lm_key = key
        if lm_key is not None:
            if lm_key == "model.embed_tokens.weight":
                params["embed_tokens"] = arr
            elif lm_key == "model.norm.weight":
                params["norm"] = arr
            elif lm_key == "lm_head.weight":
                params["lm_head"] = arr
            elif lm_key.startswith("model.layers."):
                rest = lm_key[len("model.layers."):]
                li, sub = rest.split(".", 1)
                if sub in _BLOCK_MAP:
                    blocks[int(li)][_BLOCK_MAP[sub]] = arr
            continue
        if "multi_modal_projector." in key:
            sub = key.split("multi_modal_projector.", 1)[1]
            if sub == "mm_input_projection_weight":
                mm["proj"] = arr                       # (Dv, Dt), x @ W
            elif sub == "mm_soft_emb_norm.weight":
                mm["soft_emb_norm"] = arr
            continue
        vkey = key
        for pre in ("model.vision_tower.vision_model.",
                    "vision_tower.vision_model."):
            if vkey.startswith(pre):
                vkey = vkey[len(pre):]
                break
        else:
            continue
        if vkey == "embeddings.patch_embedding.weight":
            # conv (D, 3, P, P) -> (D, P*P*3): the (P, P, 3) row-major
            # patch flattening of _siglip_fwd
            w = np.asarray(tensor)
            vt["patch_embed"] = jnp.asarray(
                w.transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
            ).astype(dtype)
        elif vkey == "embeddings.patch_embedding.bias":
            vt["patch_embed_b"] = arr
        elif vkey == "embeddings.position_embedding.weight":
            vt["pos_embed"] = arr
        elif vkey == "post_layernorm.weight":
            vt["post_ln_g"] = arr
        elif vkey == "post_layernorm.bias":
            vt["post_ln_b"] = arr
        elif vkey.startswith("encoder.layers."):
            rest = vkey[len("encoder.layers."):]
            li, sub = rest.split(".", 1)
            li = int(li)
            if sub in vln:
                vt["blocks"][li][vln[sub]] = arr
            else:
                for pn in ("q_proj", "k_proj", "v_proj"):
                    for suffix, tag in ((".weight", "w"), (".bias", "b")):
                        if sub == f"self_attn.{pn}{suffix}":
                            qkv_parts.setdefault(li, {})[f"{pn}.{tag}"] = \
                                np.asarray(tensor)
    for li, parts in qkv_parts.items():
        vt["blocks"][li]["qkv"] = jnp.asarray(np.concatenate(
            [parts["q_proj.w"], parts["k_proj.w"], parts["v_proj.w"]],
            axis=0)).astype(dtype)
        vt["blocks"][li]["qkv_b"] = jnp.asarray(np.concatenate(
            [parts["q_proj.b"], parts["k_proj.b"], parts["v_proj.b"]]
        )).astype(dtype)
    if cfg.tie_embeddings:
        params.pop("lm_head", None)
    return params


def load_gemma3vl_checkpoint(path: str, dtype=None):
    """Load a HF Gemma3 multimodal checkpoint directory → (params, cfg)."""
    dtype = dtype or jnp.bfloat16
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = _gemma3vl_config(hf_cfg, dtype)
    from .hf_loader import _iter_shards
    state = {k: t for k, t in _iter_shards(path)}
    params = gemma3vl_params_from_state(state, cfg, dtype)
    logger.info("loaded Gemma3-VL %s: %d blocks, %d vision blocks", path,
                cfg.num_layers, cfg.v_layers)
    return params, cfg


# --------------------------------------------------------------------
# Round-5 loaders: the remaining VLM/omni families (VERDICT r4 item 8).
# Each maps a flat {hf_key: tensor} state dict into the family's
# functional pytree; tested against in-container transformers
# state_dicts where the model ships (glm4v_moe, mistral3, mllama,
# qwen2_5_omni, qwen3_omni_moe) and synthetic layouts otherwise
# (DeepSeek-VL2 — transformers<5 has no VL2 modeling).


def _lm_block_into(blocks, lm_key, params, arr, extra_map=None):
    """Shared language-decoder key routing (llama-style names)."""
    if lm_key == "model.embed_tokens.weight":
        params["embed_tokens"] = arr
    elif lm_key == "model.norm.weight":
        params["norm"] = arr
    elif lm_key == "lm_head.weight":
        params["lm_head"] = arr
    elif lm_key.startswith("model.layers."):
        rest = lm_key[len("model.layers."):]
        li, sub = rest.split(".", 1)
        if extra_map and sub in extra_map:
            blocks[int(li)][extra_map[sub]] = arr
        elif sub in _BLOCK_MAP:
            blocks[int(li)][_BLOCK_MAP[sub]] = arr
        else:
            return False
    else:
        return False
    return True


def glm4vmoe_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """HF ``Glm4vMoeForConditionalGeneration`` state dict → pytree of
    ``models.glm4vmoe`` (conv3d patch embed + RMSNorm ViT + bicubic pos
    resample tower; GLM-MoE text decoder with attention biases)."""
    dtype = dtype or cfg.dtype
    blocks: List[Dict[str, Any]] = [
        ({"experts": [dict() for _ in range(cfg.n_routed_experts)]}
         if cfg.layer_is_moe(li) else {})
        for li in range(cfg.num_layers)]
    vt: Dict[str, Any] = {"blocks": [dict() for _ in range(cfg.v_layers)],
                          "merger": {}}
    params: Dict[str, Any] = {"blocks": blocks, "visual": vt}
    vmap = {"norm1.weight": "ln1", "norm2.weight": "ln2",
            "attn.qkv.weight": "qkv", "attn.qkv.bias": "qkv_b",
            "attn.proj.weight": "proj",
            "mlp.gate_proj.weight": "gate_proj",
            "mlp.up_proj.weight": "up_proj",
            "mlp.down_proj.weight": "down_proj"}
    mmap = {"proj.weight": "proj",
            "post_projection_norm.weight": "ln_g",
            "post_projection_norm.bias": "ln_b",
            "gate_proj.weight": "gate_proj",
            "up_proj.weight": "up_proj",
            "down_proj.weight": "down_proj"}
    bias_map = {"self_attn.q_proj.bias": "q_bias",
                "self_attn.k_proj.bias": "k_bias",
                "self_attn.v_proj.bias": "v_bias"}
    for key, tensor in state.items():
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        k = key
        for pre in ("model.language_model.", "language_model.model.",
                    "language_model."):
            if k.startswith(pre):
                k = "model." + k[len(pre):]
                break
        if k == "lm_head.weight":
            params["lm_head"] = arr
            continue
        if k.startswith("model.layers."):
            rest = k[len("model.layers."):]
            li, sub = rest.split(".", 1)
            li = int(li)
            if sub in bias_map:
                blocks[li][bias_map[sub]] = arr
                continue
            if sub == "mlp.gate.weight":
                blocks[li]["gate"] = arr
                continue
            if sub == "mlp.gate.e_score_correction_bias":
                blocks[li]["e_score_correction_bias"] = jnp.asarray(
                    np.asarray(tensor), jnp.float32)
                continue
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                if (len(parts) >= 5 and parts[4] == "weight"
                        and parts[3] in ("gate_proj", "up_proj",
                                         "down_proj")):
                    blocks[li]["experts"][int(parts[2])][parts[3]] = arr
                continue
            if sub.startswith("mlp.shared_experts."):
                wname = sub[len("mlp.shared_experts."):].rsplit(
                    ".weight", 1)[0]
                blocks[li].setdefault("shared_experts", {})[wname] = arr
                continue
            if _lm_block_into(blocks, k, params, arr):
                continue
            continue
        if _lm_block_into(blocks, k, params, arr):
            continue
        v = k
        for pre in ("model.visual.", "visual."):
            if v.startswith(pre):
                v = v[len(pre):]
                break
        else:
            continue
        if v == "patch_embed.proj.weight":
            w = np.asarray(tensor)
            vt["patch_embed"] = jnp.asarray(
                w.reshape(w.shape[0], -1)).astype(dtype)
        elif v == "patch_embed.proj.bias":
            vt["patch_embed_b"] = arr
        elif v == "post_conv_layernorm.weight":
            vt["post_conv_ln_g"] = arr
        elif v == "embeddings.position_embedding.weight":
            vt["pos_embed"] = arr
        elif v == "post_layernorm.weight":
            vt["post_ln_g"] = arr
        elif v == "downsample.weight":
            vt["downsample"] = arr
        elif v == "downsample.bias":
            vt["downsample_b"] = arr
        elif v.startswith("merger."):
            sub = v[len("merger."):]
            if sub in mmap:
                vt["merger"][mmap[sub]] = arr
        elif v.startswith("blocks."):
            li, sub = v[len("blocks."):].split(".", 1)
            if sub in vmap:
                vt["blocks"][int(li)][vmap[sub]] = arr
    if getattr(cfg, "tie_embeddings", False):
        params.pop("lm_head", None)
    return params


def mistral3_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """HF ``Mistral3ForConditionalGeneration`` state dict → pytree of
    ``models.mistral3`` (Pixtral interleaved-2D-rope ViT + patch-merger
    projector + mistral decoder)."""
    dtype = dtype or cfg.dtype
    blocks = [dict() for _ in range(cfg.num_layers)]
    vis: Dict[str, Any] = {"blocks": [dict() for _ in range(cfg.v_layers)]}
    params: Dict[str, Any] = {"blocks": blocks, "visual": vis}
    vmap = {"attention_norm.weight": "attn_norm",
            "ffn_norm.weight": "ffn_norm",
            "attention.q_proj.weight": "q_proj",
            "attention.k_proj.weight": "k_proj",
            "attention.v_proj.weight": "v_proj",
            "attention.o_proj.weight": "o_proj",
            "feed_forward.gate_proj.weight": "gate_proj",
            "feed_forward.up_proj.weight": "up_proj",
            "feed_forward.down_proj.weight": "down_proj"}
    for key, tensor in state.items():
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        k = key
        for pre in ("model.language_model.", "language_model.model.",
                    "language_model."):
            if k.startswith(pre):
                k = "model." + k[len(pre):]
                break
        if k == "lm_head.weight":
            params["lm_head"] = arr
            continue
        if _lm_block_into(blocks, k, params, arr):
            continue
        v = k
        for pre in ("model.vision_tower.", "vision_tower."):
            if v.startswith(pre):
                v = v[len(pre):]
                break
        else:
            if "multi_modal_projector." in k:
                sub = k.split("multi_modal_projector.", 1)[1]
                if sub == "norm.weight":
                    vis["proj_norm"] = arr
                elif sub == "patch_merger.merging_layer.weight":
                    vis["merge"] = arr
                elif sub == "linear_1.weight":
                    vis["fc1"] = arr
                elif sub == "linear_2.weight":
                    vis["fc2"] = arr
            continue
        if v == "patch_conv.weight":
            w = np.asarray(tensor)
            vis["patch_embed"] = jnp.asarray(
                w.reshape(w.shape[0], -1)).astype(dtype)
        elif v == "ln_pre.weight":
            vis["ln_pre"] = arr
        elif v.startswith("transformer.layers."):
            li, sub = v[len("transformer.layers."):].split(".", 1)
            if sub in vmap:
                vis["blocks"][int(li)][vmap[sub]] = arr
    if getattr(cfg, "tie_embeddings", False):
        params.pop("lm_head", None)
    return params


def mllama_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """HF Mllama (Llama-3.2 Vision) text-decoder state dict → pytree of
    ``models.mllama`` (self blocks + gated cross-attention blocks).

    Accepts ``language_model.model.*`` / ``model.*`` / bare prefixes (the
    latter is what ``MllamaTextModel.state_dict()`` emits).  The vision
    tower here is this repo's simplified CLIP-class ViT, so HF vision
    keys are NOT mapped; tower weights stay at their passed-in values
    (quantization-relevant parity is the text decoder the reference
    tunes, ``mllm/template.py`` mllama)."""
    import jax as _jax
    dtype = dtype or cfg.dtype
    from ..models import mllama as _mllama
    # vision tower/projector initialize deterministically (simplified
    # CLIP-class design); the text decoder below is overwritten from
    # the state dict
    params = _mllama.init_params(cfg, _jax.random.PRNGKey(0))
    blocks = params["blocks"]
    cross_map = {"cross_attn.q_proj.weight": "cross_q_proj",
                 "cross_attn.k_proj.weight": "cross_k_proj",
                 "cross_attn.v_proj.weight": "cross_v_proj",
                 "cross_attn.o_proj.weight": "cross_o_proj",
                 "cross_attn.q_norm.weight": "cross_q_norm",
                 "cross_attn.k_norm.weight": "cross_k_norm"}
    for key, tensor in state.items():
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        k = key
        for pre in ("language_model.model.", "model.language_model.",
                    "language_model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        else:
            if k.startswith("model."):
                k = k[len("model."):]
        if k == "embed_tokens.weight":
            # HF mllama appends 8 special image rows past vocab_size
            params["embed_tokens"] = arr[:cfg.vocab_size]
            continue
        if k == "norm.weight":
            params["norm"] = arr
            continue
        if k in ("lm_head.weight",):
            params["lm_head"] = arr
            continue
        if not k.startswith("layers."):
            continue
        li, sub = k[len("layers."):].split(".", 1)
        li = int(li)
        if sub in cross_map:
            blocks[li][cross_map[sub]] = arr
        elif sub == "cross_attn_attn_gate":
            blocks[li]["gate_attn"] = jnp.asarray(
                np.asarray(tensor), jnp.float32).reshape(())
        elif sub == "cross_attn_mlp_gate":
            blocks[li]["gate_ffn"] = jnp.asarray(
                np.asarray(tensor), jnp.float32).reshape(())
        elif sub in _BLOCK_MAP:
            blocks[li][_BLOCK_MAP[sub]] = arr
    if getattr(cfg, "tie_embeddings", False):
        params.pop("lm_head", None)
    return params


_AUDIO_BLOCK_MAP = {
    "self_attn_layer_norm.weight": "ln1_g",
    "self_attn_layer_norm.bias": "ln1_b",
    "self_attn.q_proj.weight": "q_proj", "self_attn.q_proj.bias": "q_b",
    "self_attn.k_proj.weight": "k_proj", "self_attn.k_proj.bias": "k_b",
    "self_attn.v_proj.weight": "v_proj", "self_attn.v_proj.bias": "v_b",
    "self_attn.out_proj.weight": "out_proj",
    "self_attn.out_proj.bias": "out_b",
    "final_layer_norm.weight": "ln2_g", "final_layer_norm.bias": "ln2_b",
    "fc1.weight": "fc1", "fc1.bias": "fc1_b",
    "fc2.weight": "fc2", "fc2.bias": "fc2_b",
}


def _audio_tower_from_state(state, cfg, dtype, *, v3: bool):
    """Audio-encoder keys (bare / ``audio_tower.`` / ``thinker.audio_tower.``
    prefixes) → the ``audio_tower`` sub-pytree of qwen25omni/qwen3omni.

    ``v3`` selects the Qwen3-Omni layout (three conv2d stages + conv_out
    + two projections) vs the Qwen2.5-Omni whisper-lineage layout (two
    conv1d stages + proj); the whisper k_proj has no bias — zeros."""
    top_v2 = {"conv1.weight": "conv1", "conv1.bias": "conv1_b",
              "conv2.weight": "conv2", "conv2.bias": "conv2_b",
              "ln_post.weight": "ln_post_g", "ln_post.bias": "ln_post_b",
              "proj.weight": "proj", "proj.bias": "proj_b"}
    top_v3 = {"conv2d1.weight": "conv1", "conv2d1.bias": "conv1_b",
              "conv2d2.weight": "conv2", "conv2d2.bias": "conv2_b",
              "conv2d3.weight": "conv3", "conv2d3.bias": "conv3_b",
              "conv_out.weight": "conv_out",
              "ln_post.weight": "ln_post_g", "ln_post.bias": "ln_post_b",
              "proj1.weight": "proj1", "proj1.bias": "proj1_b",
              "proj2.weight": "proj2", "proj2.bias": "proj2_b"}
    top = top_v3 if v3 else top_v2
    at: Dict[str, Any] = {"blocks": [dict() for _ in range(cfg.a_layers)]}
    found = False
    for key, tensor in state.items():
        k = key
        for pre in ("thinker.audio_tower.", "model.audio_tower.",
                    "audio_tower."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        if k in top:
            at[top[k]] = arr
            found = True
        elif k.startswith("layers."):
            li, sub = k[len("layers."):].split(".", 1)
            if sub in _AUDIO_BLOCK_MAP:
                at["blocks"][int(li)][_AUDIO_BLOCK_MAP[sub]] = arr
                found = True
    if not found:
        return None
    if not v3:
        for b in at["blocks"]:
            # whisper-lineage attention: k_proj carries no bias
            b.setdefault("k_b", jnp.zeros((cfg.a_d_model,), dtype))
    return at


def qwen25omni_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """HF Qwen2.5-Omni thinker state dict → pytree of
    ``models.qwen25omni``: the vision/decoder side IS qwen25vl (config
    subclass — reuses :func:`qwen25vl_params_from_state`), plus the
    whisper-lineage audio tower.  Accepts ``thinker.*`` prefixes."""
    dtype = dtype or cfg.dtype
    stripped = {}
    for k, t in state.items():
        kk = k[len("thinker."):] if k.startswith("thinker.") else k
        stripped[kk] = t
    params = qwen25vl_params_from_state(stripped, cfg, dtype)
    at = _audio_tower_from_state(stripped, cfg, dtype, v3=False)
    if at is not None:
        params["audio_tower"] = at
    return params


def qwen3omni_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """HF Qwen3-Omni-MoE thinker state dict → pytree of
    ``models.qwen3omni``: text/vision via
    :func:`qwen3vlmoe_params_from_state`, plus the conv2d-stack audio
    tower."""
    dtype = dtype or cfg.dtype
    stripped = {}
    for k, t in state.items():
        kk = k[len("thinker."):] if k.startswith("thinker.") else k
        stripped[kk] = t
    params = qwen3vlmoe_params_from_state(stripped, cfg, dtype)
    at = _audio_tower_from_state(stripped, cfg, dtype, v3=True)
    if at is not None:
        params["audio_tower"] = at
    return params


def deepseek_vl_params_from_state(state, cfg, dtype=None) -> Dict[str, Any]:
    """DeepSeek-VL2-layout state dict → pytree of ``models.deepseek_vl``
    (SigLIP tower + pixel-shuffle projector over a DeepSeek-MLA text
    decoder).  Key layout follows the published VL2 checkpoints:
    ``language.model.*`` (DeepSeek keys), ``vision.*`` (timm-style ViT:
    patch_embed.proj, blocks.N.{norm1,norm2,attn.qkv,attn.proj,mlp.fc1,
    mlp.fc2}, norm), ``projector.layers.{0,2}`` (transformers<5 ships no
    VL2 modeling — layout locked by the synthetic roundtrip test)."""
    dtype = dtype or cfg.dtype
    from .hf_loader import _map_deepseek_key
    n_exp = cfg.n_routed_experts
    blocks: List[Dict[str, Any]] = [dict() for _ in range(cfg.num_layers)]
    vt: Dict[str, Any] = {"blocks": [dict() for _ in range(cfg.v_layers)]}
    params: Dict[str, Any] = {"blocks": blocks, "vision_tower": vt,
                              "mm_projector": {}}
    vmap = {"norm1.weight": "ln1_g", "norm1.bias": "ln1_b",
            "norm2.weight": "ln2_g", "norm2.bias": "ln2_b",
            "attn.qkv.weight": "qkv", "attn.qkv.bias": "qkv_b",
            "attn.proj.weight": "proj", "attn.proj.bias": "proj_b",
            "mlp.fc1.weight": "fc1", "mlp.fc1.bias": "fc1_b",
            "mlp.fc2.weight": "fc2", "mlp.fc2.bias": "fc2_b"}
    for key, tensor in state.items():
        arr = jnp.asarray(np.asarray(tensor)).astype(dtype)
        if key.startswith(("language.model.", "language_model.model.")):
            k = key.split("model.", 1)[1]
            if k == "embed_tokens.weight":
                params["embed_tokens"] = arr
            elif k == "norm.weight":
                params["norm"] = arr
            elif k.startswith("layers."):
                li, sub = k[len("layers."):].split(".", 1)
                li = int(li)
                if sub == "mlp.gate.weight":
                    blocks[li]["gate"] = arr
                elif sub == "mlp.gate.e_score_correction_bias":
                    blocks[li]["e_score_correction_bias"] = jnp.asarray(
                        np.asarray(tensor), jnp.float32)
                else:
                    _map_deepseek_key(sub, blocks[li], arr)
            continue
        if key in ("language.lm_head.weight", "lm_head.weight"):
            params["lm_head"] = arr
            continue
        if key.startswith("vision."):
            v = key[len("vision."):]
            if v == "patch_embed.proj.weight":
                w = np.asarray(tensor)
                vt["patch_embed"] = jnp.asarray(
                    w.transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
                    if w.ndim == 4 else w.reshape(w.shape[0], -1)
                ).astype(dtype)
            elif v == "patch_embed.proj.bias":
                vt["patch_embed_b"] = arr
            elif v == "pos_embed":
                vt["pos_embed"] = arr.reshape(-1, arr.shape[-1])
            elif v == "norm.weight":
                vt["post_ln_g"] = arr
            elif v == "norm.bias":
                vt["post_ln_b"] = arr
            elif v.startswith("blocks."):
                li, sub = v[len("blocks."):].split(".", 1)
                if sub in vmap:
                    vt["blocks"][int(li)][vmap[sub]] = arr
            continue
        if key.startswith("projector.layers."):
            idx, rest = key[len("projector.layers."):].split(".", 1)
            slot = "fc1" if idx == "0" else "fc2"
            if rest == "weight":
                params["mm_projector"][slot] = arr
            elif rest == "bias":
                params["mm_projector"][slot + "_b"] = arr
    for b in blocks:
        if isinstance(b.get("experts"), dict):
            exp = b["experts"]
            b["experts"] = [exp[e] for e in sorted(exp)]
    if getattr(cfg, "tie_embeddings", False):
        params.pop("lm_head", None)
    return params
