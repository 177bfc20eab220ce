"""Load external GPTQ/auto-round CUDA-ecosystem checkpoints for serving.

Role of the reference's HF load path (``inference/convert_model.py:812``
``convert_hf_model`` + ``convert_gptq_v1_to_v2_format`` ``:607``): a user
of the reference ecosystem holds HF-layout checkpoints whose quantized
layers are ``<prefix>.qweight/qzeros/scales`` (+``g_idx``) in GPTQ v1
convention (stored zeros = zp - 1).  This loader maps them into the
functional pytree and repacks eligible int4 layers into the serving
nibble-plane layout.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..export.formats import awq_unpack_layer, gptq_unpack_layer
from ..models.llama import LlamaConfig
from ..ops.qmatmul import pack_w4_planes
from ..utils.hf_loader import _BLOCK_MAP, _TOP_MAP, config_from_hf
from ..utils.logger import logger
from ..utils.pytree import set_by_path

__all__ = ["load_gptq_checkpoint", "load_awq_checkpoint",
           "load_quantized_checkpoint"]


def load_gptq_checkpoint(path: str, dtype=jnp.bfloat16):
    """HF-layout GPTQ checkpoint dir → (params, cfg, packed).  See
    :func:`load_quantized_checkpoint` (kinds dropped for compatibility)."""
    params, cfg, packed, _ = load_quantized_checkpoint(path, dtype,
                                                       method="gptq")
    return params, cfg, packed


def load_awq_checkpoint(path: str, dtype=jnp.bfloat16):
    """HF-layout AWQ (gemm) checkpoint dir → (params, cfg, packed, kinds)."""
    return load_quantized_checkpoint(path, dtype, method="awq")


def load_quantized_checkpoint(path: str, dtype=jnp.bfloat16,
                              method: str = None):
    """HF-layout external quantized checkpoint → (params, cfg, packed,
    kinds).

    Handles both CUDA-ecosystem layouts the reference exports/consumes
    (``inference/convert_model.py:812``):

      * GPTQ v1 — qweight (I*bits/32, O), qzeros off-by-one, g_idx
      * AWQ gemm — qweight (I, O/8) output-interleaved, real zero-points

    ``packed`` maps flat layer names to serving-kernel payloads
    ((qw, scales) sym / (qw, scales, zp) asym) for eligible 4-bit layers;
    others are dequantized dense.  ``kinds`` names the kernel per entry.
    """
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    qcfg = hf_cfg.get("quantization_config", {})
    if method is None:
        method = str(qcfg.get("quant_method", "gptq")).lower()
        if method not in ("gptq", "awq"):
            method = "awq" if qcfg.get("version") == "gemm" else "gptq"
    bits = int(qcfg.get("bits", qcfg.get("w_bit", 4)))
    group_size = int(qcfg.get("group_size", qcfg.get("q_group_size", 128)))
    sym = bool(qcfg.get("sym", False))
    cfg = config_from_hf(hf_cfg, dtype)

    from safetensors import safe_open

    index_path = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
    else:
        shards = ["model.safetensors"]

    tensors: Dict[str, np.ndarray] = {}
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="numpy") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)

    blocks = [dict() for _ in range(cfg.num_layers)]
    params: Dict[str, Any] = {"blocks": blocks}
    packed: Dict[str, Tuple[jax.Array, jax.Array]] = {}
    kinds: Dict[str, str] = {}

    def ingest_awq(flat_ours, hf_prefix):
        qn = f"{hf_prefix}.qweight"
        payload = {"qweight": tensors[qn],
                   "qzeros": tensors[f"{hf_prefix}.qzeros"],
                   "scales": tensors[f"{hf_prefix}.scales"]}
        I = payload["qweight"].shape[0]
        O = payload["qweight"].shape[1] * (32 // bits)
        codes, scale, zp = awq_unpack_layer(payload, O, I)
        g = group_size if group_size > 0 else I
        if bits == 4 and group_size >= 128 and I % (8 * group_size) == 0:
            qw = pack_w4_planes(jnp.asarray(codes.astype(np.int32)),
                                group_size)
            packed[flat_ours] = (qw, jnp.asarray(scale.astype(np.float32)),
                                 jnp.asarray(zp.astype(np.float32)))
            kinds[flat_ours] = "w4a16_asym"
            return jnp.zeros((O, I), dtype)  # placeholder leaf
        dq = ((codes.astype(np.float32)
               - np.repeat(zp, g, 1)[:, :I].astype(np.float32))
              * np.repeat(scale, g, 1)[:, :I])
        return jnp.asarray(dq, dtype)

    def ingest(flat_ours, hf_prefix):
        qn = f"{hf_prefix}.qweight"
        if qn in tensors and method == "awq":
            return ingest_awq(flat_ours, hf_prefix)
        if qn in tensors:
            payload = {"qweight": tensors[qn],
                       "qzeros": tensors[f"{hf_prefix}.qzeros"],
                       "scales": tensors[f"{hf_prefix}.scales"]}
            O = payload["qweight"].shape[1]
            I = payload["qweight"].shape[0] * 32 // bits
            codes, scale, zp = gptq_unpack_layer(payload, bits, O, I)
            g = group_size if group_size > 0 else I
            # act-order (desc_act) checkpoints carry g_idx: per-input-
            # channel group assignment that is NOT arange(I)//g.  The
            # reference handles this in convert_gptq_v1_to_v2_format /
            # backend checkers (inference/convert_model.py:607); here we
            # dequantize dense with g_idx-indexed scales (the packed
            # kernel layout requires contiguous groups).
            gi = tensors.get(f"{hf_prefix}.g_idx")
            contiguous = True
            if gi is not None:
                gi = gi.astype(np.int64)
                contiguous = np.array_equal(gi, np.arange(I) // g)
            # v1 → v2: gptq_unpack_layer already re-adds the +1
            centered = (zp == 2 ** (bits - 1)).all()
            if (contiguous and bits == 4 and centered and group_size >= 128
                    and I % (8 * group_size) == 0):
                qw = pack_w4_planes(jnp.asarray(codes.astype(np.int32)),
                                    group_size)
                packed[flat_ours] = (qw, jnp.asarray(scale.astype(np.float32)))
                kinds[flat_ours] = "w4a16"
                return jnp.zeros((O, I), dtype)  # placeholder leaf
            if not contiguous:
                logger.info("gptq loader: %s has act-order g_idx; "
                            "serving dense", flat_ours)
                dq = ((codes.astype(np.float32) - zp[:, gi].astype(np.float32))
                      * scale[:, gi])
            else:
                dq = ((codes.astype(np.float32)
                       - np.repeat(zp, g, 1)[:, :I].astype(np.float32))
                      * np.repeat(scale, g, 1)[:, :I])
            return jnp.asarray(dq, dtype)
        wn = f"{hf_prefix}.weight"
        if wn in tensors:
            return jnp.asarray(tensors[wn]).astype(dtype)
        return None

    for hf_key, ours in _TOP_MAP.items():
        leaf = ingest(ours, hf_key[: -len(".weight")])
        if leaf is not None:
            params[ours] = leaf
    inv_block = {}
    for hf_sub, ours in _BLOCK_MAP.items():
        if hf_sub.endswith(".weight"):
            inv_block[ours] = hf_sub[: -len(".weight")]
    for li in range(cfg.num_layers):
        for ours, hf_sub in inv_block.items():
            leaf = ingest(f"blocks.{li}.{ours}",
                          f"model.layers.{li}.{hf_sub}")
            if leaf is not None:
                blocks[li][ours] = leaf
        for bias_sub, ours in _BLOCK_MAP.items():
            if bias_sub.endswith(".bias"):
                bn = f"model.layers.{li}.{bias_sub}"
                if bn in tensors:
                    blocks[li][ours] = jnp.asarray(tensors[bn]).astype(dtype)
    if cfg.tie_embeddings:
        params.pop("lm_head", None)
    logger.info("%s loader: %d packed layers, bits=%d g=%d", method,
                len(packed), bits, group_size)
    return params, cfg, packed, kinds
