"""MLX-format export writer (Apple mlx-lm interchange).

Role of the reference's ``export/export_to_mlx/export.py`` (720 LoC),
re-derived rather than translated: MLX QuantizedLinear dequantizes
affinely

    w = scales * w_int + biases        (``biases`` = -scale * zp)

with ``w_int`` packed as a contiguous little-endian bit stream into
uint32 words — for bits in {2, 4, 8} each word holds ``32 // bits``
elements LSB-first; for bits in {3, 5, 6} every 32 elements span
``bits`` words (reference ``_pack_weight_mlx``, ``export.py:426``).
Scales/biases are float16 of shape (out_features, groups), and
``config.json`` carries the mlx-community ``quantization`` dict with
per-layer mixed-bit overrides (``export.py:77``).

The cross-word packer here is vectorized bit-plane math (no per-bit
Python loops over elements as in the reference).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ..utils.logger import logger

__all__ = ["pack_mlx_weight", "unpack_mlx_weight", "mlx_pack_layer",
           "save_quantized_as_mlx"]


def pack_mlx_weight(codes: np.ndarray, bits: int) -> np.ndarray:
    """(O, I) uint codes < 2^bits → (O, I*bits/32) uint32, MLX bit stream."""
    codes = np.asarray(codes, np.uint32)
    O, I = codes.shape
    if 32 % bits == 0:
        epw = 32 // bits  # elements per word, element 0 in the low bits
        assert I % epw == 0, (I, bits)
        c = codes.reshape(O, I // epw, epw)
        shifts = (np.arange(epw, dtype=np.uint32) * bits)[None, None, :]
        return (c << shifts).sum(axis=2, dtype=np.uint64).astype(np.uint32)
    # cross-word: element i contributes its `bits` bits at absolute
    # little-endian bit offset i*bits of a 32*bits-bit stream per 32 elems
    assert I % 32 == 0, (I, bits)
    c = codes.reshape(O, I // 32, 32).astype(np.uint64)
    bitvals = (c[..., None] >> np.arange(bits, dtype=np.uint64)) & 1
    # (O, G, 32, bits) → stream index i*bits + b is exactly C-order flatten
    stream = bitvals.reshape(O, I // 32, bits, 32)  # word w = stream bits
    words = (stream << np.arange(32, dtype=np.uint64)).sum(
        axis=3, dtype=np.uint64)
    return words.reshape(O, I * bits // 32).astype(np.uint32)


def unpack_mlx_weight(words: np.ndarray, bits: int,
                      in_features: int) -> np.ndarray:
    """Inverse of :func:`pack_mlx_weight` → (O, in_features) uint32."""
    words = np.asarray(words, np.uint32)
    O = words.shape[0]
    if 32 % bits == 0:
        epw = 32 // bits
        shifts = (np.arange(epw, dtype=np.uint32) * bits)[None, None, :]
        mask = np.uint32(2 ** bits - 1)
        c = (words[..., None] >> shifts) & mask
        return c.reshape(O, -1)[:, :in_features]
    w = words.reshape(O, in_features // 32, bits).astype(np.uint64)
    stream = (w[..., None] >> np.arange(32, dtype=np.uint64)) & 1
    bitvals = stream.reshape(O, in_features // 32, 32, bits)
    vals = (bitvals << np.arange(bits, dtype=np.uint64)).sum(axis=3)
    return vals.reshape(O, in_features).astype(np.uint32)


def mlx_pack_layer(ql) -> Dict[str, np.ndarray]:
    """QuantizedLayer → {weight (uint32), scales (f16), biases (f16)}.

    Sym layers use the fixed integer zero point 2^(bits-1) (the GPTQ sym
    convention, reference ``export.py:554-563``); asym layers fold their
    per-group zp into ``biases``.
    """
    from . import codes_from_qdq

    bits = ql.scheme.bits
    qdq = np.asarray(ql.qdq, np.float32)
    scale = np.asarray(ql.scale, np.float32)
    O, I = qdq.shape
    gs = ql.scheme.group_size
    g = gs if isinstance(gs, int) and gs > 0 else I
    zp = None if ql.zp is None else np.asarray(ql.zp, np.float32)
    codes = codes_from_qdq(qdq, scale, zp, bits, g)
    zpv = np.float32(2 ** (bits - 1)) if zp is None else zp
    return {
        "weight": pack_mlx_weight(codes, bits),
        "scales": scale.astype(np.float16),
        "biases": (-scale * zpv).astype(np.float16),
    }


def _hf_name(flat: str) -> Optional[str]:
    """Our pytree name → HF/MLX tensor name prefix."""
    from ..utils.hf_loader import _BLOCK_MAP, _TOP_MAP

    inv_top = {v: k for k, v in _TOP_MAP.items()}
    inv_block = {v: k for k, v in _BLOCK_MAP.items()}
    parts = flat.split(".")
    if parts[0] == "blocks":
        sub = inv_block.get(".".join(parts[2:]) + ".weight")
        if sub is None:
            sub = inv_block.get(".".join(parts[2:]))
        if sub is None:
            return None
        sub = sub[: -len(".weight")] if sub.endswith(".weight") else sub
        return f"model.layers.{parts[1]}.{sub}"
    top = inv_top.get(flat)
    return top[: -len(".weight")] if top else None


def save_quantized_as_mlx(result, model_cfg, output_dir: str) -> str:
    """Write an mlx-lm-loadable checkpoint directory.

    Layout: ``model.safetensors`` with HF tensor names (packed layers as
    ``<name>.weight/.scales/.biases``, the rest dense fp16) + a
    ``config.json`` carrying the mlx-community ``quantization`` dict.
    """
    from safetensors.numpy import save_file

    from . import _flatten_params

    os.makedirs(output_dir, exist_ok=True)
    flat = _flatten_params(result.params)
    quant_names = set(result.layers)

    tensors: Dict[str, np.ndarray] = {}
    quant_cfg: Dict[str, Any] = {}
    bit_counts: Dict[tuple, int] = {}

    for name, ql in result.layers.items():
        if ql.scheme.data_type != "int":
            raise NotImplementedError(
                f"mlx export covers int schemes; {name} is "
                f"{ql.scheme.data_type}")
        hf = _hf_name(name)
        if hf is None:
            logger.warning("mlx export: no HF name for %s; skipping", name)
            continue
        payload = mlx_pack_layer(ql)
        for pk, pv in payload.items():
            tensors[f"{hf}.{pk}"] = pv
        gs = ql.scheme.group_size
        g = gs if isinstance(gs, int) and gs > 0 else ql.qdq.shape[1]
        quant_cfg[hf] = {"group_size": int(g), "bits": int(ql.scheme.bits)}
        bit_counts[(int(g), int(ql.scheme.bits))] = bit_counts.get(
            (int(g), int(ql.scheme.bits)), 0) + 1

    # dense remainder in fp16 under HF names; unquantized linears are
    # marked false so mlx-lm instantiates them as plain Linear
    for name, arr in flat.items():
        if name in quant_names:
            continue
        hf = _hf_name(name)
        if hf is None:
            continue
        if arr is None:
            continue
        key = hf if hf.endswith(".bias") else f"{hf}.weight"
        tensors[key] = np.asarray(arr, np.float16)
        if name.split(".")[-1] in ("q_proj", "k_proj", "v_proj", "o_proj",
                                   "gate_proj", "up_proj", "down_proj",
                                   "lm_head"):
            quant_cfg[hf] = False

    default_g, default_bits = max(bit_counts, key=bit_counts.get) \
        if bit_counts else (64, 4)
    qdict: Dict[str, Any] = {"group_size": default_g, "bits": default_bits}
    for hf, entry in quant_cfg.items():
        if entry is False or (entry["group_size"], entry["bits"]) != (
                default_g, default_bits):
            qdict[hf] = entry

    save_file(tensors, os.path.join(output_dir, "model.safetensors"))
    mc = model_cfg
    config = {
        "model_type": "llama",
        "vocab_size": mc.vocab_size,
        "hidden_size": mc.hidden_size,
        "intermediate_size": mc.intermediate_size,
        "num_hidden_layers": mc.num_layers,
        "num_attention_heads": mc.num_heads,
        "num_key_value_heads": mc.num_kv_heads,
        "head_dim": mc.hd,
        "rope_theta": mc.rope_theta,
        "rms_norm_eps": mc.rms_eps,
        "tie_word_embeddings": bool(getattr(mc, "tie_embeddings", False)),
        "quantization": qdict,
        "quantization_config": qdict,
    }
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    logger.info("saved mlx checkpoint (%d packed layers) to %s",
                sum(1 for v in quant_cfg.values() if v is not False),
                output_dir)
    return output_dir
