"""Export format registry + GPTQ / AWQ / llm-compressor writers.

Role of the reference's ``export/formats/base.py`` (``OutputFormat`` ABC +
``register()``), ``export_to_autogptq`` and ``export_to_awq`` writers, and
``export_to_llmcompressor``.  Layouts follow the public format
conventions:

  * GPTQ v1: ``qweight (I*bits/32, O)`` int32 packed along the input axis
    LSB-first, ``qzeros (G, O*bits/32)`` storing ``zp - 1`` (the v1
    off-by-one convention the reference converts at load,
    ``inference/convert_model.py:607``), ``scales (G, O)`` fp16,
    ``g_idx (I,)`` int32 group indices.
  * AWQ gemm: ``qweight (I, O*bits/32)`` packed along the output axis in
    the interleaved nibble order [0, 2, 4, 6, 1, 3, 5, 7]; qzeros same
    interleave; scales (G, O) fp16.
  * llm-compressor: compressed-tensors style quantization_config JSON with
    qdq or packed weights for vLLM consumption.

Interop caveat: layouts are validated by exact self-inverse unpackers in
tests; cross-loading into CUDA kernels needs a networked host to verify.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict

import numpy as np

from ..utils.logger import logger
from .packing import pack_rows, unpack_rows

__all__ = ["FORMATS", "register_format", "gptq_pack_layer", "awq_pack_layer",
           "gptq_unpack_layer", "awq_unpack_layer"]

FORMATS: Dict[str, Callable] = {}

AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]
_AWQ_INV = np.argsort(AWQ_ORDER)


def register_format(name: str):
    def deco(fn):
        FORMATS[name] = fn
        return fn
    return deco


def _codes_scale_zp(ql):
    """Recover integer codes + positive zp for an int QuantizedLayer."""
    from . import codes_from_qdq

    scheme = ql.scheme
    qdq = np.asarray(ql.qdq, np.float32)
    scale = np.asarray(ql.scale, np.float32)
    O, I = qdq.shape
    g = scheme.group_size if scheme.group_size > 0 else I
    codes = codes_from_qdq(qdq, scale,
                           None if ql.zp is None else np.asarray(ql.zp),
                           scheme.bits, g)
    if ql.zp is None:
        zp = np.full(scale.shape, 2 ** (scheme.bits - 1), np.uint32)
    else:
        zp = np.asarray(ql.zp, np.uint32)
    return codes, scale, zp, g


def gptq_pack_layer(ql) -> Dict[str, np.ndarray]:
    codes, scale, zp, g = _codes_scale_zp(ql)
    O, I = codes.shape
    bits = ql.scheme.bits
    qweight = pack_rows(codes, bits).T                     # (I*bits/32, O)
    qz = pack_rows(np.ascontiguousarray((zp - 1).T.astype(np.uint32)), bits)
    g_idx = (np.arange(I) // g).astype(np.int32)
    return {
        "qweight": np.ascontiguousarray(qweight),
        "qzeros": qz,                                      # (G, O*bits/32)
        "scales": np.ascontiguousarray(scale.T).astype(np.float16),
        "g_idx": g_idx,
    }


def gptq_unpack_layer(t: Dict[str, np.ndarray], bits: int, O: int, I: int):
    codes = unpack_rows(np.ascontiguousarray(t["qweight"].T), bits, I)[:O]
    scale = t["scales"].astype(np.float32).T               # (O, G)
    zp = unpack_rows(t["qzeros"], bits, O).T.astype(np.int64) + 1
    return codes, scale, zp


def awq_pack_layer(ql) -> Dict[str, np.ndarray]:
    codes, scale, zp, g = _codes_scale_zp(ql)
    bits = ql.scheme.bits
    assert bits == 4, "AWQ gemm layout is 4-bit"
    O, I = codes.shape
    # interleave along the output axis in groups of 8
    def interleave(m):  # (rows, O) -> reordered along O
        r, o = m.shape
        m = m.reshape(r, o // 8, 8)[:, :, AWQ_ORDER]
        return m.reshape(r, o)
    cw = interleave(np.ascontiguousarray(codes.T))         # (I, O)
    zw = interleave(np.ascontiguousarray(zp.T.astype(np.uint32)))  # (G, O)
    return {
        "qweight": pack_rows(cw, bits),                    # (I, O/8)
        "qzeros": pack_rows(zw, bits),                     # (G, O/8)
        "scales": np.ascontiguousarray(scale.T).astype(np.float16),
    }


def awq_unpack_layer(t: Dict[str, np.ndarray], O: int, I: int):
    def deinterleave(m):
        r, o = m.shape
        m = m.reshape(r, o // 8, 8)[:, :, _AWQ_INV]
        return m.reshape(r, o)
    codes = deinterleave(unpack_rows(t["qweight"], 4, O)).T  # (O, I)
    zp = deinterleave(unpack_rows(t["qzeros"], 4, O)).T      # (O, G)
    scale = t["scales"].astype(np.float32).T
    return codes[:, :I], scale, zp


def ct_pack_layer(ql) -> Dict[str, np.ndarray]:
    """compressed-tensors ``pack-quantized`` tensor layout (the format the
    reference's ``export_to_llmcompressor`` writer produces for vLLM).

    Semantics note: compressed-tensors quantizes int types onto the
    *signed* range [-2^(b-1), 2^(b-1)-1] (zero_point 0 when symmetric) and
    its packer offsets codes by +2^(b-1) back to unsigned before packing
    LSB-first into int32 — which is exactly this repo's unsigned code + zp
    convention, so the words below are bit-compatible:

      * ``weight_packed``    (O, ceil(I*bits/32)) int32 — codes packed
        along the input axis.
      * ``weight_scale``     (O, G) fp16.
      * ``weight_zero_point``(ceil(O*bits/32), G) int32 — only when asym;
        zero points packed along the output axis (packed_dim=0).
      * ``weight_shape``     [O, I] int32.
    """
    codes, scale, zp, g = _codes_scale_zp(ql)
    bits = ql.scheme.bits
    if 32 % bits:
        raise NotImplementedError(
            f"compressed-tensors pack-quantized needs bits | 32, got {bits}")
    O, I = codes.shape
    out = {
        "weight_packed": pack_rows(codes, bits),           # (O, I*bits/32)
        "weight_scale": np.ascontiguousarray(scale).astype(np.float16),
        "weight_shape": np.array([O, I], np.int32),
    }
    if ql.zp is not None and not ql.scheme.sym:
        out["weight_zero_point"] = pack_rows(
            np.ascontiguousarray(zp.T.astype(np.uint32)), bits).T
    return out


def ct_unpack_layer(t: Dict[str, np.ndarray], bits: int):
    """Exact inverse of :func:`ct_pack_layer` → (codes, scale, zp|None)."""
    O, I = (int(x) for x in t["weight_shape"])
    codes = unpack_rows(t["weight_packed"], bits, I)[:O]
    scale = t["weight_scale"].astype(np.float32)
    zp = None
    if "weight_zero_point" in t:
        zp = unpack_rows(np.ascontiguousarray(t["weight_zero_point"].T),
                         bits, O).T.astype(np.int64)
    return codes, scale, zp


def ct_float_layer(ql) -> Dict[str, np.ndarray]:
    """compressed-tensors ``float-quantized`` layout for FP8 schemes:
    ``weight`` stored as float8_e4m3fn bit patterns + per-channel/tensor
    ``weight_scale``.  Uses ml_dtypes for the e4m3 cast (JAX's numpy
    float8 support)."""
    import ml_dtypes

    qdq = np.asarray(ql.qdq, np.float32)
    scale = np.asarray(ql.scale, np.float32)
    if scale.ndim < 2:          # per-tensor (1,) or per-channel (O,)
        scale = (scale.reshape(qdq.shape[0], 1)
                 if scale.size == qdq.shape[0] else
                 np.broadcast_to(scale.reshape(1, 1),
                                 (qdq.shape[0], 1)).copy())
    codes = (qdq / np.repeat(scale, qdq.shape[1] // scale.shape[1], 1)
             ).astype(ml_dtypes.float8_e4m3fn)
    return {
        "weight": codes,
        "weight_scale": scale.astype(np.float32),
        "weight_shape": np.array(qdq.shape, np.int32),
    }


def llmcompressor_config(result) -> Dict:
    """compressed-tensors style config (vLLM) for the quantized layers."""
    groups = {}
    for name, ql in result.layers.items():
        s = ql.scheme
        key = s.key()
        groups.setdefault(key, {
            "targets": [],
            "weights": {
                "num_bits": s.bits,
                "type": "int" if s.data_type == "int" else s.data_type,
                "symmetric": bool(s.sym),
                "strategy": ("group" if isinstance(s.group_size, int)
                             and s.group_size > 0 else "channel"),
                "group_size": (s.group_size
                               if isinstance(s.group_size, int) else None),
            },
        })["targets"].append(name)
    all_fp8 = all(ql.scheme.data_type.startswith("fp8")
                  for ql in result.layers.values()) and result.layers
    return {
        "quant_method": "compressed-tensors",
        "format": "float-quantized" if all_fp8 else "pack-quantized",
        "config_groups": {f"group_{i}": v
                          for i, v in enumerate(groups.values())},
    }
