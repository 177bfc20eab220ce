"""GGUF export: llama.cpp-convention container writer + k-quant block packers.

Role of the reference's ``export/export_to_gguf/`` (numpy packers
replicating ggml at ``packing.py:150-1053``, metadata emission
``convert.py``, per-layer type cascade ``backends/gguf.py:485-617``).
Implemented from the public GGUF v3 container spec and the ggml block
layouts:

  q8_0: per 32 elems — fp16 d, int8 qs[32]
  q4_0: per 32 — fp16 d, 16 bytes (nibble l = elem l, elem l+16), code-8
  q4_K: per 256 — fp16 d, fp16 dmin, 12-byte 6-bit scale/min pack
        (llama.cpp get_scale_min_k4 layout), 128 nibble bytes
        (qs[j*32+l] = L[j*64+l] | L[j*64+32+l]<<4)
  q6_K: per 256 — ql[128] low-4, qh[64] upper-2, int8 scales[16], fp16 d;
        value = d * scales[g] * (q - 32)
  q2_K: per 256 — 16 scale/min bytes (4-bit each per 16-elem group),
        qs[64] 2-bit packed, fp16 d, fp16 dmin; value = d*sc*q - dmin*m

Each packer has an exact self-inverse (``dequant_*``) used by the tests;
cross-validation against llama.cpp binaries needs a networked host.

Tokenizer metadata is emitted only when a tokenizer payload is provided —
this container has no hub access, so checkpoints written here carry model
weights + hparams and can have tokenizer KVs injected later.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..utils.logger import logger

__all__ = ["GGMLType", "quantize_q8_0", "quantize_q4_0", "quantize_q4_k",
           "quantize_q6_k", "quantize_q2_k", "dequant_q8_0", "dequant_q4_0",
           "dequant_q4_k", "dequant_q6_k", "dequant_q2_k", "write_gguf",
           "save_gguf_checkpoint", "select_layer_qtype"]

QK = 32       # simple-quant block
QK_K = 256    # k-quant super-block


class GGMLType:
    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14

TYPE_NAMES = {0: "F32", 1: "F16", 2: "Q4_0", 3: "Q4_1", 6: "Q5_0",
              7: "Q5_1", 8: "Q8_0", 10: "Q2_K", 11: "Q3_K", 12: "Q4_K",
              13: "Q5_K", 14: "Q6_K"}
BLOCK_BYTES = {GGMLType.Q4_0: 18, GGMLType.Q4_1: 20, GGMLType.Q5_0: 22,
               GGMLType.Q5_1: 24, GGMLType.Q8_0: 34, GGMLType.Q2_K: 84,
               GGMLType.Q3_K: 110, GGMLType.Q4_K: 144, GGMLType.Q5_K: 176,
               GGMLType.Q6_K: 210}
BLOCK_ELEMS = {GGMLType.Q4_0: QK, GGMLType.Q4_1: QK, GGMLType.Q5_0: QK,
               GGMLType.Q5_1: QK, GGMLType.Q8_0: QK, GGMLType.Q2_K: QK_K,
               GGMLType.Q3_K: QK_K, GGMLType.Q4_K: QK_K,
               GGMLType.Q5_K: QK_K, GGMLType.Q6_K: QK_K}


def _f16(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16)


def _explicit_subscales(scale, wmin, d_scale, d_wmin, N, nsub, smax):
    """Tuned (d̂, m̂, supers) → byte-grid 6/4-bit subscale codes."""
    d_super = np.maximum(np.asarray(d_scale, np.float32).reshape(N), 1e-12)
    m_super = np.maximum(np.asarray(d_wmin, np.float32).reshape(N), 1e-12)
    sc = np.clip(np.rint(np.asarray(scale, np.float32).reshape(N, nsub)
                         / d_super[:, None]), 0, smax).astype(np.uint8)
    mn = np.clip(np.rint(np.asarray(wmin, np.float32).reshape(N, nsub)
                         / m_super[:, None]), 0, smax).astype(np.uint8)
    return d_super, m_super, sc, mn


# ---------------------------------------------------------------- q8_0
def quantize_q8_0(w: np.ndarray) -> np.ndarray:
    """w (..., multiple of 32) → raw block bytes."""
    x = w.reshape(-1, QK).astype(np.float32)
    amax = np.abs(x).max(axis=1, keepdims=True)
    d = amax / 127.0
    d = np.where(d == 0, 1e-12, d)
    q = np.clip(np.rint(x / d), -127, 127).astype(np.int8)
    out = np.empty((x.shape[0], 34), np.uint8)
    out[:, :2] = _f16(d[:, 0]).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def dequant_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    blocks = raw.reshape(-1, 34)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    q = blocks[:, 2:].copy().view(np.int8).astype(np.float32)
    return (q * d).reshape(-1)[:n]


# ---------------------------------------------------------------- q4_0
def quantize_q4_0(w: np.ndarray) -> np.ndarray:
    x = w.reshape(-1, QK).astype(np.float32)
    # full-range: signed extreme maps to -8
    idx = np.abs(x).argmax(axis=1)
    m = x[np.arange(x.shape[0]), idx]
    d = m / -8.0
    d = np.where(d == 0, 1e-12, d)
    q = np.clip(np.rint(x / d[:, None]) + 8, 0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 18), np.uint8)
    out[:, :2] = _f16(d).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def dequant_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    blocks = raw.reshape(-1, 18)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    qs = blocks[:, 2:]
    lo = (qs & 0xF).astype(np.float32) - 8
    hi = (qs >> 4).astype(np.float32) - 8
    x = np.concatenate([lo, hi], axis=1) * d
    return x.reshape(-1)[:n]


# ---------------------------------------------------------------- q4_1
def quantize_q4_1(w: np.ndarray) -> np.ndarray:
    """Asymmetric 4-bit: [d f16, m f16, 16B nibbles]; x = d*q + m."""
    x = w.reshape(-1, QK).astype(np.float32)
    mn = x.min(axis=1, keepdims=True)
    mx = x.max(axis=1, keepdims=True)
    d = (mx - mn) / 15.0
    d = np.where(d == 0, 1e-12, d)
    q = np.clip(np.trunc((x - mn) / d + 0.5), 0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 20), np.uint8)
    out[:, 0:2] = _f16(d[:, 0]).view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = _f16(mn[:, 0]).view(np.uint8).reshape(-1, 2)
    out[:, 4:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def dequant_q4_1(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 20)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    qs = b[:, 4:]
    lo = (qs & 0xF).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    return (np.concatenate([lo, hi], 1) * d + m).reshape(-1)[:n]


# ---------------------------------------------------------------- q5_0
def quantize_q5_0(w: np.ndarray) -> np.ndarray:
    """Full-range sym 5-bit: [d f16, qh 4B, 16B low nibbles]."""
    x = w.reshape(-1, QK).astype(np.float32)
    idx = np.abs(x).argmax(axis=1)
    extreme = x[np.arange(x.shape[0]), idx]
    d = extreme / -16.0
    d = np.where(d == 0, 1e-12, d)
    q = np.clip(np.trunc(x.astype(np.float64) / d[:, None] + 16.5),
                0, 31).astype(np.uint8)
    out = np.empty((x.shape[0], 22), np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(-1, 2)
    out[:, 2:6] = np.packbits((q >> 4).astype(np.uint8), axis=1,
                              bitorder="little")
    out[:, 6:] = (q[:, :16] & 0xF) | (q[:, 16:] << 4)
    return out.reshape(-1)


def dequant_q5_0(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 22)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    hb = np.unpackbits(b[:, 2:6], axis=1, bitorder="little")[:, :32]
    qs = b[:, 6:]
    lo = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.float32)
    q = lo + 16.0 * hb.astype(np.float32)
    return ((q - 16.0) * d).reshape(-1)[:n]


# ---------------------------------------------------------------- q5_1
def quantize_q5_1(w: np.ndarray) -> np.ndarray:
    """Asymmetric 5-bit: [d f16, m f16, qh 4B, 16B low nibbles]."""
    x = w.reshape(-1, QK).astype(np.float32)
    mn = x.min(axis=1, keepdims=True)
    mx = x.max(axis=1, keepdims=True)
    d = (mx - mn) / 31.0
    d = np.where(d == 0, 1e-12, d)
    q = np.clip(np.trunc((x - mn) / d + 0.5), 0, 31).astype(np.uint8)
    out = np.empty((x.shape[0], 24), np.uint8)
    out[:, 0:2] = _f16(d[:, 0]).view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = _f16(mn[:, 0]).view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = np.packbits((q >> 4).astype(np.uint8), axis=1,
                              bitorder="little")
    out[:, 8:] = (q[:, :16] & 0xF) | (q[:, 16:] << 4)
    return out.reshape(-1)


def dequant_q5_1(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 24)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    hb = np.unpackbits(b[:, 4:8], axis=1, bitorder="little")[:, :32]
    qs = b[:, 8:]
    lo = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.float32)
    q = lo + 16.0 * hb.astype(np.float32)
    return (q * d + m).reshape(-1)[:n]


# ---------------------------------------------------------------- q4_K
def _pack_scale_min_k4(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """(N, 8) 6-bit scales + (N, 8) 6-bit mins → (N, 12) bytes
    (llama.cpp get_scale_min_k4 inverse)."""
    N = sc.shape[0]
    out = np.zeros((N, 12), np.uint8)
    out[:, 0:4] = (sc[:, 0:4] & 63) | ((sc[:, 4:8] >> 4) << 6)
    out[:, 4:8] = (mn[:, 0:4] & 63) | ((mn[:, 4:8] >> 4) << 6)
    out[:, 8:12] = (sc[:, 4:8] & 0xF) | ((mn[:, 4:8] & 0xF) << 4)
    return out


def _unpack_scale_min_k4(b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    sc = np.empty((b.shape[0], 8), np.uint8)
    mn = np.empty((b.shape[0], 8), np.uint8)
    sc[:, 0:4] = b[:, 0:4] & 63
    mn[:, 0:4] = b[:, 4:8] & 63
    sc[:, 4:8] = (b[:, 8:12] & 0xF) | ((b[:, 0:4] >> 6) << 4)
    mn[:, 4:8] = (b[:, 8:12] >> 4) | ((b[:, 4:8] >> 6) << 4)
    return sc, mn


def quantize_q4_k(w: np.ndarray, scale=None, wmin=None, d_scale=None,
                  d_wmin=None) -> np.ndarray:
    """Asymmetric double-quant, 8 groups of 32 per super-block.

    Explicit ``scale/wmin/d_scale/d_wmin`` (tuned per-subgroup d̂/m̂ and
    supers, role of reference ``packing.py:788`` explicit branch) bypass
    the RTN derivation so tuned quantizers export verbatim."""
    x = w.reshape(-1, 8, 32).astype(np.float32)
    N = x.shape[0]
    if scale is not None:
        d_super, m_super, sc, mn = _explicit_subscales(
            scale, wmin, d_scale, d_wmin, N, 8, 63)
        # codes from the TUNED f32 d̂/m̂: the baked qdq sits exactly on
        # that grid, so rint recovers the tuned codes verbatim (reference
        # q3_k explicit branch semantics); only the supers round to f16
        d_hat = np.asarray(scale, np.float32).reshape(N, 8)
        m_hat = np.asarray(wmin, np.float32).reshape(N, 8)
    else:
        gmin = np.minimum(x.min(axis=2), 0.0)          # (N, 8)
        gmax = np.maximum(x.max(axis=2), 0.0)
        d_g = np.maximum((gmax - gmin) / 15.0, 1e-12)  # per-group scale
        m_g = -gmin                                    # ≥ 0
        d_super = np.maximum(d_g.max(axis=1) / 63.0, 1e-12)   # (N,)
        m_super = np.maximum(m_g.max(axis=1) / 63.0, 1e-12)
        sc = np.clip(np.rint(d_g / d_super[:, None]), 0, 63).astype(np.uint8)
        mn = np.clip(np.rint(m_g / m_super[:, None]), 0, 63).astype(np.uint8)
        # codes against the f16-rounded supers: what decode multiplies
        d_hat = sc * _f16(d_super).astype(np.float32)[:, None]
        m_hat = mn * _f16(m_super).astype(np.float32)[:, None]
    d_hat = np.where(d_hat == 0, 1e-12, d_hat)
    q = np.clip(np.rint((x + m_hat[:, :, None]) / d_hat[:, :, None]),
                0, 15).astype(np.uint8)            # (N, 8, 32)
    out = np.empty((N, 144), np.uint8)
    out[:, 0:2] = _f16(d_super).view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = _f16(m_super).view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = _pack_scale_min_k4(sc, mn)
    # qs: per 64-elem chunk j: qs[j*32+l] = L[j*64+l] | L[j*64+32+l]<<4
    L = q.reshape(N, 256)
    qs = np.empty((N, 128), np.uint8)
    for j in range(4):
        qs[:, j * 32:(j + 1) * 32] = (L[:, j * 64: j * 64 + 32]
                                      | (L[:, j * 64 + 32: j * 64 + 64] << 4))
    out[:, 16:] = qs
    return out.reshape(-1)


def dequant_q4_k(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 144)
    N = b.shape[0]
    d_super = b[:, 0:2].copy().view(np.float16).astype(np.float32)[:, 0]
    m_super = b[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    qs = b[:, 16:]
    L = np.empty((N, 256), np.uint8)
    for j in range(4):
        L[:, j * 64: j * 64 + 32] = qs[:, j * 32:(j + 1) * 32] & 0xF
        L[:, j * 64 + 32: j * 64 + 64] = qs[:, j * 32:(j + 1) * 32] >> 4
    L = L.reshape(N, 8, 32).astype(np.float32)
    d_hat = sc.astype(np.float32) * d_super[:, None]
    m_hat = mn.astype(np.float32) * m_super[:, None]
    x = L * d_hat[:, :, None] - m_hat[:, :, None]
    return x.reshape(-1)[:n]


# ---------------------------------------------------------------- q3_K
def quantize_q3_k(w: np.ndarray, scale=None, d_scale=None, **_) -> np.ndarray:
    """Symmetric 3-bit double-quant, 16 groups of 16, 6-bit signed
    sub-scales.  Layout [hmask 32B, qs 64B, scales 12B, d 2B]."""
    x = w.reshape(-1, 16, 16).astype(np.float32)
    N = x.shape[0]
    if scale is not None:
        d_super = np.asarray(d_scale, np.float32).reshape(N)
        d_super = np.where(d_super == 0, 1e-12, d_super)
        sc = np.clip(np.rint(np.asarray(scale, np.float32).reshape(N, 16)
                             / d_super[:, None]), -32, 31)
        # codes from the TUNED f32 d̂: the baked qdq sits exactly on that
        # grid (reference q3_k explicit branch, packing.py:738-742)
        d_hat = np.asarray(scale, np.float32).reshape(N, 16)
        d_hat = np.where(d_hat == 0, 1e-12, d_hat)
    else:
        amin = np.minimum(x.min(axis=2), 0.0)
        amax = np.maximum(x.max(axis=2), 0.0)
        extreme = np.where(-amin > amax, amin, amax)
        d_g = -extreme / 4.0                            # signed per-group
        gi = np.abs(d_g).argmax(axis=1)
        d_super = -d_g[np.arange(N), gi] / 32.0
        d_super = np.where(d_super == 0, 1e-12, d_super)
        sc = np.clip(np.rint(d_g / d_super[:, None]), -32, 31)
        d_hat = sc * _f16(d_super).astype(np.float32)[:, None]
        d_hat = np.where(d_hat == 0, 1e-12, d_hat)
    q = np.clip(np.rint(x / d_hat[:, :, None]), -4, 3) + 4
    L = q.reshape(N, 256).astype(np.uint8)

    out = np.empty((N, 110), np.uint8)
    # hmask: bit j of byte l = high bit of element j*32 + l
    Lc = L.reshape(N, 8, 32)
    hm = np.zeros((N, 32), np.uint8)
    for j in range(8):
        hm |= ((Lc[:, j] >> 2) << j).astype(np.uint8)
    out[:, 0:32] = hm
    # qs: 2-bit planes — byte (c, l) holds elems c*128 + k*32 + l at bit 2k
    low = (L & 3).reshape(N, 2, 4, 32)
    qs = np.zeros((N, 2, 32), np.uint8)
    for k in range(4):
        qs |= (low[:, :, k] << (2 * k)).astype(np.uint8)
    out[:, 32:96] = qs.reshape(N, 64)
    # scales: 16 x 6-bit (offset 32) into 12 bytes
    s6 = (sc + 32).astype(np.uint8)
    out[:, 96:104] = (s6[:, :8] & 0xF) | ((s6[:, 8:] & 0xF) << 4)
    hs = s6 >> 4
    out[:, 104:108] = (hs[:, 0:4] | (hs[:, 4:8] << 2)
                       | (hs[:, 8:12] << 4) | (hs[:, 12:16] << 6))
    out[:, 108:110] = _f16(d_super).view(np.uint8).reshape(-1, 2)
    return out.reshape(-1)


def dequant_q3_k(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 110)
    N = b.shape[0]
    hm, qs = b[:, 0:32], b[:, 32:96].reshape(N, 2, 32)
    d_super = b[:, 108:110].copy().view(np.float16).astype(np.float32)[:, 0]
    s6 = np.empty((N, 16), np.uint8)
    s6[:, :8] = b[:, 96:104] & 0xF
    s6[:, 8:] = b[:, 96:104] >> 4
    for j in range(16):
        s6[:, j] |= ((b[:, 104 + j % 4] >> (2 * (j // 4))) & 3) << 4
    sc = s6.astype(np.float32) - 32.0
    L = np.empty((N, 2, 4, 32), np.uint8)
    for k in range(4):
        L[:, :, k] = (qs >> (2 * k)) & 3
    L = L.reshape(N, 8, 32)
    for j in range(8):
        L[:, j] |= ((hm >> j) & 1) << 2
    Lf = L.reshape(N, 16, 16).astype(np.float32) - 4.0
    d_hat = sc * d_super[:, None]
    return (Lf * d_hat[:, :, None]).reshape(-1)[:n]


# ---------------------------------------------------------------- q5_K
def quantize_q5_k(w: np.ndarray, scale=None, wmin=None, d_scale=None,
                  d_wmin=None) -> np.ndarray:
    """Asymmetric 5-bit double-quant, 8 groups of 32 (q4_k + high bits).
    Layout [d 2B, dmin 2B, scales 12B, qh 32B, qs 128B]."""
    x = w.reshape(-1, 8, 32).astype(np.float32)
    N = x.shape[0]
    if scale is not None:
        d_super, m_super, sc, mn = _explicit_subscales(
            scale, wmin, d_scale, d_wmin, N, 8, 63)
        d_hat = np.asarray(scale, np.float32).reshape(N, 8)
        m_hat = np.asarray(wmin, np.float32).reshape(N, 8)
    else:
        gmin = np.minimum(x.min(axis=2), 0.0)
        gmax = np.maximum(x.max(axis=2), 0.0)
        d_g = np.maximum((gmax - gmin) / 31.0, 1e-12)
        m_g = -gmin
        d_super = np.maximum(d_g.max(axis=1) / 63.0, 1e-12)
        m_super = np.maximum(m_g.max(axis=1) / 63.0, 1e-12)
        sc = np.clip(np.rint(d_g / d_super[:, None]), 0, 63).astype(np.uint8)
        mn = np.clip(np.rint(m_g / m_super[:, None]), 0, 63).astype(np.uint8)
        d_hat = sc * _f16(d_super).astype(np.float32)[:, None]
        m_hat = mn * _f16(m_super).astype(np.float32)[:, None]
    d_hat = np.where(d_hat == 0, 1e-12, d_hat)
    L = np.clip(np.rint((x + m_hat[:, :, None]) / d_hat[:, :, None]),
                0, 31).astype(np.uint8)                # (N, 8, 32)
    out = np.empty((N, 176), np.uint8)
    out[:, 0:2] = _f16(d_super).view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = _f16(m_super).view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = _pack_scale_min_k4(sc, mn)
    qh = np.zeros((N, 32), np.uint8)
    for j in range(8):
        qh |= ((L[:, j] >> 4) << j).astype(np.uint8)
    out[:, 16:48] = qh
    # qs: byte (p, l) = sub 2p elem l low nibble | sub 2p+1 elem l << 4
    out[:, 48:] = (L[:, ::2] | ((L[:, 1::2] & 0xF) << 4)).reshape(N, 128)
    return out.reshape(-1)


def dequant_q5_k(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 176)
    N = b.shape[0]
    d_super = b[:, 0:2].copy().view(np.float16).astype(np.float32)[:, 0]
    m_super = b[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    qh, qs = b[:, 16:48], b[:, 48:].reshape(N, 4, 32)
    L = np.empty((N, 8, 32), np.uint8)
    L[:, ::2] = qs & 0xF
    L[:, 1::2] = qs >> 4
    for j in range(8):
        L[:, j] |= ((qh >> j) & 1) << 4
    d_hat = sc.astype(np.float32) * d_super[:, None]
    m_hat = mn.astype(np.float32) * m_super[:, None]
    x = L.astype(np.float32) * d_hat[:, :, None] - m_hat[:, :, None]
    return x.reshape(-1)[:n]


# ---------------------------------------------------------------- q6_K
def quantize_q6_k(w: np.ndarray, scale=None, d_scale=None, **_) -> np.ndarray:
    """Symmetric, 16 groups of 16, int8 sub-scales vs fp16 super scale."""
    x = w.reshape(-1, 16, 16).astype(np.float32)
    N = x.shape[0]
    if scale is not None:
        d_super = np.maximum(np.asarray(d_scale, np.float32).reshape(N),
                             1e-12)
        sc = np.clip(np.rint(np.asarray(scale, np.float32).reshape(N, 16)
                             / d_super[:, None]), -128, 127).astype(np.int8)
        # codes from the TUNED f32 d̂ (baked qdq sits exactly on it)
        d_hat = np.asarray(scale, np.float32).reshape(N, 16)
        d_hat = np.where(d_hat == 0, 1e-12, d_hat)
    else:
        amin = np.minimum(x.min(axis=2), 0.0)
        amax = np.maximum(x.max(axis=2), 0.0)
        extreme = np.where(-amin > amax, amin, amax)
        d_g = -extreme / 32.0                          # signed per-group
        d_super = np.maximum(np.abs(d_g).max(axis=1) / 127.0, 1e-12)
        sc = np.clip(np.rint(d_g / d_super[:, None]), -128, 127).astype(np.int8)
        d_hat = sc.astype(np.float32) * _f16(d_super).astype(np.float32)[:, None]
        d_hat = np.where(d_hat == 0, 1e-12, d_hat)
    q = np.clip(np.rint(x / d_hat[:, :, None]) + 32, 0, 63).astype(np.uint8)
    L = q.reshape(N, 256)
    out = np.empty((N, 210), np.uint8)
    # ql: low 4 bits — per 128-chunk j: ql[j*64+l] = (L[j*128+l]&0xF) | ((L[j*128+64+l]&0xF)<<4)
    ql = np.empty((N, 128), np.uint8)
    qh = np.empty((N, 64), np.uint8)
    for j in range(2):
        base = j * 128
        ql[:, j * 64:(j + 1) * 64] = ((L[:, base:base + 64] & 0xF)
                                      | ((L[:, base + 64:base + 128] & 0xF) << 4))
        # qh: 2-bit planes — qh[j*32+l] holds elems base+l, +32, +64, +96
        qh[:, j * 32:(j + 1) * 32] = (
            (L[:, base:base + 32] >> 4)
            | ((L[:, base + 32:base + 64] >> 4) << 2)
            | ((L[:, base + 64:base + 96] >> 4) << 4)
            | ((L[:, base + 96:base + 128] >> 4) << 6))
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = sc.view(np.uint8)
    out[:, 208:210] = _f16(d_super).view(np.uint8).reshape(-1, 2)
    return out.reshape(-1)


def dequant_q6_k(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 210)
    N = b.shape[0]
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    sc = b[:, 192:208].copy().view(np.int8).astype(np.float32)
    d_super = b[:, 208:210].copy().view(np.float16).astype(np.float32)[:, 0]
    L = np.empty((N, 256), np.uint8)
    for j in range(2):
        base = j * 128
        lo = ql[:, j * 64:(j + 1) * 64]
        h = qh[:, j * 32:(j + 1) * 32]
        L[:, base:base + 32] = (lo[:, :32] & 0xF) | ((h & 0x3) << 4)
        L[:, base + 32:base + 64] = (lo[:, 32:64] & 0xF) | (((h >> 2) & 0x3) << 4)
        L[:, base + 64:base + 96] = (lo[:, :32] >> 4) | (((h >> 4) & 0x3) << 4)
        L[:, base + 96:base + 128] = (lo[:, 32:64] >> 4) | (((h >> 6) & 0x3) << 4)
    Lf = L.reshape(N, 16, 16).astype(np.float32) - 32.0
    d_hat = sc.reshape(N, 16) * d_super[:, None]
    x = Lf * d_hat[:, :, None]
    return x.reshape(-1)[:n]


# ---------------------------------------------------------------- q2_K
def quantize_q2_k(w: np.ndarray, scale=None, wmin=None, d_scale=None,
                  d_wmin=None) -> np.ndarray:
    """Asymmetric 2-bit, 16 groups of 16, 4-bit sub scale/min."""
    x = w.reshape(-1, 16, 16).astype(np.float32)
    N = x.shape[0]
    if scale is not None:
        d_super, m_super, sc, mn = _explicit_subscales(
            scale, wmin, d_scale, d_wmin, N, 16, 15)
        d_hat = np.asarray(scale, np.float32).reshape(N, 16)
        d_hat = np.where(d_hat == 0, 1e-12, d_hat)
        m_hat = np.asarray(wmin, np.float32).reshape(N, 16)
    else:
        gmin = np.minimum(x.min(axis=2), 0.0)
        gmax = np.maximum(x.max(axis=2), 0.0)
        d_g = np.maximum((gmax - gmin) / 3.0, 1e-12)
        m_g = -gmin
        d_super = np.maximum(d_g.max(axis=1) / 15.0, 1e-12)
        m_super = np.maximum(m_g.max(axis=1) / 15.0, 1e-12)
        sc = np.clip(np.rint(d_g / d_super[:, None]), 0, 15).astype(np.uint8)
        mn = np.clip(np.rint(m_g / m_super[:, None]), 0, 15).astype(np.uint8)
        d16 = _f16(d_super).astype(np.float32)
        m16 = _f16(m_super).astype(np.float32)
        d_hat = np.where(sc == 0, 1e-12, sc * d16[:, None])
        m_hat = mn * m16[:, None]
    q = np.clip(np.rint((x + m_hat[:, :, None]) / d_hat[:, :, None]),
                0, 3).astype(np.uint8)
    out = np.empty((N, 84), np.uint8)
    out[:, 0:16] = sc | (mn << 4)
    # qs: 2-bit pack — per 128-chunk j, byte l holds elems l, l+32, l+64, l+96
    L = q.reshape(N, 256)
    qs = np.empty((N, 64), np.uint8)
    for j in range(2):
        base = j * 128
        qs[:, j * 32:(j + 1) * 32] = (
            L[:, base:base + 32]
            | (L[:, base + 32:base + 64] << 2)
            | (L[:, base + 64:base + 96] << 4)
            | (L[:, base + 96:base + 128] << 6))
    out[:, 16:80] = qs
    out[:, 80:82] = _f16(d_super).view(np.uint8).reshape(-1, 2)
    out[:, 82:84] = _f16(m_super).view(np.uint8).reshape(-1, 2)
    return out.reshape(-1)


def dequant_q2_k(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 84)
    N = b.shape[0]
    sc = (b[:, 0:16] & 0xF).astype(np.float32)
    mn = (b[:, 0:16] >> 4).astype(np.float32)
    qs = b[:, 16:80]
    d_super = b[:, 80:82].copy().view(np.float16).astype(np.float32)[:, 0]
    m_super = b[:, 82:84].copy().view(np.float16).astype(np.float32)[:, 0]
    L = np.empty((N, 256), np.uint8)
    for j in range(2):
        base = j * 128
        chunk = qs[:, j * 32:(j + 1) * 32]
        L[:, base:base + 32] = chunk & 0x3
        L[:, base + 32:base + 64] = (chunk >> 2) & 0x3
        L[:, base + 64:base + 96] = (chunk >> 4) & 0x3
        L[:, base + 96:base + 128] = (chunk >> 6) & 0x3
    Lf = L.reshape(N, 16, 16).astype(np.float32)
    x = (Lf * (sc * d_super[:, None])[:, :, None]
         - (mn * m_super[:, None])[:, :, None])
    return x.reshape(-1)[:n]


QUANTIZERS = {GGMLType.Q8_0: quantize_q8_0, GGMLType.Q4_0: quantize_q4_0,
              GGMLType.Q4_1: quantize_q4_1, GGMLType.Q5_0: quantize_q5_0,
              GGMLType.Q5_1: quantize_q5_1, GGMLType.Q3_K: quantize_q3_k,
              GGMLType.Q4_K: quantize_q4_k, GGMLType.Q5_K: quantize_q5_k,
              GGMLType.Q6_K: quantize_q6_k, GGMLType.Q2_K: quantize_q2_k}
DEQUANTIZERS = {GGMLType.Q8_0: dequant_q8_0, GGMLType.Q4_0: dequant_q4_0,
                GGMLType.Q4_1: dequant_q4_1, GGMLType.Q5_0: dequant_q5_0,
                GGMLType.Q5_1: dequant_q5_1, GGMLType.Q3_K: dequant_q3_k,
                GGMLType.Q4_K: dequant_q4_k, GGMLType.Q5_K: dequant_q5_k,
                GGMLType.Q6_K: dequant_q6_k, GGMLType.Q2_K: dequant_q2_k}


# ------------------------------------------------------------- container
_GGUF_MAGIC = 0x46554747
_T_U32, _T_I32, _T_F32, _T_STR, _T_ARR, _T_U64 = 4, 5, 6, 8, 9, 10


def _w_str(f, s: str):
    b = s.encode()
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


def _w_scalar(f, vtype: int, value):
    if vtype == _T_U32:
        f.write(struct.pack("<I", value))
    elif vtype == _T_I32:
        f.write(struct.pack("<i", value))
    elif vtype == _T_F32:
        f.write(struct.pack("<f", value))
    elif vtype == _T_U64:
        f.write(struct.pack("<Q", value))
    elif vtype == _T_STR:
        _w_str(f, value)
    else:
        raise ValueError(vtype)


def _w_kv(f, key: str, vtype: int, value):
    _w_str(f, key)
    f.write(struct.pack("<I", vtype))
    if vtype == _T_ARR:
        elem_type, items = value  # (scalar type, list)
        f.write(struct.pack("<IQ", elem_type, len(items)))
        for it in items:
            _w_scalar(f, elem_type, it)
    else:
        _w_scalar(f, vtype, value)


def write_gguf(path: str, metadata: List[Tuple[str, int, Any]],
               tensors: List[Tuple[str, Tuple[int, ...], int, np.ndarray]],
               alignment: int = 32) -> None:
    """tensors: (name, ne_dims fastest-first, ggml_type, raw bytes/array)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<IIQQ", _GGUF_MAGIC, 3, len(tensors),
                            len(metadata) + 1))
        _w_kv(f, "general.alignment", _T_U32, alignment)
        for key, vtype, value in metadata:
            _w_kv(f, key, vtype, value)
        # tensor infos
        offset = 0
        infos = []
        for name, ne, ttype, raw in tensors:
            infos.append((name, ne, ttype, offset))
            nbytes = raw.nbytes
            offset += -(-nbytes // alignment) * alignment
        for name, ne, ttype, off in infos:
            _w_str(f, name)
            f.write(struct.pack("<I", len(ne)))
            for d in ne:
                f.write(struct.pack("<Q", d))
            f.write(struct.pack("<IQ", ttype, off))
        # align data section
        pos = f.tell()
        pad = (-pos) % alignment
        f.write(b"\x00" * pad)
        for name, ne, ttype, raw in tensors:
            b = raw.tobytes()
            f.write(b)
            f.write(b"\x00" * ((-len(b)) % alignment))


def _use_more_bits(block_idx: int, n_blocks: int) -> bool:
    """llama.cpp's mixed-precision block rule: first/last 1/8 of blocks
    plus every 3rd middle block get more bits."""
    return (block_idx < n_blocks // 8
            or block_idx >= n_blocks - n_blocks // 8
            or block_idx % 3 == 2)


def select_layer_qtype(base_type: int, block_idx: int, n_blocks: int,
                       layer_kind: str, in_features: int,
                       n_gqa: int = 1, n_expert: int = 0,
                       has_imatrix: bool = False) -> int:
    """Per-layer type cascade following llama.cpp's
    ``llama_tensor_get_type`` as the reference reproduces it
    (``backends/gguf.py:485-617``, ``export_to_gguf/gguf_dtype.py``):

      * output / tied token_embd → at least Q6_K (Q8_0 stays)
      * attn_v — Q2_K base: Q4_K when GQA ≥ 4 else Q3_K; Q3_K: Q5_K for
        the first two blocks else Q4_K; Q4_K/Q5_K upgrade to Q6_K on
        more-bits blocks; 8-expert models pin Q8_0
      * attn_k (8-expert models) → Q8_0
      * ffn_down — Q2_K: Q3_K; Q3_K: Q5_K below n/16 else Q4_K;
        Q4_K/Q5_K → Q6_K on more-bits blocks; legacy Q4_0/Q5_0 with an
        imatrix → Q4_1/Q5_1 for the first n/8 blocks
      * attn_output — Q2_K: Q3_K; Q3_K: Q4_K; 8-expert low-bit → Q5_K
      * 256-indivisible rows fall back Q8_0 → F16
    """
    t = base_type
    if layer_kind in ("output", "token_embd"):
        if t != GGMLType.Q8_0:
            t = max(t, GGMLType.Q6_K)
    elif layer_kind == "attn_v":
        if base_type == GGMLType.Q2_K:
            t = GGMLType.Q4_K if n_gqa >= 4 else GGMLType.Q3_K
        elif base_type == GGMLType.Q3_K:
            t = GGMLType.Q5_K if block_idx < 2 else GGMLType.Q4_K
        elif base_type in (GGMLType.Q4_K, GGMLType.Q5_K) \
                and _use_more_bits(block_idx, n_blocks):
            t = GGMLType.Q6_K
        if n_expert == 8:
            t = GGMLType.Q8_0
    elif layer_kind == "attn_k" and n_expert == 8:
        t = GGMLType.Q8_0
    elif layer_kind == "ffn_down":
        if base_type == GGMLType.Q2_K:
            t = GGMLType.Q3_K
        elif base_type == GGMLType.Q3_K:
            t = (GGMLType.Q5_K if block_idx < n_blocks // 16
                 else GGMLType.Q4_K)
        elif base_type in (GGMLType.Q4_K, GGMLType.Q5_K) \
                and _use_more_bits(block_idx, n_blocks):
            t = GGMLType.Q6_K
        elif (base_type == GGMLType.Q4_0 and has_imatrix
              and block_idx < n_blocks // 8):
            t = GGMLType.Q4_1
        elif (base_type == GGMLType.Q5_0 and has_imatrix
              and block_idx < n_blocks // 8):
            t = GGMLType.Q5_1
    elif layer_kind == "attn_output":
        if n_expert == 8:
            if base_type in (GGMLType.Q2_K, GGMLType.Q3_K,
                             GGMLType.Q4_K):
                t = GGMLType.Q5_K
        elif base_type == GGMLType.Q2_K:
            t = GGMLType.Q3_K
        elif base_type == GGMLType.Q3_K:
            t = GGMLType.Q4_K
    if BLOCK_ELEMS.get(t) == QK_K and in_features % QK_K != 0:
        t = GGMLType.Q8_0 if in_features % QK == 0 else GGMLType.F16
    if BLOCK_ELEMS.get(t) == QK and in_features % QK != 0:
        t = GGMLType.F16
    return t


_GGUF_NAME = {
    "embed_tokens": "token_embd.weight",
    "norm": "output_norm.weight",
    "lm_head": "output.weight",
}
_GGUF_BLOCK_NAME = {
    "q_proj": "attn_q", "k_proj": "attn_k", "v_proj": "attn_v",
    "o_proj": "attn_output", "gate_proj": "ffn_gate", "up_proj": "ffn_up",
    "down_proj": "ffn_down", "input_layernorm": "attn_norm",
    "post_attention_layernorm": "ffn_norm",
}
# per-arch name deltas (llama.cpp conventions): gemma2 sandwich norms get
# their own slots; qwen3 carries per-head qk-norm gains; qwen2 has
# attention biases (handled as .bias leaves of the same kinds)
_ARCH_BLOCK_EXTRA = {
    "gemma2": {"post_attention_layernorm": "post_attention_norm",
               "pre_feedforward_layernorm": "ffn_norm",
               "post_feedforward_layernorm": "post_ffw_norm"},
    "qwen3": {"q_norm": "attn_q_norm", "k_norm": "attn_k_norm"},
    "qwen3moe": {"q_norm": "attn_q_norm", "k_norm": "attn_k_norm"},
    # gemma3 = gemma2 sandwich norms + qwen3-style per-head qk norms
    "gemma3": {"post_attention_layernorm": "post_attention_norm",
               "pre_feedforward_layernorm": "ffn_norm",
               "post_feedforward_layernorm": "post_ffw_norm",
               "q_norm": "attn_q_norm", "k_norm": "attn_k_norm"},
    # MLA slots (llama.cpp deepseek2 conversion names)
    "deepseek2": {"q_a_proj": "attn_q_a", "q_b_proj": "attn_q_b",
                  "q_a_layernorm": "attn_q_a_norm",
                  "kv_a_proj_with_mqa": "attn_kv_a_mqa",
                  "kv_a_layernorm": "attn_kv_a_norm",
                  "kv_b_proj": "attn_kv_b"},
    "gpt-oss": {"sinks": "attn_sinks"},
    # Qwen3-Next hybrid: full layers carry qk norms; GatedDeltaNet
    # linear layers map onto the llama.cpp ssm_* slots (qwen3next
    # conversion; A_log/dt_bias handled specially in the save loop)
    "qwen3next": {"q_norm": "attn_q_norm", "k_norm": "attn_k_norm",
                  "in_proj_qkvz": "ssm_in", "in_proj_ba": "ssm_beta_alpha",
                  "conv1d": "ssm_conv1d", "linear_norm": "ssm_norm",
                  "out_proj": "ssm_out"},
    # Qwen3.5-MoE: same tensor layout as qwen3next (QWEN35MOE arch,
    # ref conversion/qwen.py:625)
    "qwen35moe": {"q_norm": "attn_q_norm", "k_norm": "attn_k_norm",
                  "in_proj_qkvz": "ssm_in", "in_proj_ba": "ssm_beta_alpha",
                  "conv1d": "ssm_conv1d", "linear_norm": "ssm_norm",
                  "out_proj": "ssm_out"},
    # Qwen3-VL-MoE text decoder = qwen3moe layout (QWEN3VLMOE arch,
    # ref conversion/qwen3vl.py:272)
    "qwen3vlmoe": {"q_norm": "attn_q_norm", "k_norm": "attn_k_norm"},
    # Step-3.5 (STEP35 arch, ref conversion/step3.py:98): per-head
    # attention output gate
    "step35": {"g_proj": "attn_gate"},
    "glm4moe": {"q_norm": "attn_q_norm", "k_norm": "attn_k_norm"},
}
_BIAS_NAME = {"q_bias": "attn_q", "k_bias": "attn_k", "v_bias": "attn_v",
              "o_bias": "attn_output",
              # qwen3next GatedDeltaNet per-head dt bias
              "dt_bias": "ssm_dt"}


def gguf_arch(model_cfg) -> str:
    """llama.cpp architecture id for a model config (enum names at the
    reference's pinned conversion commit,
    ``export_to_gguf/LLAMA_CPP_CONVERSION_COMMIT``)."""
    name = type(model_cfg).__name__
    by_cls = {"DeepseekConfig": "deepseek2", "Glm4MoeConfig": "glm4moe",
              # GLM-4.6-Lite / GLM-5 convert as DEEPSEEK2 trunks
              # (ref conversion/glm.py:204; the GLM-5 DSA indexer has no
              # stable mapping — dropped with a warning on save)
              "GlmMoeLiteConfig": "deepseek2",
              "GlmMoeDsaConfig": "deepseek2",
              "GptOssConfig": "gpt-oss", "Llama4Config": "llama4",
              "Qwen3NextConfig": "qwen3next",
              "Qwen35MoeConfig": "qwen35moe",
              "Mistral3Config": "mistral3",
              "Step35Config": "step35",
              "Qwen3VLMoeConfig": "qwen3vlmoe",
              # VLM text decoders (vision rides a separate mmproj file,
              # llama.cpp convention; ref conversion/qwenvl.py:21 ->
              # QWEN2VL, conversion/glm.py:244 Glm4vMoe -> GLM4_MOE)
              "Qwen2VLConfig": "qwen2vl",
              "Qwen25VLConfig": "qwen2vl",
              "Qwen25OmniConfig": "qwen2vl",
              "Qwen3OmniConfig": "qwen3vlmoe",
              "Glm4vMoeConfig": "glm4moe",
              "DeepseekVLConfig": "deepseek2"}
    if name in by_cls:
        return by_cls[name]
    if name == "Ernie45Config":
        return ("ernie4_5-moe"
                if getattr(model_cfg, "moe_num_experts", 0)
                else "ernie4_5")
    if name == "MiniMaxConfig":
        # MiniMax-M1 lightning attention has no llama.cpp architecture;
        # the reference likewise converts only MiniMax-M2 (standard
        # attention, conversion/minimax.py)
        raise NotImplementedError(
            "GGUF export: MiniMax-M1 lightning attention has no "
            "llama.cpp architecture (the reference converts MiniMax-M2 "
            "only)")
    if name == "LongcatConfig":
        raise NotImplementedError(
            "GGUF export: LongCat-Flash (ScMoE shortcut + "
            "zero-computation experts) has no llama.cpp architecture — "
            "the reference ships no longcat converter either "
            "(export_to_gguf/conversion/)")
    if name == "MllamaConfig":
        raise NotImplementedError(
            "GGUF export: Mllama's gated cross-attention text decoder "
            "has no llama.cpp architecture (the reference ships no "
            "mllama converter)")
    if name == "MixtralConfig":
        return ("qwen3moe" if getattr(model_cfg, "qk_norm", False)
                else "qwen2moe" if getattr(
                    model_cfg, "shared_expert_intermediate", 0)
                else "llama")  # Mixtral exports under the llama arch
                               # with llama.expert_count metadata
    if getattr(model_cfg, "rope_local_theta", 0.0):
        return "gemma3"
    if getattr(model_cfg, "qk_norm", False):
        return "qwen3"
    if getattr(model_cfg, "sandwich_norms", False):
        return "gemma2"
    if getattr(model_cfg, "attn_bias", False):
        return "qwen2"
    return "llama"


def tokenizer_payload_from_hf(path: str) -> Optional[Dict[str, Any]]:
    """Extract a GGUF tokenizer payload from an HF checkpoint directory
    (role of the reference converter's tokenizer emission,
    ``export_to_gguf/convert.py``): ``tokenizer.json`` (BPE → gpt2-style)
    or ``tokenizer.model`` (sentencepiece → llama-style).  Returns None
    when neither is readable."""
    tj = os.path.join(path, "tokenizer.json")
    if os.path.exists(tj):
        with open(tj, encoding="utf-8") as f:
            data = json.load(f)
        model = data.get("model", {})
        if model.get("type") == "BPE":
            vocab = model.get("vocab", {})
            n = max(vocab.values()) + 1 if vocab else 0
            tokens = [""] * n
            for t, i in vocab.items():
                tokens[i] = t
            # added tokens may extend past the base vocab
            for at in data.get("added_tokens", []):
                i = at["id"]
                if i >= len(tokens):
                    tokens.extend([""] * (i + 1 - len(tokens)))
                tokens[i] = at["content"]
            merges = [" ".join(m) if isinstance(m, list) else m
                      for m in model.get("merges", [])]
            # token types: 1=normal, 3=control (added special)
            ttype = [1] * len(tokens)
            for at in data.get("added_tokens", []):
                if at.get("special"):
                    ttype[at["id"]] = 3
            payload: Dict[str, Any] = {"model": "gpt2", "tokens": tokens,
                                       "merges": merges,
                                       "token_type": ttype}
            _attach_special_ids(path, payload, tokens)
            return payload
    tm = os.path.join(path, "tokenizer.model")
    if os.path.exists(tm):
        try:
            import sentencepiece as spm
            sp = spm.SentencePieceProcessor(model_file=tm)
            n = sp.get_piece_size()
            tokens = [sp.id_to_piece(i) for i in range(n)]
            scores = [sp.get_score(i) for i in range(n)]
            ttype = []
            for i in range(n):
                if sp.is_control(i):
                    ttype.append(3)
                elif sp.is_unknown(i):
                    ttype.append(2)
                elif sp.is_byte(i):
                    ttype.append(6)
                else:
                    ttype.append(1)
            payload = {"model": "llama", "tokens": tokens, "scores": scores,
                       "token_type": ttype}
            _attach_special_ids(path, payload, tokens)
            return payload
        except Exception as e:  # sentencepiece missing / corrupt file
            logger.warning("tokenizer.model unreadable (%s); GGUF will "
                           "carry no tokenizer", e)
    return None


def _attach_special_ids(path: str, payload: Dict[str, Any],
                        tokens: List[str]) -> None:
    ids = {}
    cfg_p = os.path.join(path, "config.json")
    if os.path.exists(cfg_p):
        with open(cfg_p) as f:
            c = json.load(f)
        for k in ("bos_token_id", "eos_token_id"):
            if isinstance(c.get(k), int):
                ids[k[:3]] = c[k]
    tc_p = os.path.join(path, "tokenizer_config.json")
    if os.path.exists(tc_p) and len(ids) < 2:
        with open(tc_p, encoding="utf-8") as f:
            tc = json.load(f)
        for name, key in (("bos_token", "bos"), ("eos_token", "eos")):
            tok = tc.get(name)
            if isinstance(tok, dict):
                tok = tok.get("content")
            if isinstance(tok, str) and tok in tokens and key not in ids:
                ids[key] = tokens.index(tok)
    payload.update(ids)


def tokenizer_metadata(tok: Dict[str, Any]) -> List[Tuple[str, int, Any]]:
    """Build tokenizer KV entries from a payload dict:
    {"model": "llama"|"gpt2", "tokens": [str], "scores": [float]?,
     "token_type": [int]?, "merges": [str]?, "bos": int?, "eos": int?}."""
    kvs: List[Tuple[str, int, Any]] = [
        ("tokenizer.ggml.model", _T_STR, tok.get("model", "llama")),
        ("tokenizer.ggml.tokens", _T_ARR, (_T_STR, list(tok["tokens"]))),
    ]
    if "scores" in tok:
        kvs.append(("tokenizer.ggml.scores", _T_ARR,
                    (_T_F32, [float(s) for s in tok["scores"]])))
    if "token_type" in tok:
        kvs.append(("tokenizer.ggml.token_type", _T_ARR,
                    (_T_I32, [int(t) for t in tok["token_type"]])))
    if "merges" in tok:
        kvs.append(("tokenizer.ggml.merges", _T_ARR,
                    (_T_STR, list(tok["merges"]))))
    for name, key in (("bos", "tokenizer.ggml.bos_token_id"),
                      ("eos", "tokenizer.ggml.eos_token_id")):
        if name in tok:
            kvs.append((key, _T_U32, int(tok[name])))
    return kvs


# per-type (bits, group_size, super_group_size, super_bits, sym): a tuned
# dq layer's extras pass through verbatim only when they sit on the same
# byte grid the GGUF type stores
_TYPE_GRID = {
    GGMLType.Q2_K: (2, 16, 16, 4, False),
    GGMLType.Q3_K: (3, 16, 16, 6, True),
    GGMLType.Q4_K: (4, 32, 8, 6, False),
    GGMLType.Q5_K: (5, 32, 8, 6, False),
    GGMLType.Q6_K: (6, 16, 16, 8, True),
}


def _tuned_payload(ql, t: int) -> Optional[Dict[str, np.ndarray]]:
    """Extract explicit packer kwargs from a tuned QuantizedLayer when its
    scheme's dq grid matches GGUF type ``t`` (else None → RTN repack)."""
    ex = getattr(ql, "extras", None)
    grid = _TYPE_GRID.get(t)
    if ex is None or grid is None or "d_super" not in ex:
        return None
    bits = getattr(ql.scheme, "bits", None)
    if (bits, ex.get("group_size"), ex.get("super_group_size"),
            ex.get("super_bits"), ex.get("sym")) != grid:
        return None
    out = {"scale": np.asarray(ex["d_hat"], np.float32),
           "d_scale": np.asarray(ex["d_super"], np.float32)}
    if not grid[4]:
        if "m_hat" not in ex:
            return None
        out["wmin"] = np.asarray(ex["m_hat"], np.float32)
        out["d_wmin"] = np.asarray(ex["m_super"], np.float32)
    return out


_T_BY_CODE = {4: "<I", 5: "<i", 6: "<f", 10: "<Q",
              0: "<B", 1: "<b", 2: "<H", 3: "<h", 7: "<?",
              11: "<q", 12: "<d"}


def read_gguf(path: str):
    """Parse a GGUF v3 file → (metadata dict, {name: (ne, ggml_type, raw
    uint8 bytes)}).  Inverse of :func:`write_gguf` (role of the
    reference's GGUF eval loader, ``eval/evaluation.py:187-255``, which
    defers to gguf-py; this one reads the container directly)."""
    with open(path, "rb") as f:
        magic, version, n_tensors, n_kv = struct.unpack("<IIQQ", f.read(24))
        if magic != _GGUF_MAGIC:
            raise ValueError(f"{path} is not a GGUF file")

        def rstr():
            (n,) = struct.unpack("<Q", f.read(8))
            return f.read(n).decode()

        def rval(t):
            if t == _T_STR:
                return rstr()
            if t == _T_ARR:
                et, n = struct.unpack("<IQ", f.read(12))
                return [rval(et) for _ in range(n)]
            fmt = _T_BY_CODE[t]
            return struct.unpack(fmt, f.read(struct.calcsize(fmt)))[0]

        meta: Dict[str, Any] = {}
        for _ in range(n_kv):
            k = rstr()
            (t,) = struct.unpack("<I", f.read(4))
            meta[k] = rval(t)
        align = int(meta.get("general.alignment", 32))
        infos = []
        for _ in range(n_tensors):
            nm = rstr()
            (nd,) = struct.unpack("<I", f.read(4))
            ne = struct.unpack(f"<{nd}Q", f.read(8 * nd))
            tt, off = struct.unpack("<IQ", f.read(12))
            infos.append((nm, ne, tt, off))
        base = f.tell()
        base += (-base) % align
        tensors = {}
        for nm, ne, tt, off in infos:
            n_el = int(np.prod(ne))
            if tt in BLOCK_BYTES:
                nbytes = n_el // BLOCK_ELEMS[tt] * BLOCK_BYTES[tt]
            elif tt == GGMLType.F32:
                nbytes = n_el * 4
            elif tt == GGMLType.F16:
                nbytes = n_el * 2
            else:
                raise ValueError(f"unsupported ggml type {tt} for {nm}")
            f.seek(base + off)
            tensors[nm] = (ne, tt, np.frombuffer(f.read(nbytes), np.uint8))
    return meta, tensors


def dequant_tensor(ne, ttype: int, raw: np.ndarray) -> np.ndarray:
    """Raw GGUF tensor bytes → float32 array in this repo's (O, I) layout
    (GGUF ne is fastest-first: a 2-D tensor stores ne=(I, O))."""
    n_el = int(np.prod(ne))
    if ttype == GGMLType.F32:
        arr = raw.view(np.float32)[:n_el]
    elif ttype == GGMLType.F16:
        arr = raw.view(np.float16)[:n_el].astype(np.float32)
    else:
        arr = DEQUANTIZERS[ttype](raw, n_el)
    if len(ne) == 2:
        return np.asarray(arr, np.float32).reshape(ne[1], ne[0])
    return np.asarray(arr, np.float32).reshape(tuple(reversed(ne)))


_GGUF_BLOCK_INV = {v: k for k, v in _GGUF_BLOCK_NAME.items()}


def _mk_get(tensors, dtype):
    import jax.numpy as jnp

    def get(nm):
        ne, tt, raw = tensors[nm]
        return jnp.asarray(dequant_tensor(ne, tt, raw), dtype)

    def getf32(nm):
        ne, tt, raw = tensors[nm]
        return jnp.asarray(dequant_tensor(ne, tt, raw), jnp.float32)
    return get, getf32


def _load_exps(tensors, get, bi, E, proj_keys=("gate_proj", "up_proj",
                                              "down_proj")):
    """ffn_{gate,up,down}_exps 3-D stacks → per-expert weight trees
    (plus stacked f32 biases for gpt-oss exports)."""
    import jax.numpy as jnp
    stacks = {k: get(f"blk.{bi}.ffn_{g}_exps.weight")
              for k, g in zip(proj_keys, ("gate", "up", "down"))}
    experts = [{k: stacks[k][e] for k in proj_keys} for e in range(E)]
    for k, g in zip(("gate_bias", "up_bias", "down_bias"),
                    ("gate", "up", "down")):
        nm = f"blk.{bi}.ffn_{g}_exps.bias"
        if nm in tensors:
            ne, tt, raw = tensors[nm]
            b = dequant_tensor(ne, tt, raw).reshape(E, -1)
            for e in range(E):
                experts[e][k] = jnp.asarray(b[e], jnp.float32)
    return experts


def _load_deepseek2(meta, tensors, dtype):
    """deepseek2 loadback: MLA attention slots + dense-leading MoE."""
    import jax.numpy as jnp  # noqa: F811
    from ..models.deepseek import DeepseekConfig
    a = "deepseek2"
    L = int(meta[f"{a}.block_count"])
    nh = int(meta[f"{a}.attention.head_count"])
    dr = int(meta.get(f"{a}.rope.dimension_count", 0))
    get, getf32 = _mk_get(tensors, dtype)
    kv_b = tensors.get("blk.0.attn_kv_b.weight")
    r = int(meta.get(f"{a}.attention.kv_lora_rank", 0))
    # v_head/nope dims from the kv_b shape: (nh*(dn+dv), r); the llama
    # convention stores dn == dv for every published deepseek
    dn_dv = (kv_b[0][1] // nh) if kv_b else 128
    dn = dv = dn_dv // 2
    cfg = DeepseekConfig(
        vocab_size=int(meta[f"{a}.vocab_size"]),
        hidden_size=int(meta[f"{a}.embedding_length"]),
        intermediate_size=int(meta[f"{a}.feed_forward_length"]),
        num_layers=L, num_heads=nh, num_kv_heads=nh,
        rope_theta=float(meta.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(meta.get(
            f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        q_lora_rank=int(meta.get(f"{a}.attention.q_lora_rank", 0)),
        kv_lora_rank=r, qk_nope_head_dim=dn, qk_rope_head_dim=dr,
        v_head_dim=dv,
        n_routed_experts=int(meta.get(f"{a}.expert_count", 0)),
        num_experts_per_tok=int(meta.get(f"{a}.expert_used_count", 0)),
        moe_intermediate_size=int(meta.get(
            f"{a}.expert_feed_forward_length", 0)),
        n_shared_experts=int(meta.get(f"{a}.expert_shared_count", 0)),
        first_k_dense=int(meta.get(f"{a}.leading_dense_block_count", 0)),
        routed_scaling_factor=float(meta.get(
            f"{a}.expert_weights_scale", 1.0)),
        scoring_func=("sigmoid" if int(meta.get(
            f"{a}.expert_gating_func", 1)) == 2 else "softmax"),
        norm_topk_prob=bool(int(meta.get(
            f"{a}.expert_weights_norm", 0))),
        tie_embeddings="output.weight" not in tensors,
        dtype=dtype)
    params = {"embed_tokens": get("token_embd.weight"),
              "norm": get("output_norm.weight"), "blocks": []}
    if "output.weight" in tensors:
        params["lm_head"] = get("output.weight")
    mla = {"attn_q_a": "q_a_proj", "attn_q_b": "q_b_proj",
           "attn_q": "q_proj", "attn_q_a_norm": "q_a_layernorm",
           "attn_kv_a_mqa": "kv_a_proj_with_mqa",
           "attn_kv_a_norm": "kv_a_layernorm", "attn_kv_b": "kv_b_proj",
           "attn_output": "o_proj", "attn_norm": "input_layernorm",
           "ffn_norm": "post_attention_layernorm",
           "ffn_gate": "gate_proj", "ffn_up": "up_proj",
           "ffn_down": "down_proj"}
    for bi in range(L):
        blk = {}
        for gk, ours in mla.items():
            nm = f"blk.{bi}.{gk}.weight"
            if nm in tensors:
                blk[ours] = get(nm)
        if f"blk.{bi}.ffn_gate_inp.weight" in tensors:
            blk["gate"] = get(f"blk.{bi}.ffn_gate_inp.weight")
            blk["experts"] = _load_exps(tensors, get, bi,
                                        cfg.n_routed_experts)
            shex = f"blk.{bi}.ffn_gate_shexp.weight"
            if shex in tensors:
                blk["shared_experts"] = {
                    k: get(f"blk.{bi}.ffn_{g}_shexp.weight")
                    for k, g in (("gate_proj", "gate"), ("up_proj", "up"),
                                 ("down_proj", "down"))}
            nm = f"blk.{bi}.exp_probs_b.bias"
            if nm in tensors:
                blk["e_score_correction_bias"] = getf32(nm)
        params["blocks"].append(blk)
    return params, cfg


def _load_gptoss(meta, tensors, dtype):
    import jax.numpy as jnp  # noqa: F811
    from ..models.gptoss import GptOssConfig
    a = "gpt-oss"
    L = int(meta[f"{a}.block_count"])
    get, getf32 = _mk_get(tensors, dtype)
    E = int(meta.get(f"{a}.expert_count", 0))
    cfg = GptOssConfig(
        vocab_size=int(meta[f"{a}.vocab_size"]),
        hidden_size=int(meta[f"{a}.embedding_length"]),
        intermediate_size=int(meta[f"{a}.feed_forward_length"]),
        num_layers=L,
        num_heads=int(meta[f"{a}.attention.head_count"]),
        num_kv_heads=int(meta[f"{a}.attention.head_count_kv"]),
        head_dim=int(meta.get(f"{a}.attention.key_length", 0)) or None,
        rope_theta=float(meta.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(meta.get(
            f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        sliding_window=int(meta.get(
            f"{a}.attention.sliding_window", 0)) or None,
        num_experts=E,
        top_k=int(meta.get(f"{a}.expert_used_count", 0)),
        tie_embeddings="output.weight" not in tensors,
        attn_bias=True, dtype=dtype)
    params = {"embed_tokens": get("token_embd.weight"),
              "norm": get("output_norm.weight"), "blocks": []}
    if "output.weight" in tensors:
        params["lm_head"] = get("output.weight")
    names = {"attn_q": "q_proj", "attn_k": "k_proj", "attn_v": "v_proj",
             "attn_output": "o_proj", "attn_norm": "input_layernorm",
             "ffn_norm": "post_attention_layernorm"}
    biases = {"attn_q": "q_bias", "attn_k": "k_bias", "attn_v": "v_bias",
              "attn_output": "o_bias"}
    for bi in range(L):
        blk = {}
        for gk, ours in names.items():
            blk[ours] = get(f"blk.{bi}.{gk}.weight")
        for gk, ours in biases.items():
            nm = f"blk.{bi}.{gk}.bias"
            if nm in tensors:
                blk[ours] = get(nm)
        nm = f"blk.{bi}.attn_sinks.weight"
        if nm in tensors:
            blk["sinks"] = getf32(nm)
        blk["router"] = get(f"blk.{bi}.ffn_gate_inp.weight")
        nm = f"blk.{bi}.ffn_gate_inp.bias"
        if nm in tensors:
            blk["router_bias"] = getf32(nm)
        blk["experts"] = _load_exps(tensors, get, bi, E)
        params["blocks"].append(blk)
    return params, cfg


def _load_llama4(meta, tensors, dtype):
    import jax.numpy as jnp  # noqa: F811
    from ..models.llama4 import Llama4Config
    a = "llama4"
    L = int(meta[f"{a}.block_count"])
    get, _getf32 = _mk_get(tensors, dtype)
    E = int(meta.get(f"{a}.expert_count", 0))
    step = int(meta.get(f"{a}.interleave_moe_layer_step", 1)) or 1
    start = int(meta.get(f"{a}.moe_layer_start", 0))
    moe_layers = tuple(range(start, L, step)) if E else ()
    nri = int(meta.get(f"{a}.no_rope_layer_interval", 0))
    no_rope = tuple(0 if nri and (i + 1) % nri == 0 else 1
                    for i in range(L))
    layer_types = tuple(
        "full_attention" if nri and (i + 1) % nri == 0
        else "sliding_attention" for i in range(L)) if nri else None
    cfg = Llama4Config(
        vocab_size=int(meta[f"{a}.vocab_size"]),
        hidden_size=int(meta[f"{a}.embedding_length"]),
        intermediate_size=int(meta.get(
            f"{a}.expert_feed_forward_length",
            meta[f"{a}.feed_forward_length"])),
        intermediate_size_mlp=int(meta[f"{a}.feed_forward_length"]),
        num_layers=L,
        num_heads=int(meta[f"{a}.attention.head_count"]),
        num_kv_heads=int(meta[f"{a}.attention.head_count_kv"]),
        rope_theta=float(meta.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(meta.get(
            f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        num_experts=E,
        top_k=int(meta.get(f"{a}.expert_used_count", 1)),
        moe_layers=moe_layers,
        sliding_window=int(meta.get(
            f"{a}.attention.sliding_window", 0)) or None,
        no_rope_layers=no_rope,
        layer_types=layer_types,
        tie_embeddings="output.weight" not in tensors,
        dtype=dtype)
    params = {"embed_tokens": get("token_embd.weight"),
              "norm": get("output_norm.weight"), "blocks": []}
    if "output.weight" in tensors:
        params["lm_head"] = get("output.weight")
    names = {"attn_q": "q_proj", "attn_k": "k_proj", "attn_v": "v_proj",
             "attn_output": "o_proj", "attn_norm": "input_layernorm",
             "ffn_norm": "post_attention_layernorm",
             "ffn_gate": "gate_proj", "ffn_up": "up_proj",
             "ffn_down": "down_proj"}
    for bi in range(L):
        blk = {}
        for gk, ours in names.items():
            nm = f"blk.{bi}.{gk}.weight"
            if nm in tensors:
                blk[ours] = get(nm)
        if f"blk.{bi}.ffn_gate_inp.weight" in tensors:
            blk["router"] = get(f"blk.{bi}.ffn_gate_inp.weight")
            blk["experts"] = _load_exps(tensors, get, bi, E)
            shex = f"blk.{bi}.ffn_gate_shexp.weight"
            if shex in tensors:
                blk["shared_expert"] = {
                    k: get(f"blk.{bi}.ffn_{g}_shexp.weight")
                    for k, g in (("gate_proj", "gate"), ("up_proj", "up"),
                                 ("down_proj", "down"))}
        params["blocks"].append(blk)
    return params, cfg


def _load_qwen3next(meta, tensors, dtype, a: str):
    """qwen3next / qwen35moe loadback: hybrid GatedDeltaNet + MoE."""
    import jax.numpy as jnp  # noqa: F811
    import numpy as _np
    from ..models.qwen3next import Qwen35MoeConfig, Qwen3NextConfig
    L = int(meta[f"{a}.block_count"])
    get, getf32 = _mk_get(tensors, dtype)
    layer_types = tuple(
        "linear_attention" if f"blk.{bi}.ssm_in.weight" in tensors
        else "full_attention" for bi in range(L))
    E = int(meta.get(f"{a}.expert_count", 0))
    moe_layers = {bi for bi in range(L)
                  if f"blk.{bi}.ffn_gate_exps.weight" in tensors}
    cls = Qwen35MoeConfig if a == "qwen35moe" else Qwen3NextConfig
    hd_meta = meta.get(f"{a}.attention.key_length")
    hidden = int(meta[f"{a}.embedding_length"])
    nh = int(meta[f"{a}.attention.head_count"])
    cfg = cls(
        vocab_size=int(meta[f"{a}.vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(meta[f"{a}.feed_forward_length"]),
        moe_intermediate_size=int(meta.get(
            f"{a}.expert_feed_forward_length", 0)),
        num_layers=L, num_heads=nh,
        num_kv_heads=int(meta[f"{a}.attention.head_count_kv"]),
        head_dim=(int(hd_meta) if hd_meta is not None
                  and int(hd_meta) != hidden // nh else None),
        rope_theta=float(meta.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(meta.get(
            f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        tie_embeddings="output.weight" not in tensors,
        qk_norm=True, norm_offset=1.0,
        partial_rotary_factor=float(meta.get(
            f"{a}.rope.partial_rotary_factor", 0.25)),
        layer_types=layer_types,
        linear_num_key_heads=int(meta[f"{a}.linear_num_key_heads"]),
        linear_num_value_heads=int(meta[f"{a}.linear_num_value_heads"]),
        linear_key_head_dim=int(meta[f"{a}.linear_key_head_dim"]),
        linear_value_head_dim=int(meta[f"{a}.linear_value_head_dim"]),
        linear_conv_kernel_dim=int(meta[f"{a}.linear_conv_kernel_dim"]),
        num_experts=E,
        top_k=int(meta.get(f"{a}.expert_used_count", 0)),
        shared_expert_intermediate=int(meta.get(
            f"{a}.expert_shared_feed_forward_length", 0)),
        shared_expert_gate="blk.0.ffn_gate_inp_shexp.weight" in tensors,
        norm_topk_prob=True,
        mlp_only_layers=tuple(sorted(set(range(L)) - moe_layers))
        if E else (),
        dtype=dtype)

    def get_norm(nm):
        ne, tt, raw = tensors[nm]
        return jnp.asarray(dequant_tensor(ne, tt, raw) - 1.0, dtype)

    params = {"embed_tokens": get("token_embd.weight"),
              "norm": get_norm("output_norm.weight"), "blocks": []}
    if "output.weight" in tensors:
        params["lm_head"] = get("output.weight")
    for bi in range(L):
        p = f"blk.{bi}."
        b = {"input_layernorm": get_norm(p + "attn_norm.weight"),
             "post_attention_layernorm": get_norm(p + "ffn_norm.weight")}
        if layer_types[bi] == "linear_attention":
            b["in_proj_qkvz"] = get(p + "ssm_in.weight")
            b["in_proj_ba"] = get(p + "ssm_beta_alpha.weight")
            b["conv1d"] = get(p + "ssm_conv1d.weight")
            b["linear_norm"] = get(p + "ssm_norm.weight")  # not shifted
            b["out_proj"] = get(p + "ssm_out.weight")
            ne, tt, raw = tensors[p + "ssm_a.weight"]
            b["A_log"] = jnp.asarray(
                _np.log(-dequant_tensor(ne, tt, raw)), jnp.float32)
            ne, tt, raw = tensors[p + "ssm_dt.bias"]
            b["dt_bias"] = jnp.asarray(dequant_tensor(ne, tt, raw),
                                       jnp.float32)
        else:
            for g, ours in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                            ("attn_v", "v_proj"),
                            ("attn_output", "o_proj")):
                b[ours] = get(p + g + ".weight")
            b["q_norm"] = get_norm(p + "attn_q_norm.weight")
            b["k_norm"] = get_norm(p + "attn_k_norm.weight")
        if bi in moe_layers:
            b["experts"] = _load_exps(tensors, get, bi, E,
                                      proj_keys=("w1", "w3", "w2"))
            b["router"] = getf32(p + "ffn_gate_inp.weight")
            if p + "ffn_gate_shexp.weight" in tensors:
                b["shared_expert"] = {
                    w: get(p + f"ffn_{g}_shexp.weight")
                    for w, g in (("w1", "gate"), ("w3", "up"),
                                 ("w2", "down"))}
            if p + "ffn_gate_inp_shexp.weight" in tensors:
                b["shared_expert_gate"] = getf32(
                    p + "ffn_gate_inp_shexp.weight")
        else:
            for g, ours in (("ffn_gate", "gate_proj"), ("ffn_up",
                            "up_proj"), ("ffn_down", "down_proj")):
                if p + g + ".weight" in tensors:
                    b[ours] = get(p + g + ".weight")
        params["blocks"].append(b)
    return params, cfg


def _load_ernie_moe(meta, tensors, dtype):
    """ernie4_5-moe loadback (dense ernie4_5 rides the generic path)."""
    from ..models.ernie45 import Ernie45Config
    a = "ernie4_5-moe"
    L = int(meta[f"{a}.block_count"])
    get, getf32 = _mk_get(tensors, dtype)
    E = int(meta.get(f"{a}.expert_count", 0))
    mi = int(meta.get(f"{a}.expert_feed_forward_length", 0))
    shexp_w = int(meta.get(f"{a}.expert_shared_feed_forward_length", 0))
    hidden = int(meta[f"{a}.embedding_length"])
    nh = int(meta[f"{a}.attention.head_count"])
    hd_meta = meta.get(f"{a}.attention.key_length")
    cfg = Ernie45Config(
        vocab_size=int(meta[f"{a}.vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(meta[f"{a}.feed_forward_length"]),
        num_layers=L, num_heads=nh,
        num_kv_heads=int(meta[f"{a}.attention.head_count_kv"]),
        head_dim=(int(hd_meta) if hd_meta is not None
                  and int(hd_meta) != hidden // nh else None),
        rope_theta=float(meta.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(meta.get(
            f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        tie_embeddings="output.weight" not in tensors,
        moe_num_experts=E,
        moe_k=int(meta.get(f"{a}.expert_used_count", 0)),
        moe_intermediate_size=mi,
        moe_num_shared_experts=(shexp_w // mi if mi else 0),
        moe_layer_start_index=int(meta.get(
            f"{a}.leading_dense_block_count", 0)),
        moe_layer_interval=int(meta.get(
            f"{a}.interleave_moe_layer_step", 1)),
        dtype=dtype)
    params = {"embed_tokens": get("token_embd.weight"),
              "norm": get("output_norm.weight"), "blocks": []}
    if "output.weight" in tensors:
        params["lm_head"] = get("output.weight")
    for bi in range(L):
        p = f"blk.{bi}."
        b = {}
        for g, ours in _GGUF_BLOCK_INV.items():
            if p + g + ".weight" in tensors:
                b[ours] = get(p + g + ".weight")
        for g, ours in (("attn_q", "q_bias"), ("attn_k", "k_bias"),
                        ("attn_v", "v_bias")):
            if p + g + ".bias" in tensors:
                b[ours] = get(p + g + ".bias")
        if p + "ffn_gate_exps.weight" in tensors:
            b["experts"] = _load_exps(tensors, get, bi, E)
            b["router"] = getf32(p + "ffn_gate_inp.weight")
            if p + "exp_probs_b.bias" in tensors:
                b["e_score_correction_bias"] = getf32(
                    p + "exp_probs_b.bias")
            if p + "ffn_gate_shexp.weight" in tensors:
                b["shared_experts"] = {
                    f"{g}_proj": get(p + f"ffn_{g}_shexp.weight")
                    for g in ("gate", "up", "down")}
        params["blocks"].append(b)
    return params, cfg


def _load_glm4moe(meta, tensors, dtype):
    """glm4moe loadback (GLM-4.5 family): GQA partial-rotary attention
    with optional qk norms/biases + DeepSeek-style dense-leading MoE."""
    from ..models.glm4moe import Glm4MoeConfig
    a = "glm4moe"
    L = int(meta[f"{a}.block_count"])
    get, getf32 = _mk_get(tensors, dtype)
    E = int(meta.get(f"{a}.expert_count", 0))
    hidden = int(meta[f"{a}.embedding_length"])
    nh = int(meta[f"{a}.attention.head_count"])
    hd_meta = meta.get(f"{a}.attention.key_length")
    cfg = Glm4MoeConfig(
        vocab_size=int(meta[f"{a}.vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(meta[f"{a}.feed_forward_length"]),
        num_layers=L, num_heads=nh,
        num_kv_heads=int(meta[f"{a}.attention.head_count_kv"]),
        head_dim=(int(hd_meta) if hd_meta is not None
                  and int(hd_meta) != hidden // nh else None),
        rope_theta=float(meta.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(meta.get(
            f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        tie_embeddings="output.weight" not in tensors,
        attn_bias="blk.0.attn_q.bias" in tensors,
        qk_norm=bool(int(meta.get(f"{a}.attention.qk_norm", 0))),
        partial_rotary_factor=float(meta.get(
            f"{a}.rope.partial_rotary_factor", 0.5)),
        n_routed_experts=E,
        num_experts_per_tok=int(meta.get(f"{a}.expert_used_count", 0)),
        moe_intermediate_size=int(meta.get(
            f"{a}.expert_feed_forward_length", 0)),
        n_shared_experts=int(meta.get(f"{a}.expert_shared_count", 0)),
        first_k_dense=int(meta.get(f"{a}.leading_dense_block_count", 0)),
        routed_scaling_factor=float(meta.get(
            f"{a}.expert_weights_scale", 1.0)),
        scoring_func=("sigmoid" if int(meta.get(
            f"{a}.expert_gating_func", 1)) == 2 else "softmax"),
        norm_topk_prob=bool(int(meta.get(
            f"{a}.expert_weights_norm", 0))),
        dtype=dtype)
    params = {"embed_tokens": get("token_embd.weight"),
              "norm": get("output_norm.weight"), "blocks": []}
    if "output.weight" in tensors:
        params["lm_head"] = get("output.weight")
    for bi in range(L):
        p = f"blk.{bi}."
        b = {}
        for g, ours in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                        ("attn_v", "v_proj"), ("attn_output", "o_proj"),
                        ("attn_norm", "input_layernorm"),
                        ("ffn_norm", "post_attention_layernorm"),
                        ("attn_q_norm", "q_norm"),
                        ("attn_k_norm", "k_norm"),
                        ("ffn_gate", "gate_proj"), ("ffn_up", "up_proj"),
                        ("ffn_down", "down_proj")):
            if p + g + ".weight" in tensors:
                b[ours] = get(p + g + ".weight")
        for g, ours in (("attn_q", "q_bias"), ("attn_k", "k_bias"),
                        ("attn_v", "v_bias")):
            if p + g + ".bias" in tensors:
                b[ours] = get(p + g + ".bias")
        if p + "ffn_gate_exps.weight" in tensors:
            b["experts"] = _load_exps(tensors, get, bi, E)
            b["gate"] = getf32(p + "ffn_gate_inp.weight")
            if p + "exp_probs_b.bias" in tensors:
                b["e_score_correction_bias"] = getf32(
                    p + "exp_probs_b.bias")
            if p + "ffn_gate_shexp.weight" in tensors:
                b["shared_experts"] = {
                    f"{g}_proj": get(p + f"ffn_{g}_shexp.weight")
                    for g in ("gate", "up", "down")}
        params["blocks"].append(b)
    return params, cfg


def _load_step35(meta, tensors, dtype):
    """step35 loadback: hybrid full/sliding with per-type heads, MoE."""
    import jax.numpy as jnp  # noqa: F811
    from ..models.step35 import Step35Config
    a = "step35"
    L = int(meta[f"{a}.block_count"])
    get, getf32 = _mk_get(tensors, dtype)
    E = int(meta.get(f"{a}.expert_count", 0))
    lt = tuple((meta.get(f"{a}.layer_types") or "").split(",")) or None
    ml = tuple(int(i) for i in (meta.get(f"{a}.moe_layers") or "").split(
        ",") if i != "")
    hidden = int(meta[f"{a}.embedding_length"])
    nh = int(meta[f"{a}.attention.head_count"])
    hd_meta = meta.get(f"{a}.attention.key_length")
    cfg = Step35Config(
        vocab_size=int(meta[f"{a}.vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(meta[f"{a}.feed_forward_length"]),
        num_layers=L, num_heads=nh,
        num_kv_heads=int(meta[f"{a}.attention.head_count_kv"]),
        head_dim=(int(hd_meta) if hd_meta is not None
                  and int(hd_meta) != hidden // nh else None),
        rope_theta=float(meta.get(f"{a}.rope.freq_base", 10000.0)),
        rope_local_theta=float(meta.get(f"{a}.rope.freq_base_swa", 0.0)),
        rms_eps=float(meta.get(
            f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        tie_embeddings="output.weight" not in tensors,
        norm_offset=1.0, partial_rotary_factor=0.5,
        partial_rotary_factor_local=1.0,
        sliding_window=(int(meta[f"{a}.attention.sliding_window"])
                        if meta.get(f"{a}.attention.sliding_window")
                        else None),
        layer_types=lt if lt and lt[0] else None,
        swa_num_heads=int(meta.get(f"{a}.swa.head_count", 0)),
        swa_num_kv_heads=int(meta.get(f"{a}.swa.head_count_kv", 0)),
        moe_layers=ml, moe_num_experts=E,
        moe_top_k=int(meta.get(f"{a}.expert_used_count", 0)),
        moe_intermediate_size=int(meta.get(
            f"{a}.expert_feed_forward_length", 0)),
        share_expert_dim=int(meta.get(
            f"{a}.expert_shared_feed_forward_length", 0)),
        moe_router_scaling_factor=float(meta.get(
            f"{a}.expert_weights_scale", 1.0)),
        use_moe_router_bias="blk.%d.ffn_gate_inp.bias" % (
            ml[0] if ml else 0) in tensors,
        swiglu_limit=float(meta.get(f"{a}.swiglu_clamp_exp", 0.0)),
        swiglu_limit_shared=float(meta.get(
            f"{a}.swiglu_clamp_shexp", 0.0)),
        dtype=dtype)

    def get_norm(nm):
        ne, tt, raw = tensors[nm]
        return jnp.asarray(dequant_tensor(ne, tt, raw) - 1.0, dtype)

    params = {"embed_tokens": get("token_embd.weight"),
              "norm": get_norm("output_norm.weight"), "blocks": []}
    if "output.weight" in tensors:
        params["lm_head"] = get("output.weight")
    for bi in range(L):
        p = f"blk.{bi}."
        b = {"input_layernorm": get_norm(p + "attn_norm.weight"),
             "post_attention_layernorm": get_norm(p + "ffn_norm.weight")}
        for g, ours in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                        ("attn_v", "v_proj"), ("attn_output", "o_proj"),
                        ("attn_gate", "g_proj"), ("ffn_gate", "gate_proj"),
                        ("ffn_up", "up_proj"), ("ffn_down", "down_proj")):
            if p + g + ".weight" in tensors:
                b[ours] = get(p + g + ".weight")
        if p + "ffn_gate_exps.weight" in tensors:
            b["experts"] = _load_exps(tensors, get, bi, E)
            b["gate"] = getf32(p + "ffn_gate_inp.weight")
            if p + "ffn_gate_inp.bias" in tensors:
                b["router_bias"] = getf32(p + "ffn_gate_inp.bias")
            if p + "ffn_gate_shexp.weight" in tensors:
                b["shared_expert"] = {
                    f"{g}_proj": get(p + f"ffn_{g}_shexp.weight")
                    for g in ("gate", "up", "down")}
        params["blocks"].append(b)
    return params, cfg


def load_gguf_checkpoint(path: str, dtype=None):
    """Load a llama-architecture .gguf file back into (params, LlamaConfig)
    with dequantized weights — the GGUF-file eval path (reference
    ``eval/evaluation.py:187-255``)."""
    import jax.numpy as jnp

    from ..models import llama

    dtype = dtype or jnp.bfloat16
    meta, tensors = read_gguf(path)
    arch = meta.get("general.architecture", "llama")
    if arch not in ("llama", "qwen2", "qwen3", "gemma2", "gemma3",
                    "qwen2moe", "qwen3moe", "deepseek2", "gpt-oss",
                    "llama4", "mistral3", "ernie4_5", "ernie4_5-moe",
                    "qwen3next", "qwen35moe", "qwen3vlmoe", "step35",
                    "glm4moe", "qwen2vl"):
        raise NotImplementedError(f"gguf arch {arch!r} not supported")
    if arch == "deepseek2":
        return _load_deepseek2(meta, tensors, dtype)
    if arch == "gpt-oss":
        return _load_gptoss(meta, tensors, dtype)
    if arch == "llama4":
        return _load_llama4(meta, tensors, dtype)
    if arch in ("qwen3next", "qwen35moe"):
        return _load_qwen3next(meta, tensors, dtype, arch)
    if arch == "ernie4_5-moe":
        return _load_ernie_moe(meta, tensors, dtype)
    if arch == "step35":
        return _load_step35(meta, tensors, dtype)
    if arch == "glm4moe":
        return _load_glm4moe(meta, tensors, dtype)
    # mistral3 / dense ernie4_5 are llama-layout; qwen3vlmoe's TEXT
    # decoder is qwen3moe-layout (vision lives in a separate mmproj file,
    # llama.cpp convention) — all ride the generic path below
    gemma = arch in ("gemma2", "gemma3")
    moe = arch in ("qwen2moe", "qwen3moe", "qwen3vlmoe")
    # qwen2vl text decoders are qwen2-layout (mrope collapses to rope
    # for text-only positions)
    # Mixtral exports under the llama arch with expert metadata
    if arch == "llama" and meta.get("llama.expert_count"):
        moe = True
    num_layers = int(meta[f"{arch}.block_count"])
    n_heads = int(meta[f"{arch}.attention.head_count"])
    hidden = int(meta[f"{arch}.embedding_length"])
    hd_meta = meta.get(f"{arch}.attention.key_length")
    qpas = meta.get(f"{arch}.attention.query_pre_attn_scalar")
    if moe:
        from ..models.mixtral import MixtralConfig
        cfg_cls = MixtralConfig
        shexp_ff = int(meta.get(
            f"{arch}.expert_shared_feed_forward_length", 0))
        moe_kw = dict(
            num_experts=int(meta[f"{arch}.expert_count"]),
            top_k=int(meta[f"{arch}.expert_used_count"]),
            shared_expert_intermediate=shexp_ff,
            shared_expert_gate=("blk.0.ffn_gate_inp_shexp.weight"
                                in tensors),
            norm_topk_prob=bool(int(meta.get(
                f"{arch}.expert_weights_norm",
                1 if arch in ("qwen3moe", "llama", "qwen3vlmoe")
                else 0))))
        inter = int(meta.get(f"{arch}.expert_feed_forward_length")
                    or meta[f"{arch}.feed_forward_length"])
    else:
        cfg_cls = llama.LlamaConfig
        moe_kw = {}
        inter = int(meta[f"{arch}.feed_forward_length"])
    cfg = cfg_cls(
        **moe_kw,
        vocab_size=int(meta[f"{arch}.vocab_size"]),
        hidden_size=hidden,
        intermediate_size=inter,
        num_layers=num_layers,
        num_heads=n_heads,
        num_kv_heads=int(meta[f"{arch}.attention.head_count_kv"]),
        head_dim=(int(hd_meta) if hd_meta is not None
                  and int(hd_meta) != hidden // n_heads else None),
        rope_theta=float(meta.get(f"{arch}.rope.freq_base", 10000.0)),
        rms_eps=float(meta.get(
            f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)),
        tie_embeddings="output.weight" not in tensors,
        attn_bias=arch in ("qwen2", "qwen2moe", "qwen2vl"),
        qk_norm=arch in ("qwen3", "gemma3", "qwen3moe", "qwen3vlmoe"),
        norm_offset=1.0 if gemma else 0.0,
        hidden_act="gelu_tanh" if gemma else "silu",
        embed_scale=gemma,
        sandwich_norms=gemma,
        attn_logit_softcap=float(meta.get(
            f"{arch}.attn_logit_softcapping", 0.0)),
        final_logit_softcap=float(meta.get(
            f"{arch}.final_logit_softcapping", 0.0)),
        attn_scale=(float(qpas) ** 0.5 if qpas else None),
        sliding_window=(int(meta[f"{arch}.attention.sliding_window"])
                        if meta.get(f"{arch}.attention.sliding_window")
                        else None),
        # gemma3 dual rope: local layers at theta 10k (llama.cpp
        # hardcodes the local base; only the global base is stored),
        # interleave from the stored sliding_window_pattern
        rope_local_theta=10000.0 if arch == "gemma3" else 0.0,
        rope_scaling_factor=float(meta.get(
            f"{arch}.rope.scaling.factor", 1.0)),
        layer_types=(tuple(
            "full_attention"
            if (i + 1) % int(meta.get(
                f"{arch}.attention.sliding_window_pattern", 6)) == 0
            else "sliding_attention" for i in range(num_layers))
            if arch == "gemma3" else None),
        dtype=dtype)

    shift = cfg.norm_offset

    def get(nm, norm=False):
        ne, tt, raw = tensors[nm]
        arr = dequant_tensor(ne, tt, raw)
        if norm and shift:
            arr = arr - shift  # inverse of the gemma +1 store convention
        return jnp.asarray(arr, dtype)

    block_inv = dict(_GGUF_BLOCK_INV)
    block_inv.update({v: k for k, v in
                      _ARCH_BLOCK_EXTRA.get(arch, {}).items()})
    bias_inv = {v: k for k, v in _BIAS_NAME.items()}

    params: Dict[str, Any] = {
        "embed_tokens": get("token_embd.weight"),
        "norm": get("output_norm.weight", norm=True),
        "blocks": [],
    }
    if "output.weight" in tensors:
        params["lm_head"] = get("output.weight")
    for bi in range(num_layers):
        block = {}
        for kind, ours in block_inv.items():
            nm = f"blk.{bi}.{kind}.weight"
            if nm in tensors:
                block[ours] = get(nm, norm="norm" in ours)
        for kind, ours in bias_inv.items():
            nm = f"blk.{bi}.{kind}.bias"
            if nm in tensors:
                block[ours] = get(nm)
        if moe:
            # 3-D *_exps tensors slice back into the per-expert tree
            exps = {w: get(f"blk.{bi}.ffn_{g}_exps.weight")
                    for w, g in (("w1", "gate"), ("w3", "up"),
                                 ("w2", "down"))}
            E = exps["w1"].shape[0]
            block["experts"] = [
                {w: exps[w][e] for w in ("w1", "w2", "w3")}
                for e in range(E)]
            block["router"] = get(f"blk.{bi}.ffn_gate_inp.weight")
            if f"blk.{bi}.ffn_gate_shexp.weight" in tensors:
                block["shared_expert"] = {
                    w: get(f"blk.{bi}.ffn_{g}_shexp.weight")
                    for w, g in (("w1", "gate"), ("w3", "up"),
                                 ("w2", "down"))}
            if f"blk.{bi}.ffn_gate_inp_shexp.weight" in tensors:
                block["shared_expert_gate"] = get(
                    f"blk.{bi}.ffn_gate_inp_shexp.weight")
        params["blocks"].append(block)
    logger.info("loaded GGUF %s: %d tensors, %d blocks", path, len(tensors),
                num_layers)
    return params, cfg


def _imatrix_payload(arr: np.ndarray, t: int,
                     im: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
    """Derive explicit packer scales for an UNTUNED layer via the
    imatrix-weighted k-quant search (``dtypes.gguf.rtn_int_dq_*`` — the
    role of the reference's imatrix packer args,
    ``export_to_gguf/packing.py:658,788`` where untuned/upgraded layers
    re-quantize with ``quant_tensor_gguf_*_dq(..., imatrix=...)``)."""
    grid = _TYPE_GRID.get(t)
    if grid is None:
        return None
    bits, g, sgs, sb, sym = grid
    O, I = arr.shape
    if I % (g * sgs):
        return None
    import jax.numpy as jnp

    from ..dtypes.gguf import rtn_int_dq_asym, rtn_int_dq_sym
    fn = rtn_int_dq_sym if sym else rtn_int_dq_asym
    r = fn(jnp.asarray(arr, jnp.float32), bits, g, super_bits=sb,
           super_group_size=sgs, imatrix=jnp.asarray(im, jnp.float32))
    ex = r.extras
    out = {"scale": np.asarray(ex["d_hat"], np.float32),
           "d_scale": np.asarray(ex["d_super"], np.float32)}
    if not sym:
        out["wmin"] = np.asarray(ex["m_hat"], np.float32)
        out["d_wmin"] = np.asarray(ex["m_super"], np.float32)
    return out


def save_gguf_checkpoint(params: Dict[str, Any], model_cfg,
                         path: str, base_type: int = GGMLType.Q4_K,
                         mixed: bool = True,
                         tokenizer: Optional[Dict[str, Any]] = None,
                         layers: Optional[Dict[str, Any]] = None,
                         imatrix: Optional[Dict[str, np.ndarray]] = None
                         ) -> str:
    """Write a llama-family params pytree as a .gguf file.

    ``layers`` maps flat layer names (``blocks.0.q_proj``, ``lm_head``) to
    tuned ``QuantizedLayer`` payloads; layers whose tuned dq grid matches
    the selected GGUF type are packed with their TUNED scales (reference
    explicit-scale packers, ``export_to_gguf/packing.py:788``) instead of
    being re-quantized by RTN.

    ``imatrix`` maps flat layer names to per-input-channel importance
    vectors (``QuantizeResult.imatrices``); layers WITHOUT a usable tuned
    payload — untuned layers, or layers the mixed-bits rule upgraded to a
    different k-quant type — are packed with an imatrix-WEIGHTED scale
    search instead of plain min/max RTN.
    """
    n_blocks = model_cfg.num_layers
    tensors: List[Tuple[str, Tuple[int, ...], int, np.ndarray]] = []
    layers = layers or {}
    imatrix = imatrix or {}
    n_tuned = 0
    n_imx = 0

    def add(name, arr, kind, block_idx=0, flat_name=None, n_stack=None):
        """``n_stack``: MoE experts stacked row-wise — ``arr`` is
        (E*O, I), written with ne (I, O, E) (the llama.cpp ``*_exps``
        3-D convention); ggml quantization is row-wise, so the 2-D
        packers apply unchanged."""
        nonlocal n_tuned, n_imx
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 1:
            if (kind != "bias" and kind != "ssm_norm"
                    and arch in ("gemma2", "gemma3", "qwen3next",
                                 "qwen35moe", "step35")):
                # llama.cpp convention for zero-centered RMSNorms: gains
                # are stored SHIFTED by +1 ((1 + w) * x models — gemma,
                # qwen3next, step3.5; the reference converters add 1 at
                # write, conversion/gemma.py + step3.py modify_tensors).
                # The gated ssm_norm is NOT zero-centered and stays raw.
                arr = arr + float(getattr(model_cfg, "norm_offset", 1.0))
            tensors.append((name, (arr.shape[0],), GGMLType.F32, arr))
            return
        O, I = arr.shape
        ne = (I, O) if not n_stack else (I, O // n_stack, n_stack)
        if kind == "norm":
            t = GGMLType.F32
        elif kind in ("ffn_gate_inp", "ffn_gate_inp_shexp"):
            t = GGMLType.F32   # routers stay f32 (llama.cpp convention)
        elif kind in ("ssm_conv1d", "ssm_beta_alpha"):
            # conv taps and delta-rule gate params are tiny and
            # precision-critical (in_proj_ba stays FP even in
            # quantization — models/qwen3next.block_linear_names)
            t = GGMLType.F32
        elif mixed:
            nh = getattr(model_cfg, "num_heads", 0)
            nkv = getattr(model_cfg, "num_kv_heads", 0) or nh
            t = select_layer_qtype(
                base_type, block_idx, n_blocks, kind, I,
                n_gqa=max(1, nh // nkv) if nh else 1,
                n_expert=(getattr(model_cfg, "num_experts", 0)
                          or getattr(model_cfg, "n_routed_experts", 0)
                          or 0),
                has_imatrix=flat_name in imatrix)
        else:
            t = base_type
            if I % BLOCK_ELEMS.get(t, 1):
                t = GGMLType.Q8_0 if I % QK == 0 else GGMLType.F16
        if t == GGMLType.F16:
            tensors.append((name, ne, t, arr.astype(np.float16)))
        elif t == GGMLType.F32:
            tensors.append((name, ne, t, arr))
        else:
            kwargs = {}
            ql = layers.get(flat_name)
            if ql is not None:
                tuned = _tuned_payload(ql, t)
                if tuned is not None:
                    kwargs = tuned
                    n_tuned += 1
            if not kwargs and flat_name in imatrix:
                wls = _imatrix_payload(arr, t, imatrix[flat_name])
                if wls is not None:
                    kwargs = wls
                    n_imx += 1
            raw = QUANTIZERS[t](arr, **kwargs)
            tensors.append((name, ne, t, raw))

    arch = gguf_arch(model_cfg)
    block_names = dict(_GGUF_BLOCK_NAME)
    block_names.update(_ARCH_BLOCK_EXTRA.get(arch, {}))

    add("token_embd.weight", params["embed_tokens"], "token_embd",
        flat_name="embed_tokens")
    add("output_norm.weight", params["norm"], "norm")
    if "lm_head" in params:
        add("output.weight", params["lm_head"], "output",
            flat_name="lm_head")
    # expert-weight key aliases: mixtral-style trees use w1/w2/w3,
    # deepseek/gpt-oss/llama4 use gate/up/down_proj
    _EXP_SLOTS = ((("w1", "gate_proj"), "ffn_gate_exps", "ffn_gate"),
                  (("w3", "up_proj"), "ffn_up_exps", "ffn_up"),
                  (("w2", "down_proj"), "ffn_down_exps", "ffn_down"))

    def _exp_key(tree, names):
        return names[0] if names[0] in tree else names[1]

    for bi, block in enumerate(params["blocks"]):
        experts = block.get("experts")
        if isinstance(experts, (list, tuple)) and experts:
            # llama.cpp MoE convention: experts stack into one 3-D
            # ffn_{gate,up,down}_exps tensor; the router is
            # ffn_gate_inp; shared experts get *_shexp slots
            E = len(experts)
            for names, gk, kind in _EXP_SLOTS:
                wname = _exp_key(experts[0], names)
                stk = np.concatenate(
                    [np.asarray(e[wname], np.float32) for e in experts],
                    axis=0)
                add(f"blk.{bi}.{gk}.weight", stk, kind, bi, n_stack=E)
                bkey = {"gate_proj": "gate_bias", "up_proj": "up_bias",
                        "down_proj": "down_bias"}.get(wname)
                if bkey and bkey in experts[0]:
                    # gpt-oss expert biases: stacked (E, O) f32
                    bstk = np.stack([np.asarray(e[bkey], np.float32)
                                     for e in experts])
                    tensors.append((f"blk.{bi}.{gk}.bias",
                                    (bstk.shape[1], bstk.shape[0]),
                                    GGMLType.F32, bstk))
        router = block.get("router")
        if router is None:
            router = block.get("gate")   # deepseek router slot name
        if router is not None:
            add(f"blk.{bi}.ffn_gate_inp.weight", router,
                "ffn_gate_inp", bi)
        if block.get("router_bias") is not None:
            add(f"blk.{bi}.ffn_gate_inp.bias", block["router_bias"],
                "bias", bi)
        if block.get("e_score_correction_bias") is not None:
            # deepseek-V3 sigmoid-gate correction (llama.cpp exp_probs_b)
            add(f"blk.{bi}.exp_probs_b.bias",
                block["e_score_correction_bias"], "bias", bi)
        shexp = block.get("shared_expert")
        if shexp is None:
            shexp = block.get("shared_experts")  # deepseek plural slot
        if shexp is not None:
            for names, gk, _k in _EXP_SLOTS:
                wname = _exp_key(shexp, names)
                add(f"blk.{bi}.{gk[:-5]}_shexp.weight", shexp[wname],
                    gk[:-5], bi,
                    flat_name=f"blocks.{bi}.shared_expert.{wname}")
        if block.get("shared_expert_gate") is not None:
            add(f"blk.{bi}.ffn_gate_inp_shexp.weight",
                block["shared_expert_gate"], "ffn_gate_inp_shexp", bi)
        if "A_log" in block and arch in ("qwen3next", "qwen35moe"):
            # llama.cpp ssm convention stores A = -exp(A_log) f32
            a = -np.exp(np.asarray(block["A_log"], np.float32))
            tensors.append((f"blk.{bi}.ssm_a.weight", (a.shape[0],),
                            GGMLType.F32, a))
        if "indexer" in block:
            logger.warning(
                "gguf export: blk %d DSA indexer tensors dropped — no "
                "stable llama.cpp mapping at the pinned conversion "
                "commit (trunk exports as deepseek2)", bi)
        for ours, arr in block.items():
            if ours in ("experts", "router", "router_bias", "gate",
                        "shared_expert", "shared_experts",
                        "shared_expert_gate", "e_score_correction_bias",
                        "A_log", "indexer"):
                continue
            if ours in _BIAS_NAME:
                add(f"blk.{bi}.{_BIAS_NAME[ours]}.bias", arr, "bias", bi)
                continue
            if ours not in block_names:
                continue
            kind = block_names[ours]
            add(f"blk.{bi}.{kind}.weight", arr, kind, bi,
                flat_name=f"blocks.{bi}.{ours}")
    if layers:
        logger.info("gguf export: %d/%d quantized tensors carry tuned "
                    "scales", n_tuned, len(layers))
    if n_imx:
        logger.info("gguf export: %d untuned/upgraded tensors packed with "
                    "imatrix-weighted scale search", n_imx)

    metadata = [
        ("general.architecture", _T_STR, arch),
        ("general.name", _T_STR, "autoround_tpu"),
        (f"{arch}.block_count", _T_U32, model_cfg.num_layers),
        (f"{arch}.context_length", _T_U32, 8192),
        (f"{arch}.embedding_length", _T_U32, model_cfg.hidden_size),
        (f"{arch}.feed_forward_length", _T_U32,
         model_cfg.intermediate_size),
        (f"{arch}.attention.head_count", _T_U32, model_cfg.num_heads),
        (f"{arch}.attention.head_count_kv", _T_U32,
         model_cfg.num_kv_heads),
        (f"{arch}.rope.freq_base", _T_F32, float(model_cfg.rope_theta)),
        (f"{arch}.attention.layer_norm_rms_epsilon", _T_F32,
         float(model_cfg.rms_eps)),
        (f"{arch}.vocab_size", _T_U32, model_cfg.vocab_size),
        (f"{arch}.attention.key_length", _T_U32, model_cfg.hd),
        (f"{arch}.attention.value_length", _T_U32, model_cfg.hd),
    ]
    if arch == "gemma2":
        metadata += [
            (f"{arch}.attn_logit_softcapping", _T_F32,
             float(model_cfg.attn_logit_softcap or 0.0)),
            (f"{arch}.final_logit_softcapping", _T_F32,
             float(model_cfg.final_logit_softcap or 0.0)),
            (f"{arch}.attention.sliding_window", _T_U32,
             int(model_cfg.sliding_window or 0)),
        ]
        if model_cfg.attn_scale is not None:
            metadata.append((f"{arch}.attention.query_pre_attn_scalar",
                             _T_F32, float(model_cfg.attn_scale) ** 2))
    if arch in ("qwen2moe", "qwen3moe"):
        metadata += [
            (f"{arch}.expert_count", _T_U32,
             int(getattr(model_cfg, "num_experts", 0))),
            (f"{arch}.expert_used_count", _T_U32,
             int(getattr(model_cfg, "top_k", 0))),
            (f"{arch}.expert_feed_forward_length", _T_U32,
             model_cfg.intermediate_size),
        ]
        if getattr(model_cfg, "shared_expert_intermediate", 0):
            metadata.append(
                (f"{arch}.expert_shared_feed_forward_length", _T_U32,
                 int(model_cfg.shared_expert_intermediate)))
    if arch == "deepseek2":
        # llama.cpp deepseek2 conversion keys; expert_gating_func:
        # 1 = softmax (V2), 2 = sigmoid (V3)
        metadata += [
            (f"{arch}.leading_dense_block_count", _T_U32,
             int(getattr(model_cfg, "first_k_dense", 0))),
            (f"{arch}.expert_count", _T_U32,
             int(getattr(model_cfg, "n_routed_experts", 0))),
            (f"{arch}.expert_used_count", _T_U32,
             int(getattr(model_cfg, "num_experts_per_tok", 0))),
            (f"{arch}.expert_shared_count", _T_U32,
             int(getattr(model_cfg, "n_shared_experts", 0))),
            (f"{arch}.expert_feed_forward_length", _T_U32,
             int(getattr(model_cfg, "moe_intermediate_size", 0))),
            (f"{arch}.expert_weights_scale", _T_F32,
             float(getattr(model_cfg, "routed_scaling_factor", 1.0))),
            (f"{arch}.expert_gating_func", _T_U32,
             2 if getattr(model_cfg, "scoring_func",
                          "softmax") == "sigmoid" else 1),
            (f"{arch}.expert_weights_norm", _T_U32,
             int(bool(getattr(model_cfg, "norm_topk_prob", False)))),
            (f"{arch}.attention.q_lora_rank", _T_U32,
             int(getattr(model_cfg, "q_lora_rank", 0))),
            (f"{arch}.attention.kv_lora_rank", _T_U32,
             int(getattr(model_cfg, "kv_lora_rank", 0))),
            (f"{arch}.rope.dimension_count", _T_U32,
             int(getattr(model_cfg, "qk_rope_head_dim", 0))),
        ]
    if arch == "gpt-oss":
        metadata += [
            (f"{arch}.expert_count", _T_U32,
             int(getattr(model_cfg, "num_experts", 0))),
            (f"{arch}.expert_used_count", _T_U32,
             int(getattr(model_cfg, "top_k", 0))),
            (f"{arch}.attention.sliding_window", _T_U32,
             int(model_cfg.sliding_window or 0)),
        ]
    if arch == "llama4":
        ml = tuple(getattr(model_cfg, "moe_layers", ()) or ())
        step = (ml[1] - ml[0] if len(ml) > 1
                else (1 if ml else 0))
        metadata += [
            (f"{arch}.expert_count", _T_U32,
             int(getattr(model_cfg, "num_experts", 0))),
            (f"{arch}.expert_used_count", _T_U32,
             int(getattr(model_cfg, "top_k", 0))),
            (f"{arch}.expert_feed_forward_length", _T_U32,
             model_cfg.intermediate_size),
            # dense layers use the wider mlp; moe layers the expert width
            (f"{arch}.feed_forward_length", _T_U32,
             int(getattr(model_cfg, "intermediate_size_mlp",
                         model_cfg.intermediate_size))),
            (f"{arch}.interleave_moe_layer_step", _T_U32, int(step)),
            (f"{arch}.moe_layer_start", _T_U32, int(ml[0]) if ml else 0),
        ]
        # NoPE interval (HF llama4: every Nth layer skips rope and runs
        # full attention; the rest use sliding windows)
        nr = tuple(getattr(model_cfg, "no_rope_layers", ()) or ())
        nope = [i for i, v in enumerate(nr) if not v]
        metadata += [
            (f"{arch}.no_rope_layer_interval", _T_U32,
             (nope[0] + 1) if nope else 0),
            (f"{arch}.attention.sliding_window", _T_U32,
             int(model_cfg.sliding_window or 0)),
        ]
    if arch == "gemma3":
        lt = getattr(model_cfg, "layer_types", None) or ()
        pattern = 6  # llama.cpp gemma3 default: every 6th layer global
        full = [i for i, t in enumerate(lt) if t == "full_attention"]
        if full:
            pattern = full[0] + 1
        metadata += [
            (f"{arch}.attention.sliding_window", _T_U32,
             int(model_cfg.sliding_window or 0)),
            (f"{arch}.attention.sliding_window_pattern", _T_U32, pattern),
            (f"{arch}.final_logit_softcapping", _T_F32,
             float(model_cfg.final_logit_softcap or 0.0)),
        ]
        if getattr(model_cfg, "rope_scaling_factor", 1.0) != 1.0:
            metadata += [
                (f"{arch}.rope.scaling.type", _T_STR, "linear"),
                (f"{arch}.rope.scaling.factor", _T_F32,
                 float(model_cfg.rope_scaling_factor)),
            ]
        if model_cfg.attn_scale is not None:
            metadata.append((f"{arch}.attention.query_pre_attn_scalar",
                             _T_F32, float(model_cfg.attn_scale) ** 2))
    # generic MoE metadata for the arches not covered by a dedicated
    # block above: mixtral-as-llama (llama.cpp stores llama.expert_count
    # next to the ffn_*_exps tensors), ernie4_5-moe, the qwen3next
    # family, qwen3vlmoe, step35, glm4moe
    _moe_done = ("qwen2moe", "qwen3moe", "deepseek2", "gpt-oss", "llama4")
    n_exp = int(getattr(model_cfg, "num_experts", 0)
                or getattr(model_cfg, "n_routed_experts", 0)
                or getattr(model_cfg, "moe_num_experts", 0) or 0)
    if n_exp and arch not in _moe_done:
        used = int(getattr(model_cfg, "top_k", 0)
                   or getattr(model_cfg, "num_experts_per_tok", 0)
                   or getattr(model_cfg, "moe_k", 0)
                   or getattr(model_cfg, "moe_top_k", 0) or 0)
        eff = int(getattr(model_cfg, "moe_intermediate_size", 0)
                  or model_cfg.intermediate_size)
        metadata += [
            (f"{arch}.expert_count", _T_U32, n_exp),
            (f"{arch}.expert_used_count", _T_U32, used),
            (f"{arch}.expert_feed_forward_length", _T_U32, eff),
        ]
        shexp = int(getattr(model_cfg, "shared_expert_intermediate", 0)
                    or getattr(model_cfg, "share_expert_dim", 0)
                    or (getattr(model_cfg, "moe_num_shared_experts", 0)
                        or getattr(model_cfg, "n_shared_experts", 0) or 0)
                    * int(getattr(model_cfg, "moe_intermediate_size", 0)
                          or 0))
        if shexp:
            metadata.append(
                (f"{arch}.expert_shared_feed_forward_length", _T_U32,
                 shexp))
        metadata.append((f"{arch}.expert_weights_norm", _T_U32,
                         int(bool(getattr(model_cfg, "norm_topk_prob",
                                          False)))))
    if arch == "ernie4_5-moe":
        metadata += [
            (f"{arch}.leading_dense_block_count", _T_U32,
             int(getattr(model_cfg, "moe_layer_start_index", 0))),
            (f"{arch}.interleave_moe_layer_step", _T_U32,
             int(getattr(model_cfg, "moe_layer_interval", 1))),
        ]
    if arch == "glm4moe":
        metadata += [
            (f"{arch}.leading_dense_block_count", _T_U32,
             int(getattr(model_cfg, "first_k_dense", 0))),
            (f"{arch}.expert_shared_count", _T_U32,
             int(getattr(model_cfg, "n_shared_experts", 0))),
            (f"{arch}.expert_weights_scale", _T_F32,
             float(getattr(model_cfg, "routed_scaling_factor", 1.0))),
            (f"{arch}.expert_gating_func", _T_U32,
             2 if getattr(model_cfg, "scoring_func",
                          "softmax") == "sigmoid" else 1),
            (f"{arch}.rope.partial_rotary_factor", _T_F32,
             float(getattr(model_cfg, "partial_rotary_factor", 0.5))),
            (f"{arch}.attention.qk_norm", _T_U32,
             int(bool(getattr(model_cfg, "qk_norm", False)))),
        ]
    if arch in ("qwen3next", "qwen35moe"):
        # GatedDeltaNet geometry — needed to rebuild the hybrid on load
        lt = getattr(model_cfg, "layer_types", None) or ()
        full = [i for i, t in enumerate(lt) if t == "full_attention"]
        metadata += [
            (f"{arch}.linear_num_key_heads", _T_U32,
             int(model_cfg.linear_num_key_heads)),
            (f"{arch}.linear_num_value_heads", _T_U32,
             int(model_cfg.linear_num_value_heads)),
            (f"{arch}.linear_key_head_dim", _T_U32,
             int(model_cfg.linear_key_head_dim)),
            (f"{arch}.linear_value_head_dim", _T_U32,
             int(model_cfg.linear_value_head_dim)),
            (f"{arch}.linear_conv_kernel_dim", _T_U32,
             int(model_cfg.linear_conv_kernel_dim)),
            # every Nth layer is full attention (qwen3next: 4)
            (f"{arch}.full_attention_interval", _T_U32,
             (full[0] + 1) if full else 4),
            (f"{arch}.rope.partial_rotary_factor", _T_F32,
             float(model_cfg.partial_rotary_factor)),
        ]
    if arch == "qwen3vlmoe":
        metadata.append(
            (f"{arch}.n_deepstack_layers", _T_U32,
             len(getattr(model_cfg, "deepstack_visual_indexes", ()) or ())))
    if arch == "step35":
        metadata += [
            (f"{arch}.layer_types", _T_STR,
             ",".join(model_cfg.layer_types or ())),
            (f"{arch}.moe_layers", _T_STR, ",".join(
                str(i) for i in (model_cfg.moe_layers or ()))),
            (f"{arch}.swa.head_count", _T_U32,
             int(model_cfg.swa_num_heads or 0)),
            (f"{arch}.swa.head_count_kv", _T_U32,
             int(model_cfg.swa_num_kv_heads or 0)),
            (f"{arch}.attention.sliding_window", _T_U32,
             int(model_cfg.sliding_window or 0)),
            (f"{arch}.rope.freq_base_swa", _T_F32,
             float(model_cfg.rope_local_theta or 0.0)),
            (f"{arch}.swiglu_clamp_exp", _T_F32,
             float(getattr(model_cfg, "swiglu_limit", 0.0))),
            (f"{arch}.swiglu_clamp_shexp", _T_F32,
             float(getattr(model_cfg, "swiglu_limit_shared", 0.0))),
            (f"{arch}.expert_weights_scale", _T_F32,
             float(getattr(model_cfg, "moe_router_scaling_factor", 1.0))),
        ]
    if tokenizer is not None:
        metadata.extend(tokenizer_metadata(tokenizer))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_gguf(path, metadata, tensors)
    logger.info("wrote GGUF (%d tensors, base %s) -> %s", len(tensors),
                TYPE_NAMES.get(base_type), path)
    return path
