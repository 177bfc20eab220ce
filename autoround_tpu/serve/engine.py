"""Quantized serving engine: packed weights + KV cache + decode loop.

New capability vs the reference (SURVEY.md §7 "Serving engine" — the
reference only provides QuantLinear kernels consumed by HF/vLLM): packed
int4 weights stay HBM-resident in the nibble-plane layout and every
projection hits the fused Pallas dequant+matmul (``ops/qmatmul``); the KV
cache is a preallocated functional buffer updated with dynamic slices, so
prefill and every decode step are two fixed-shape jitted executables.

Single-chip in this milestone; the mesh-sharded variant (weights/KV over
``tp``) rides on parallel/mesh.py next.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import envs
from ..models import llama
from ..ops.qmatmul import pack_w4_planes, w4a16_matmul, w4a16_matmul_ref
from ..ops.qmatmul_ext import (decode_e2m1, fp8_matmul, mxfp4_matmul,
                               pack_w2_planes, w2a16_matmul,
                               w4a16_asym_matmul, w8a16_matmul)
from ..ops.qmatmul_int8 import pack_w4_bytes, w4a8_matmul, w8a8_matmul
from ..quantize.orchestrator import QuantizeResult
from ..utils.logger import logger

__all__ = ["KVCache", "QuantizedLlama"]


class KVCache(NamedTuple):
    """KV cache; optionally int8/fp8-quantized storage with per-(layer,
    head) static scales calibrated at prefill (role of the reference's
    ``QuantizedKVParameterCache`` + k/v scale hooks,
    ``experimental/kv_cache.py:90,237``)."""

    k: jax.Array  # (L, B, T, n_kv, hd) — cfg dtype, or int8/fp8 storage
    v: jax.Array
    length: jax.Array  # () int32 — tokens filled so far
    k_scale: Optional[jax.Array] = None  # (L, 1, 1, n_kv, 1) when quantized
    v_scale: Optional[jax.Array] = None


class HybridCache(NamedTuple):
    """Qwen3-Next hybrid cache: standard KV for the full-attention
    layers, depthwise-conv tails + recurrent delta-rule states for the
    linear-attention layers (O(1) decode — the linear-attention win)."""

    k: jax.Array          # (L_full, B, T, n_kv, hd)
    v: jax.Array
    conv: jax.Array       # (L_lin, B, K-1, conv_dim)
    state: jax.Array      # (L_lin, B, nv, dk, dv) f32
    length: jax.Array


_KV_QMAX = {"int8": 127.0, "fp8": 448.0}
# headroom multiplier for MLA latent-cache scales calibrated on the prompt
# (decode-time latents beyond the prompt max would otherwise clip at ±qmax)
_MLA_SCALE_HEADROOM = 1.2
_KV_DTYPE = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn}


def _init_cache(cfg: llama.LlamaConfig, batch: int, max_seq: int,
                n_layers: int, kv_quant: Optional[str] = None) -> KVCache:
    from ..models.deepseek import DeepseekConfig
    if isinstance(cfg, DeepseekConfig) and cfg.kv_lora_rank:
        # MLA compressed cache: k holds the c_kv latents, v the shared
        # roped sub-head — (r + dr) per token instead of 2·nh·hd;
        # kv_quant stores the latents int8/fp8 with per-layer scales
        store = _KV_DTYPE.get(kv_quant, cfg.dtype)
        return KVCache(
            k=jnp.zeros((n_layers, batch, max_seq, 1, cfg.kv_lora_rank),
                        store),
            v=jnp.zeros((n_layers, batch, max_seq, 1, cfg.qk_rope_head_dim),
                        store),
            length=jnp.zeros((), jnp.int32),
        )
    shape = (n_layers, batch, max_seq, cfg.num_kv_heads, cfg.hd)
    store = _KV_DTYPE.get(kv_quant, cfg.dtype)
    return KVCache(
        k=jnp.zeros(shape, store),
        v=jnp.zeros(shape, store),
        length=jnp.zeros((), jnp.int32),
    )


def _kv_quantize(x, scale, kv_quant):
    """x (..., n_kv, hd) → quantized storage with per-head scale."""
    qmax = _KV_QMAX[kv_quant]
    y = jnp.clip(x.astype(jnp.float32) / scale, -qmax, qmax)
    if kv_quant == "int8":
        return jnp.round(y).astype(jnp.int8)
    return y.astype(jnp.float8_e4m3fn)


def _kv_dequantize(x, scale, dtype):
    return (x.astype(jnp.float32) * scale).astype(dtype)


_FUSE_GROUPS = (("qkv", ("q_proj", "k_proj", "v_proj")),
                ("gate_up", ("gate_proj", "up_proj")))


def _fuse_packed(packed: Dict[str, Tuple[jax.Array, jax.Array]], cfg,
                 kinds: Optional[Dict[str, str]] = None):
    """Concatenate q/k/v and gate/up packed weights along O so one fused
    kernel call replaces three/two (fewer launches per decode step; the
    shared activation is read once).  Returns (packed', splits, kinds')
    where ``splits`` is a STATIC side table (split sizes must not ride in
    the traced pytree or output slicing becomes dynamic).  Only groups
    whose members share one kernel kind fuse (a W8A8 k_proj cannot
    concatenate into a W4 qkv call)."""
    kinds = dict(kinds or {})
    out = dict(packed)
    splits_table: Dict[str, Tuple[int, ...]] = {}
    for bi in range(cfg.num_layers):
        for fused_name, members in _FUSE_GROUPS:
            keys = [f"blocks.{bi}.{m}" for m in members]
            if not all(k in packed for k in keys):
                continue
            member_kinds = {kinds.get(k, "w4a16") for k in keys}
            if len(member_kinds) != 1:
                continue
            arities = {len(packed[k]) for k in keys}
            if len(arities) != 1:
                continue
            # concat every payload component (qweight, scales[, zp]) along
            # O — all kinds lay their first axis out as output channels
            entries = [packed[k] for k in keys]
            key = f"blocks.{bi}.{fused_name}"
            out[key] = tuple(
                jnp.concatenate([e[c] for e in entries], axis=0)
                for c in range(arities.pop()))
            splits_table[key] = tuple(int(e[0].shape[0]) for e in entries)
            kinds[key] = next(iter(member_kinds))
    return out, splits_table, kinds


def _stack_experts(packed, kinds, cfg):
    """Stack per-expert packed w4a16 entries into one grouped payload per
    (block, projection): ``blocks.i.experts_stack.<w>`` → (qw (E, O, Kw),
    scales (E, O, K/g)).  The MoE serving path then runs ONE grouped
    Pallas call per projection (``ops.qmatmul.w4a16_matmul_grouped`` —
    the ARK MoE-grouped-GEMM role) instead of E kernel launches, which
    is what makes E = 64..256 routed experts servable.  Per-expert
    entries are removed (no duplicate HBM); only blocks where EVERY
    expert packed as w4a16 with identical shapes stack.

    Stacking is ATOMIC per block: either every projection of the expert
    MLP (w1/w2/w3 or gate/up/down) stacks, or none does.  A partial
    stack would strand the block — the MoE fns require the full triple
    in ``grouped_names`` to take the grouped path, and the per-expert
    fallback can't run either because stacked projections had their
    per-expert packed entries deleted (and their dense leaves are None)."""
    E = getattr(cfg, "num_experts", 0) or getattr(cfg, "n_routed_experts",
                                                  0)
    if not E:
        return packed, kinds
    # the projection triples the MoE fns gate `use_grouped` on
    _TRIPLES = (frozenset(("w1", "w2", "w3")),
                frozenset(("gate_proj", "up_proj", "down_proj")))
    out = dict(packed)
    n_stacked = 0
    for bi in range(cfg.num_layers):
        by_w: Dict[str, list] = {}
        for key in packed:
            parts = key.split(".")
            if (len(parts) == 5 and parts[0] == "blocks"
                    and int(parts[1]) == bi and parts[2] == "experts"):
                by_w.setdefault(parts[4], []).append(
                    (int(parts[3]), key))

        def _stackable(wname):
            entries = by_w.get(wname)
            if not entries or len(entries) != E:
                return None
            keys = [k for _, k in sorted(entries)]
            if any(kinds.get(k, "w4a16") != "w4a16" for k in keys):
                return None
            shapes = {tuple(packed[k][0].shape) for k in keys}
            if len(shapes) != 1 or any(len(packed[k]) != 2 for k in keys):
                return None
            return keys

        triple = next((t for t in _TRIPLES if set(by_w) & t), None)
        if triple is None:
            continue
        plan = {w: _stackable(w) for w in triple}
        if any(v is None for v in plan.values()):
            if any(v is not None for v in plan.values()):
                logger.warning(
                    "serving engine: block %d expert MLP only partially "
                    "stackable (%s) — serving all its experts per-expert",
                    bi, {w: ("ok" if v else "no") for w, v in plan.items()})
            continue
        for wname, keys in plan.items():
            skey = f"blocks.{bi}.experts_stack.{wname}"
            out[skey] = (jnp.stack([packed[k][0] for k in keys]),
                         jnp.stack([packed[k][1] for k in keys]))
            kinds[skey] = "w4a16_grouped"
            for k in keys:
                del out[k]
                kinds.pop(k, None)
            n_stacked += 1
    if n_stacked:
        logger.info("serving engine: %d expert groups stacked for the "
                    "grouped MoE kernel", n_stacked)
    return out, kinds


def _serving_kind(s) -> Optional[str]:
    """Map a quantization scheme to a packed serving-kernel kind.

    The reference dispatches per-scheme through its backend registry
    (``inference/backend.py:209-650`` — exllamav2/triton for W4A16,
    triton int8 fused dequant-matmul + ARK int8 kblock GEMMs for
    W8A8/W4A8); here the same role is three Pallas kernels:

      * ``w4a16`` — int4 sym weights, bf16 MXU (``ops/qmatmul``)
      * ``w4a8``  — int4 sym weights, dynamic per-token int8 acts on the
        int8 MXU (``ops/qmatmul_int8.w4a8_matmul``)
      * ``w8a8``  — per-channel int8 weights, int8 MXU with fused
        dequant epilogue (``ops/qmatmul_int8.w8a8_matmul``)

    Activation quantization is dynamic per-token sym int8 (at least as
    tight as the tuned static scale; the reference's triton kernels make
    the same choice for dynamic-act schemes).  Returns None when the
    scheme has no packed path (serves dense qdq bf16).

    Weight-only breadth beyond W4-sym (reference triton quant_matmul_248
    covers 2/4/8-bit sym+asym; backend table routes FP8/MXFP4):

      * ``w4a16_asym`` — int4 with per-group zero-point (rank-1 zp
        correction fused, ``ops/qmatmul_ext``)
      * ``w2a16`` / ``w8a16`` — 2-bit (16-plane words) / int8 group
      * ``fp8`` — e4m3 weights, per-channel scale epilogue
      * ``mxfp4_g32`` / ``mxfp4_g16`` — E2M1 codes + 32/16-wide group
        scales (NVFP4's global scale pre-multiplied at pack time)"""
    act_int8 = (s.act_bits == 8 and s.act_data_type == "int" and s.act_sym)
    g = s.group_size if isinstance(s.group_size, int) else 0
    if s.data_type == "int" and s.bits == 4 and g >= 16:
        if s.sym:
            # the int8-MXU dynamic-act kernel tiles on g >= 128; smaller
            # groups serve weight-only through the same W4 layout
            return "w4a8" if act_int8 and g >= 128 else "w4a16"
        return "w4a16_asym"
    if (s.super_bits and s.bits <= 4 and g >= 16
            and s.data_type == "int_dq"):
        # GGUF double-quant (q2_k/q3_k/q4_k): the super hierarchy
        # flattens into per-group effective payloads that ride the W4
        # kernels directly — sym dq q is signed (|q| <= 8, the +8 store
        # offset covers it), asym dq q in [0, 2^b-1] with the FLOAT
        # zero point m_hat/d_hat the asym kernel already fuses.  4-bit
        # storage for sub-4-bit codes costs extra weight bytes, but the
        # layer serves PACKED instead of dense bf16 (>= 4x fewer bytes).
        return "w4a16" if s.sym else "w4a16_asym"
    if s.data_type == "int" and s.bits == 3 and g >= 16:
        # 3-bit codes embed exactly in the 4-bit kernels (sym: q in
        # [-4,3] -> +8 store offset; asym: q in [0,7] with int zp)
        return "w4a16" if s.sym else "w4a16_asym"
    if s.data_type == "int" and s.bits == 2 and s.sym and g >= 128:
        return "w2a16"
    if s.data_type == "int" and s.bits == 2 and s.sym and g >= 16:
        return "w4a16"  # 16-plane W2 needs g>=128; small groups ride W4
    if s.data_type == "int" and s.bits == 2 and not s.sym and g >= 16:
        return "w4a16_asym"
    if s.data_type == "int" and s.bits == 8 and s.sym:
        if g <= 0 and act_int8:
            return "w8a8"
        return "w8a16"
    if s.data_type == "fp8" and g <= 0 and not isinstance(s.group_size,
                                                          tuple):
        return "fp8"
    if s.data_type in ("mx_fp", "nv_fp") and s.bits == 4 and g in (16, 32):
        return f"mxfp4_g{g}"
    return None


_E2M1_TABLE = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
                        -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
                       np.float32)


def _encode_e2m1(vals: np.ndarray) -> np.ndarray:
    """Nearest-E2M1 code per element (tuned qdq values sit exactly on the
    grid, so 'nearest' is exact; inverse of ops.qmatmul_ext.decode_e2m1)."""
    d = np.abs(vals[..., None] - _E2M1_TABLE[None, None, :])
    # prefer positive codes on ties (|v - 0.0| == |v - (-0.0)|)
    return np.argmin(d, axis=-1).astype(np.int32)


@dataclass(eq=False)
class QuantizedLlama:
    """Serving-side model: packed quantized layers + bf16 residue.

    Build with :meth:`from_quantize_result` (codes derived from the qdq
    grid) and run :meth:`prefill` / :meth:`decode_step` / :meth:`generate`.
    """

    cfg: llama.LlamaConfig
    params: Dict[str, Any]                 # non-quantized leaves (bf16)
    packed: Dict[str, Tuple[jax.Array, jax.Array]]  # name -> (qweight, scales)
    max_seq: int = 2048
    kv_quant: Optional[str] = None         # None | "int8" | "fp8"
    # static split sizes for fused projection entries (NOT traced)
    fused_splits: Optional[Dict[str, Tuple[int, ...]]] = None
    # static kernel-kind per packed entry: "w4a16" | "w4a8" | "w8a8"
    # (absent/None → w4a16, the historical default)
    packed_kinds: Optional[Dict[str, str]] = None
    # opt-in: run W4 PROMPT projections on the 2x int8 MXU with dynamic
    # per-token int8 activations (decode stays exact A16) — the serving
    # analogue of the reference's W4A8 prompt mode.  Changes prompt
    # numerics; default off.
    prefill_a8: bool = False

    def __post_init__(self):
        # jitted entry points close over static config; weights flow in as
        # arguments so XLA treats them as runtime buffers, compiled once.
        self._prefill_c = jax.jit(self._prefill_impl)
        self._decode_c = jax.jit(self._decode_impl)

    @classmethod
    def from_quantize_result(cls, result: QuantizeResult,
                             cfg: llama.LlamaConfig,
                             max_seq: int = 2048,
                             kv_quant: Optional[str] = None,
                             serve_a8: bool = False
                             ) -> "QuantizedLlama":
        """``serve_a8=True`` (opt-in THROUGHPUT MODE): W4A16-quantized
        layers serve through the int8-MXU byte-pair kernel with dynamic
        per-token int8 activations — measured 2274 vs 2187 tok/s/chip
        at 8B decode and the prompt pass above BF16
        (docs/prefill_r04.json).  Changes serving numerics (activation
        int8, like the reference's W4A8 backends); default off keeps
        exact A16 serving."""
        from ..models.deepseek import DeepseekConfig
        is_mla = isinstance(cfg, DeepseekConfig) and bool(cfg.kv_lora_rank)
        from ..models.glmdsa import GlmMoeDsaConfig
        if isinstance(cfg, GlmMoeDsaConfig):
            logger.warning(
                "GLM-5 DSA engine: serving runs DENSE MLA attention "
                "over the latent cache (a superset of the lightning-"
                "indexer top-%d subset) — numerics differ from the "
                "model's sparse training-time attention; the reference "
                "does not serve this family at all (its support is "
                "quantize/export-only)", cfg.index_topk)
        packed: Dict[str, Tuple[jax.Array, jax.Array]] = {}
        kinds: Dict[str, str] = {}
        dense_reasons: Dict[str, int] = {}
        params = jax.tree.map(lambda x: x, result.params)
        for name, ql in result.layers.items():
            if is_mla and name.endswith(".kv_b_proj"):
                # MLA absorbed decode contracts q_nope/ctx against the
                # per-head reshaped kv_b weight — serve its qdq leaf dense
                continue
            s = ql.scheme
            g = s.group_size if isinstance(s.group_size, int) else 0
            kind = _serving_kind(s)
            if (serve_a8 and kind == "w4a16" and g == 128
                    and np.asarray(ql.qdq).shape[0] % 256 == 0
                    and np.asarray(ql.qdq).shape[1] % 256 == 0):
                kind = "w4a8"
            pw4 = getattr(ql, "packed_w4", None)
            if kind == "w4a16" and pw4 is not None:
                # offload pull already produced the exact nibble planes —
                # ship them verbatim (0.5 byte/weight host->HBM instead
                # of re-deriving codes and pushing int32 through the
                # tunnel; measured dominant pack cost at 8B)
                words_np, scale_np = pw4
                packed[name] = (jnp.asarray(words_np),
                                jnp.asarray(scale_np))
                kinds[name] = kind
                parts = name.split(".", 2)
                if parts[0] == "blocks":
                    from ..utils.pytree import set_by_path
                    params["blocks"][int(parts[1])] = set_by_path(
                        params["blocks"][int(parts[1])], parts[2], None)
                elif name == "lm_head" and "lm_head" in params:
                    params["lm_head"] = None
                continue
            qdq = np.asarray(ql.qdq, np.float32)
            O, K = qdq.shape
            if kind == "w4a16" and K % (8 * g) == 0:
                scale = np.asarray(ql.scale, np.float32)
                # codes = round(qdq/scale) + 8 (sym full-range, signed
                # scale)
                srep = np.repeat(scale, g, axis=1)[:, :K]
                codes = np.clip(np.rint(qdq / srep) + 8, 0, 15
                                ).astype(np.uint32)
                qw = pack_w4_planes(jnp.asarray(codes.astype(np.int32)), g)
                packed[name] = (qw, jnp.asarray(scale))
            elif kind == "w4a8" and K % (2 * g) == 0:
                # int8 byte-pair layout for the int8-MXU kernel (round 4)
                scale = np.asarray(ql.scale, np.float32)
                srep = np.repeat(scale, g, axis=1)[:, :K]
                codes = np.clip(np.rint(qdq / srep) + 8, 0, 15
                                ).astype(np.int32)
                qw = pack_w4_bytes(jnp.asarray(codes))
                packed[name] = (qw, jnp.asarray(scale))
            elif (kind == "w4a16_asym" and ql.zp is not None
                  and K % (8 * g) == 0):
                scale = np.asarray(ql.scale, np.float32)
                zp = np.asarray(ql.zp, np.float32)
                srep = np.repeat(scale, g, axis=1)[:, :K]
                zrep = np.repeat(zp, g, axis=1)[:, :K]
                srep = np.where(np.abs(srep) < 1e-12, 1e-12, srep)
                codes = np.clip(np.rint(qdq / srep + zrep), 0, 15
                                ).astype(np.int32)
                qw = pack_w4_planes(jnp.asarray(codes), g)
                packed[name] = (qw, jnp.asarray(scale), jnp.asarray(zp))
            elif kind == "w2a16" and K % (16 * g) == 0:
                scale = np.asarray(ql.scale, np.float32)
                srep = np.repeat(scale, g, axis=1)[:, :K]
                srep = np.where(np.abs(srep) < 1e-12, 1e-12, srep)
                codes = np.clip(np.rint(qdq / srep) + 2, 0, 3
                                ).astype(np.int32)
                qw = pack_w2_planes(jnp.asarray(codes), g)
                packed[name] = (qw, jnp.asarray(scale))
            elif kind == "w8a16" and K % 256 == 0 and O % 256 == 0:
                gg = g if g > 0 else K
                scale = np.asarray(ql.scale, np.float32).reshape(O, -1)
                srep = np.repeat(scale, gg, axis=1)[:, :K]
                srep = np.where(np.abs(srep) < 1e-12, 1e-12, srep)
                wi = np.clip(np.rint(qdq / srep), -128, 127).astype(np.int8)
                packed[name] = (jnp.asarray(wi), jnp.asarray(scale))
            elif kind == "w8a8" and K % 256 == 0 and O % 256 == 0:
                # per-channel int8 codes straight off the tuned qdq grid
                # (sym full-range scales are SIGNED — preserve the sign,
                # only guard the exact-zero rows)
                scale = np.asarray(ql.scale, np.float32).reshape(O, -1)
                sc = scale[:, 0]
                sc = np.where(np.abs(sc) < 1e-12, 1e-12, sc)
                wi = np.clip(np.rint(qdq / sc[:, None]), -128, 127
                             ).astype(np.int8)
                packed[name] = (jnp.asarray(wi), jnp.asarray(sc))
            elif kind == "fp8":
                sc = np.asarray(ql.scale, np.float32).reshape(O, -1)[:, 0]
                sc = np.where(np.abs(sc) < 1e-12, 1e-12, sc)
                wf8 = jnp.asarray(qdq / sc[:, None]).astype(
                    jnp.float8_e4m3fn)
                packed[name] = (wf8, jnp.asarray(sc))
            elif kind in ("mxfp4_g16", "mxfp4_g32") and K % 1024 == 0:
                # E2M1 codes; scale carries the MX pow2 (and NVFP4's
                # global x e4m3 product — already folded into ql.scale)
                scale = np.asarray(ql.scale, np.float32).reshape(O, -1)
                srep = np.repeat(scale, g, axis=1)[:, :K]
                srep = np.where(np.abs(srep) < 1e-12, 1e-12, srep)
                codes = _encode_e2m1(qdq / srep)
                qw = pack_w4_planes(jnp.asarray(codes), 128)
                from ..ops.qmatmul_ext import mx_scale_cols
                scp = mx_scale_cols(K, g)   # lane-pad for the kernel layout
                if scale.shape[1] != scp:
                    scale = np.pad(scale, ((0, 0), (0, scp - scale.shape[1])))
                packed[name] = (qw, jnp.asarray(scale))
            else:
                # stays as qdq bf16 weights (fake-quant serving)
                why = (f"no packed kernel for scheme "
                       f"{s.data_type}{s.bits}g{s.group_size}"
                       if kind is None else
                       f"{kind}: shape ({O},{K}) not kernel-tileable")
                dense_reasons[why] = dense_reasons.get(why, 0) + 1
                continue
            kinds[name] = kind
            # drop the dense copy from the block params (dotted paths
            # cover MoE expert leaves, e.g. blocks.3.experts.1.w2)
            parts = name.split(".", 2)
            if parts[0] == "blocks":
                from ..utils.pytree import set_by_path
                params["blocks"][int(parts[1])] = set_by_path(
                    params["blocks"][int(parts[1])], parts[2], None)
            elif name == "lm_head" and "lm_head" in params:
                # packed head serves final_fwd; the dense copy (vocab x H,
                # the single largest weight read per decode step) is freed.
                # Tied-embedding models keep embed_tokens for the gather.
                params["lm_head"] = None
        by_kind = {k: sum(1 for v in kinds.values() if v == k)
                   for k in set(kinds.values())}
        logger.info("serving engine: %d layers packed (%s), rest dense",
                    len(packed), by_kind or "none")
        if dense_reasons:
            # loud: a user asking for a "W3 quantized serving engine" must
            # not silently get bf16 HBM residency for those layers
            n_dense = sum(dense_reasons.values())
            logger.warning(
                "serving engine: %d quantized layer(s) will serve as DENSE "
                "bf16 fake-quant (full-precision HBM residency, no packed "
                "kernel speedup): %s",
                n_dense,
                "; ".join(f"{n}x {why}"
                          for why, n in sorted(dense_reasons.items())))
        from ..models.gptoss import GptOssConfig
        from ..models.llama4 import Llama4Config
        from ..models.mixtral import MixtralConfig
        if isinstance(cfg, (MixtralConfig, DeepseekConfig, Llama4Config,
                            GptOssConfig)):
            packed, kinds = _stack_experts(packed, kinds, cfg)
        if is_mla:
            fused, splits = packed, None  # no qkv/gate_up fusion groups
        else:
            fused, splits, kinds = _fuse_packed(packed, cfg, kinds)
        return cls(cfg=cfg, params=params, packed=fused,
                   max_seq=max_seq, kv_quant=kv_quant, fused_splits=splits,
                   packed_kinds=kinds)

    @classmethod
    def from_pretrained(cls, path: str, max_seq: int = 2048,
                        kv_quant: Optional[str] = None) -> "QuantizedLlama":
        """Load an exported 'autoround'-format checkpoint directory
        (role of the reference's ``convert_hf_model`` load path,
        ``inference/convert_model.py:812`` — here the packed words repack
        from the export layout into the serving nibble-plane layout)."""
        import json
        import os

        from safetensors.numpy import load_file

        from ..export import _unflatten_params, unpack_quantized
        from ..models.llama import LlamaConfig
        from ..ops.qmatmul import pack_w4_planes

        with open(os.path.join(path, "quantization_config.json")) as f:
            qcfg = json.load(f)
        mc = qcfg["model_config"]
        cfg = LlamaConfig(**{k: v for k, v in mc.items()
                             if k in LlamaConfig.__dataclass_fields__
                             and k != "dtype"})
        flat = load_file(os.path.join(path, "model.safetensors"))
        import dataclasses as _dc
        emb = flat.get("embed_tokens")
        if emb is not None:
            cfg = _dc.replace(cfg, dtype=jnp.dtype(emb.dtype))

        packed: Dict[str, Tuple[jax.Array, jax.Array]] = {}
        dense = {}
        for k, v in flat.items():
            if k.endswith((".qweight", ".qzeros", ".scales")):
                continue
            dense[k] = jnp.asarray(v)
        params = _unflatten_params(dense)
        for name, meta in qcfg["layers"].items():
            g = meta["group_size"]
            eligible = (meta["data_type"] == "int" and meta["bits"] == 4
                        and meta["sym"] and isinstance(g, int) and g >= 128)
            payload = {s: flat.get(f"{name}.{s}")
                       for s in ("qweight", "qzeros", "scales")}
            if payload["qweight"] is None:
                continue  # qdq-dense layer (fake format)
            # infer O, I from the packed shapes: qweight (I*bits/32, O)
            O = payload["qweight"].shape[1]
            I = payload["qweight"].shape[0] * 32 // meta["bits"]
            codes, scales, zp = unpack_quantized(payload, meta["bits"], O, I)
            if eligible and I % (8 * g) == 0:
                qw = pack_w4_planes(jnp.asarray(codes.astype(np.int32)), g)
                packed[name] = (qw, jnp.asarray(scales.astype(np.float32)))
                dq = None
            else:
                import numpy as _np
                s = _np.repeat(scales, g if g > 0 else I, axis=1)[:, :I]
                z = _np.repeat(zp, g if g > 0 else I, axis=1)[:, :I]
                dq = ((codes.astype(_np.float32) - z) * s)
            from ..utils.pytree import set_by_path
            # packed layers carry NO dense leaf (None placeholder) — a
            # zeros stand-in would re-materialize the full bf16 model in
            # HBM and defeat the 4x footprint win
            leaf = jnp.asarray(dq, cfg.dtype) if dq is not None else None
            params = set_by_path(params, name, leaf)
        logger.info("from_pretrained: %d packed layers, %d total quantized",
                    len(packed), len(qcfg["layers"]))
        fused, splits, kinds = _fuse_packed(packed, cfg)
        return cls(cfg=cfg, params=params, packed=fused,
                   max_seq=max_seq, kv_quant=kv_quant, fused_splits=splits,
                   packed_kinds=kinds)

    @classmethod
    def from_gptq(cls, path: str, max_seq: int = 2048,
                  kv_quant: Optional[str] = None) -> "QuantizedLlama":
        """Load an HF-layout GPTQ or AWQ checkpoint (the CUDA-ecosystem
        formats the reference exports/consumes) straight into the serving
        engine; the layout is auto-detected from quantization_config."""
        from .gptq_loader import load_quantized_checkpoint
        params, cfg, packed, kinds = load_quantized_checkpoint(path)
        fused, splits, kinds = _fuse_packed(packed, cfg, kinds)
        return cls(cfg=cfg, params=params, packed=fused,
                   max_seq=max_seq, kv_quant=kv_quant, fused_splits=splits,
                   packed_kinds=kinds)

    # AWQ checkpoints route through the same auto-detecting loader
    from_awq = from_gptq

    # -- linear interceptor: packed kernel or dense fallback --
    @staticmethod
    def _packed_matmul(x, entry, kind: str, a8_prompt: bool = False):
        """Dispatch one packed projection entry to its serving kernel.

        ``entry`` is the packed payload tuple: (qweight, scales) for most
        kinds, (qweight, scales, zp) for asym.  Group size is derived
        from the static shapes so it never rides in the traced pytree.

        Prefill routing (VERDICT r3 item 4): at token counts >=
        ``AR_PREFILL_DEQUANT_TOKENS`` the int-scheme kinds dequantize
        ONCE into a bf16 scratch and run the dense 724 GB/s MXU path
        (the Pallas kernels re-extract the weight block per batch tile —
        right for decode where weight bytes dominate, a pure VPU tax at
        prefill where each weight is read once).  With ``a8_prompt`` the
        W4 prompt pass instead repacks to the byte-pair layout and runs
        the 2x int8 MXU (per-token dynamic int8 activations — opt-in
        because it changes prompt numerics like the reference's W4A8)."""
        qw, scales = entry[0], entry[1]
        tokens = 1
        for d in x.shape[:-1]:
            tokens *= int(d)
        # a8 prompt mode keys on SEQUENCE length, not raw token count: a
        # (B, 1, D) / (B, D) decode step must stay exact A16 even at
        # batch >= 256 (the documented prefill_a8 contract).
        seq = int(x.shape[-2]) if x.ndim >= 3 else tokens
        if (a8_prompt and kind == "w4a16" and seq >= 256
                and len(entry) >= 2
                and (qw.shape[1] * 8) // scales.shape[1] == 128
                and qw.shape[0] % 256 == 0
                and (qw.shape[1] * 8) % 256 == 0):
            # int8-MXU prompt mode: prefill is MXU-compute-bound, so the
            # 2x int8 MXU is the only lever past BF16 parity (the A16
            # kernel tops out ~0.9x there — docs/prefill_r04.json)
            if len(entry) > 2:                # engine-cached byte pairs
                bytepair = entry[2]
            else:
                from ..ops.qmatmul import unpack_w4_planes
                bytepair = pack_w4_bytes(unpack_w4_planes(qw, 128))
            return w4a8_matmul(x, bytepair, scales, 128)
        thresh = envs.AR_PREFILL_DEQUANT_TOKENS
        is_prefill = thresh > 0 and tokens >= thresh
        if is_prefill:
            if kind == "w4a16":
                group_size = (qw.shape[1] * 8) // scales.shape[1]
                return w4a16_matmul_ref(x, qw, scales, group_size)
            if kind == "w4a16_asym":
                from ..ops.qmatmul_ext import w4a16_asym_matmul_ref
                group_size = (qw.shape[1] * 8) // scales.shape[1]
                return w4a16_asym_matmul_ref(x, qw, scales, entry[2],
                                             group_size)
            if kind == "w2a16":
                from ..ops.qmatmul_ext import w2a16_matmul_ref
                group_size = (qw.shape[1] * 16) // scales.shape[1]
                return w2a16_matmul_ref(x, qw, scales, group_size)
            if kind == "w8a16":
                from ..ops.qmatmul_ext import w8a16_matmul_ref
                K = qw.shape[1]
                ncols = scales.shape[1]
                return w8a16_matmul_ref(x, qw, scales,
                                        0 if ncols == 1 else K // ncols)
        if kind == "w8a8":
            return w8a8_matmul(x, qw, scales)
        if kind == "fp8":
            return fp8_matmul(x, qw, scales)
        if kind == "w8a16":
            K = qw.shape[1]
            ncols = scales.shape[1]
            return w8a16_matmul(x, qw, scales, 0 if ncols == 1 else K // ncols)
        if kind == "w2a16":
            group_size = (qw.shape[1] * 16) // scales.shape[1]
            return w2a16_matmul(x, qw, scales, group_size)
        if kind == "w4a8":
            # byte-pair layout: qw is (O, K//2) int8
            return w4a8_matmul(x, qw, scales,
                               (qw.shape[1] * 2) // scales.shape[1])
        group_size = (qw.shape[1] * 8) // scales.shape[1]
        if kind == "w4a16_asym":
            return w4a16_asym_matmul(x, qw, scales, entry[2], group_size)
        if kind in ("mxfp4_g16", "mxfp4_g32"):
            # group size rides in the STATIC kind string — shape-based
            # recovery is ambiguous (padded g=32 cols == exact g=16 cols
            # at K=2048)
            return mxfp4_matmul(x, qw, scales, int(kind.rsplit("_g", 1)[1]))
        return w4a16_matmul(x, qw, scales, group_size)

    @staticmethod
    def _make_linear_fn(packed, block_idx: int, kinds=None,
                        a8_prompt: bool = False):
        def lf(name, x, w, b=None):
            key = f"blocks.{block_idx}.{name}"
            if key in packed:
                kind = (kinds or {}).get(key, "w4a16")
                y = QuantizedLlama._packed_matmul(x, packed[key], kind,
                                                  a8_prompt)
            else:
                y = jnp.einsum("...i,oi->...o", x, w)
            if b is not None:
                y = y + b
            return y

        def grouped(wname, x_slabs):
            """Grouped expert matmul over (E, C, K) slabs, or None when
            this block's experts aren't stacked (MoE fns fall back to
            the per-expert interceptor)."""
            entry = packed.get(f"blocks.{block_idx}.experts_stack.{wname}")
            if entry is None:
                return None
            from ..ops.qmatmul import (PLANES, w4a16_matmul_grouped,
                                       w4a16_matmul_grouped_ref)
            qw, sc = entry
            g = (qw.shape[2] * PLANES) // sc.shape[2]
            # prefill routing (same rationale as _packed_matmul): at
            # large per-expert token counts dequant ONCE per expert
            # instead of per batch tile
            thresh = envs.AR_PREFILL_DEQUANT_TOKENS
            if thresh > 0 and int(x_slabs.shape[1]) >= thresh:
                return w4a16_matmul_grouped_ref(x_slabs, qw, sc, g)
            return w4a16_matmul_grouped(x_slabs, qw, sc, g)

        lf.grouped = grouped
        prefix = f"blocks.{block_idx}.experts_stack."
        lf.grouped_names = frozenset(
            k[len(prefix):] for k in packed if k.startswith(prefix))
        return lf

    @staticmethod
    def _fused_call(packed, splits_table, block_idx: int, fused_name: str,
                    x, kinds=None):
        """Run a fused projection group if available; returns list of
        member outputs or None.  ``splits_table`` is static."""
        key = f"blocks.{block_idx}.{fused_name}"
        entry = packed.get(key)
        if entry is None or splits_table is None or key not in splits_table:
            return None
        kind = (kinds or {}).get(key, "w4a16")
        y = QuantizedLlama._packed_matmul(x, entry, kind)
        outs = []
        off = 0
        for s in splits_table[key]:
            outs.append(y[..., off:off + s])
            off += s
        return outs

    def _a8_packed(self):
        """Packed dict with byte-pair copies appended to eligible W4
        entries — built ONCE (the per-call plane→byte repack measured
        ~100 ms of VPU work per 8B prefill).  +0.5 byte/weight HBM,
        opt-in via ``prefill_a8``."""
        cached = getattr(self, "_a8_packed_cache", None)
        if cached is not None:
            return cached
        from ..ops.qmatmul import unpack_w4_planes

        @jax.jit
        def to_bytes(qw):
            return pack_w4_bytes(unpack_w4_planes(qw, 128))

        out = {}
        for key, entry in self.packed.items():
            kind = (self.packed_kinds or {}).get(key, "w4a16")
            qw, sc = entry[0], entry[1]
            g = (qw.shape[1] * 8) // sc.shape[1] if kind == "w4a16" else 0
            if (kind == "w4a16" and len(entry) == 2 and g == 128
                    and qw.shape[0] % 256 == 0
                    and (qw.shape[1] * 8) % 256 == 0):
                out[key] = (qw, sc, to_bytes(qw))
            else:
                out[key] = entry
        self._a8_packed_cache = out
        return out

    def prefill(self, input_ids: jax.Array) -> Tuple[jax.Array, KVCache]:
        """Run the prompt, return (logits_last, cache)."""
        packed = self._a8_packed() if self.prefill_a8 else self.packed
        return self._prefill_c(self.params, packed,
                               jnp.asarray(input_ids))

    def _prefill_impl(self, params, packed, input_ids):
        kinds = self.packed_kinds
        a8 = self.prefill_a8
        from ..models.deepseek import DeepseekConfig
        from ..models.minimax import MiniMaxConfig
        from ..models.qwen3next import Qwen3NextConfig
        if isinstance(self.cfg, (Qwen3NextConfig, MiniMaxConfig)):
            return _q3n_prefill_core(
                params, packed, input_ids, cfg=self.cfg,
                max_seq=self.max_seq,
                lf_maker=lambda p, i: self._make_linear_fn(p, i, kinds, a8),
                kinds=kinds)
        if isinstance(self.cfg, DeepseekConfig) and self.cfg.kv_lora_rank:
            return _mla_prefill_core(
                params, packed, input_ids, cfg=self.cfg,
                max_seq=self.max_seq, kv_quant=self.kv_quant,
                lf_maker=lambda p, i: self._make_linear_fn(p, i, kinds, a8),
                kinds=kinds)
        return _prefill_core(params, packed, input_ids, cfg=self.cfg,
                             max_seq=self.max_seq, kv_quant=self.kv_quant,
                             lf_maker=lambda p, i: self._make_linear_fn(
                                 p, i, kinds, a8), kinds=kinds)

    def decode_step(self, token: jax.Array, cache: KVCache
                    ) -> Tuple[jax.Array, KVCache]:
        """One token for the whole batch: token (B,) → (logits (B, V), cache)."""
        return self._decode_c(self.params, self.packed, token, cache)

    def _decode_impl(self, params, packed, token, cache):
        kinds = self.packed_kinds
        from ..models.deepseek import DeepseekConfig
        from ..models.minimax import MiniMaxConfig
        from ..models.qwen3next import Qwen3NextConfig
        if isinstance(self.cfg, (Qwen3NextConfig, MiniMaxConfig)):
            return _q3n_decode_core(
                params, packed, token, cache, cfg=self.cfg,
                lf_maker=lambda p, i: self._make_linear_fn(p, i, kinds),
                kinds=kinds)
        if isinstance(self.cfg, DeepseekConfig) and self.cfg.kv_lora_rank:
            return _mla_decode_core(
                params, packed, token, cache, cfg=self.cfg,
                kv_quant=self.kv_quant,
                lf_maker=lambda p, i: self._make_linear_fn(p, i, kinds),
                kinds=kinds)
        return _decode_core(params, packed, token, cache, cfg=self.cfg,
                            kv_quant=self.kv_quant,
                            lf_maker=lambda p, i: self._make_linear_fn(
                                p, i, kinds),
                            fused_packed=packed,
                            splits_table=self.fused_splits,
                            kinds=kinds)

    def generate(self, input_ids: jax.Array, max_new_tokens: int = 32,
                 sampling: Optional["SamplingParams"] = None) -> jax.Array:
        """Generation: greedy by default, temperature/top-k/top-p with a
        seeded key when ``sampling`` is given (``serve.SamplingParams``).
        Returns (B, max_new_tokens) token ids."""
        from .sampling import sample_token
        key = (jax.random.PRNGKey(sampling.seed)
               if sampling is not None and not sampling.is_greedy else None)

        def nxt(logits):
            nonlocal key
            k = None
            if key is not None:
                key, k = jax.random.split(key)
            return sample_token(logits, k, sampling)

        logits, cache = self.prefill(jnp.asarray(input_ids))
        tok = nxt(logits)
        out = [tok]
        for _ in range(max_new_tokens - 1):
            logits, cache = self.decode_step(tok, cache)
            tok = nxt(logits)
            out.append(tok)
        return jnp.stack(out, axis=1)

    def generate_scan(self, input_ids: jax.Array,
                      max_new_tokens: int = 32,
                      sampling: Optional["SamplingParams"] = None
                      ) -> jax.Array:
        """Generation with the decode loop as one on-device ``lax.scan``
        — no per-token host dispatch (the TPU-idiomatic serving loop;
        matters most over high-latency links).  The PRNG key rides in
        the scan carry, split once per step."""
        from .sampling import sample_token
        key = ("gen_scan", int(max_new_tokens), sampling)
        fn = getattr(self, "_gen_scan_cache", {}).get(key)
        if fn is None:
            def impl(params, packed, ids, rng):
                logits, cache = self._prefill_impl(params, packed, ids)
                rng, k0 = jax.random.split(rng)
                tok0 = sample_token(logits, k0, sampling)

                def step(carry, _):
                    tok, cache, rng = carry
                    lg, cache = self._decode_impl(params, packed, tok, cache)
                    rng, k = jax.random.split(rng)
                    nxt = sample_token(lg, k, sampling)
                    return (nxt, cache, rng), nxt

                (_, _, _), toks = jax.lax.scan(
                    step, (tok0, cache, rng), None,
                    length=max_new_tokens - 1)
                return jnp.concatenate([tok0[:, None], toks.T], axis=1)

            fn = jax.jit(impl)
            if not hasattr(self, "_gen_scan_cache"):
                self._gen_scan_cache = {}
            self._gen_scan_cache[key] = fn
        rng = jax.random.PRNGKey(sampling.seed if sampling else 0)
        packed = self._a8_packed() if self.prefill_a8 else self.packed
        return fn(self.params, packed, jnp.asarray(input_ids), rng)


def _final_fwd_packed(params, packed, x, cfg, kinds=None, combine=None):
    """final norm + lm_head, through the packed kernel when the head was
    quantized (``quant_lm_head``) — at 128K vocab the dense bf16 head is
    the single largest HBM read of a decode step.  ``combine`` gathers
    vocab-sharded logit shards (TP engine all_gather over tp)."""
    entry = (packed or {}).get("lm_head")
    if entry is None:
        return llama.final_fwd(params, x, cfg)
    h = llama.rms_norm(x, params["norm"], cfg.rms_eps, cfg.norm_offset)
    kind = (kinds or {}).get("lm_head", "w4a16")
    logits = QuantizedLlama._packed_matmul(h, entry, kind)
    if combine is not None:
        logits = combine(logits)
    if cfg.final_logit_softcap:
        logits = llama._softcap(logits.astype(jnp.float32),
                                cfg.final_logit_softcap).astype(logits.dtype)
    return logits


def _mla_prefill_core(params, packed, input_ids, *, cfg, max_seq,
                      kv_quant, lf_maker, kinds=None, final_combine=None):
    """DeepSeek/MLA prompt pass: cache the compressed latents
    (optionally int8/fp8 with per-layer scalar scales calibrated on the
    prompt — the latents are rms-normed, so one scale per layer is
    tight)."""
    from ..models import deepseek
    B, S = input_ids.shape
    cache = _init_cache(cfg, B, max_seq, cfg.num_layers, kv_quant)
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = deepseek.rope_tables(cfg, S)
    cks, krs = [], []
    for i in range(cfg.num_layers):
        x, c_kv, k_rope = deepseek.block_with_cache(
            params["blocks"][i], x, cos, sin, cfg, None, None,
            lf_maker(packed, i))
        cks.append(c_kv[:, :, None, :])    # (B, S, 1, r)
        krs.append(k_rope)                 # (B, S, 1, dr)
    k_stack = jnp.stack(cks)
    v_stack = jnp.stack(krs)
    k_scale = v_scale = None
    if kv_quant is not None:
        qmax = _KV_QMAX[kv_quant]
        amax = lambda t: jnp.maximum(
            jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(1, 2, 3, 4),
                    keepdims=True), 1e-6)
        # 1.2× headroom: these scales calibrate on the PROMPT's latents
        # but also quantize every DECODE token's latents; rms-normed
        # latents drift little, but long generations can exceed the
        # prompt max and would clip silently at ±qmax.  Headroom costs
        # <0.3 bit of effective range and removes the drift cliff.
        k_scale = amax(k_stack) * (_MLA_SCALE_HEADROOM / qmax)
        v_scale = amax(v_stack) * (_MLA_SCALE_HEADROOM / qmax)
        k_stack = _kv_quantize(k_stack, k_scale, kv_quant)
        v_stack = _kv_quantize(v_stack, v_scale, kv_quant)
    cache = KVCache(
        k=jax.lax.dynamic_update_slice(
            cache.k, k_stack.astype(cache.k.dtype), (0, 0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(
            cache.v, v_stack.astype(cache.v.dtype), (0, 0, 0, 0, 0)),
        length=jnp.asarray(S, jnp.int32),
        k_scale=k_scale, v_scale=v_scale,
    )
    logits = _final_fwd_packed(params, packed, x[:, -1:], cfg, kinds,
                               final_combine)
    return logits[:, 0], cache


def _mla_decode_core(params, packed, token, cache, *, cfg, kv_quant,
                     lf_maker, kinds=None, final_combine=None):
    """One MLA decode step: absorbed latent attention over the
    compressed cache (``deepseek.block_with_cache``)."""
    from ..models import deepseek
    pos = cache.length
    x = llama.embed_fwd(params, token[:, None], cfg)
    cos, sin = deepseek.rope_tables(cfg, 1, positions=pos[None])
    new_k, new_v = cache.k, cache.v
    for i in range(cfg.num_layers):
        if kv_quant is None:
            kv = (new_k[i], new_v[i])
        else:
            kv = (kv_quant, new_k[i], new_v[i],
                  cache.k_scale[i].reshape(()),
                  cache.v_scale[i].reshape(()))
        x, c_kv, k_rope = deepseek.block_with_cache(
            params["blocks"][i], x, cos, sin, cfg, kv, pos,
            lf_maker(packed, i))
        if kv_quant is not None:
            c_kv = _kv_quantize(c_kv, cache.k_scale[i, 0, 0], kv_quant)
            k_rope = _kv_quantize(k_rope, cache.v_scale[i, 0], kv_quant)
        new_k = jax.lax.dynamic_update_slice(
            new_k, c_kv[:, :, None, :][None].astype(new_k.dtype),
            (i, 0, pos, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, k_rope[None].astype(new_v.dtype), (i, 0, pos, 0, 0))
    logits = _final_fwd_packed(params, packed, x, cfg, kinds,
                               final_combine)
    return logits[:, 0], KVCache(new_k, new_v, pos + 1,
                                 cache.k_scale, cache.v_scale)


def _q3n_prefill_core(params, packed, input_ids, *, cfg, max_seq,
                      lf_maker, kinds=None):
    """Qwen3-Next hybrid prompt pass: KV for full-attention layers,
    conv tails + recurrent states for the GatedDeltaNet layers.
    MiniMax rides the same protocol (zero-width conv tails, lightning
    states) via the family's ``block_with_cache``."""
    from ..models.registry import get_model_fns
    bwc = get_model_fns(cfg).block_with_cache
    B, S = input_ids.shape
    lt = cfg.layer_types
    full_ids = [i for i in range(cfg.num_layers)
                if lt[i] == "full_attention"]
    lin_ids = [i for i in range(cfg.num_layers)
               if lt[i] == "linear_attention"]
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = llama.rope_tables(cfg, S)
    ks, vs, tails, states = {}, {}, {}, {}
    for i in range(cfg.num_layers):
        x, pieces = bwc(
            params["blocks"][i], x, cos, sin, cfg, None, None,
            lf_maker(packed, i))
        if pieces[0] == "lin":
            tails[i], states[i] = pieces[1], pieces[2]
        else:
            ks[i], vs[i] = pieces[1], pieces[2]
    nkv, hd = cfg.num_kv_heads, cfg.hd
    k_buf = jnp.zeros((len(full_ids), B, max_seq, nkv, hd), cfg.dtype)
    v_buf = jnp.zeros_like(k_buf)
    if full_ids:
        k_buf = jax.lax.dynamic_update_slice(
            k_buf, jnp.stack([ks[i] for i in full_ids]).astype(
                k_buf.dtype), (0, 0, 0, 0, 0))
        v_buf = jax.lax.dynamic_update_slice(
            v_buf, jnp.stack([vs[i] for i in full_ids]).astype(
                v_buf.dtype), (0, 0, 0, 0, 0))
    cache = HybridCache(
        k=k_buf, v=v_buf,
        conv=jnp.stack([tails[i] for i in lin_ids]),
        state=jnp.stack([states[i] for i in lin_ids]),
        length=jnp.asarray(S, jnp.int32),
    )
    logits = _final_fwd_packed(params, packed, x[:, -1:], cfg, kinds)
    return logits[:, 0], cache


def _q3n_decode_core(params, packed, token, cache, *, cfg, lf_maker,
                     kinds=None):
    """One hybrid decode step: O(1) recurrent updates on linear layers,
    cached attention on full layers."""
    from ..models.registry import get_model_fns
    bwc = get_model_fns(cfg).block_with_cache
    lt = cfg.layer_types
    full_pos = {}
    lin_pos = {}
    nf = nl = 0
    for i in range(cfg.num_layers):
        if lt[i] == "full_attention":
            full_pos[i] = nf
            nf += 1
        else:
            lin_pos[i] = nl
            nl += 1
    pos = cache.length
    x = llama.embed_fwd(params, token[:, None], cfg)
    cos, sin = llama.rope_tables(cfg, 1, positions=pos[None])
    new_k, new_v = cache.k, cache.v
    new_conv, new_state = cache.conv, cache.state
    for i in range(cfg.num_layers):
        if i in lin_pos:
            j = lin_pos[i]
            cin = ("lin", new_conv[j], new_state[j])
        else:
            j = full_pos[i]
            cin = ("full", new_k[j], new_v[j])
        x, pieces = bwc(
            params["blocks"][i], x, cos, sin, cfg, cin, pos,
            lf_maker(packed, i))
        if pieces[0] == "lin":
            new_conv = new_conv.at[lin_pos[i]].set(
                pieces[1].astype(new_conv.dtype))
            new_state = new_state.at[lin_pos[i]].set(pieces[2])
        else:
            j = full_pos[i]
            new_k = jax.lax.dynamic_update_slice(
                new_k, pieces[1][None].astype(new_k.dtype),
                (j, 0, pos, 0, 0))
            new_v = jax.lax.dynamic_update_slice(
                new_v, pieces[2][None].astype(new_v.dtype),
                (j, 0, pos, 0, 0))
    logits = _final_fwd_packed(params, packed, x, cfg, kinds)
    return logits[:, 0], HybridCache(new_k, new_v, new_conv, new_state,
                                     pos + 1)


def _prefill_core(params, packed, input_ids, *, cfg, max_seq, kv_quant,
                  lf_maker, kinds=None, final_combine=None):
    """Prompt pass shared by the single-chip and TP engines.

    ``cfg`` may carry per-shard head counts (TP path: heads divided by tp,
    hidden sizes global) — the math below only reads head counts where
    per-shard values are correct.
    """
    B, S = input_ids.shape
    cache = _init_cache(cfg, B, max_seq, cfg.num_layers, kv_quant)
    x = llama.embed_fwd(params, input_ids, cfg)
    from ..models.registry import get_model_fns
    cos, sin = get_model_fns(cfg).rope_tables(cfg, S)
    cosl, sinl = (llama.rope_tables(cfg, S, local=True)
                  if getattr(cfg, "rope_local_theta", 0.0) else (cos, sin))
    ks, vs = [], []
    for i in range(cfg.num_layers):
        sl = llama.layer_is_sliding(cfg, i)
        x, k_new, v_new = _block_with_cache(
            params["blocks"][i], x, cosl if sl else cos,
            sinl if sl else sin, cfg,
            None, None, lf_maker(packed, i), block_idx=i)
        ks.append(k_new)
        vs.append(v_new)
    k_stack = jnp.stack(ks)  # (L, B, S, n_kv, hd)
    v_stack = jnp.stack(vs)
    k_scale = v_scale = None
    if kv_quant is not None:
        # static per-(layer, head) scales calibrated on the prompt
        qmax = _KV_QMAX[kv_quant]
        amax = lambda t: jnp.maximum(
            jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(1, 2, 4),
                    keepdims=True), 1e-6)
        k_scale = amax(k_stack) / qmax
        v_scale = amax(v_stack) / qmax
        k_stack = _kv_quantize(k_stack, k_scale, kv_quant)
        v_stack = _kv_quantize(v_stack, v_scale, kv_quant)
    cache = KVCache(
        k=jax.lax.dynamic_update_slice(
            cache.k, k_stack.astype(cache.k.dtype), (0, 0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(
            cache.v, v_stack.astype(cache.v.dtype), (0, 0, 0, 0, 0)),
        length=jnp.asarray(S, jnp.int32),
        k_scale=k_scale, v_scale=v_scale,
    )
    logits = _final_fwd_packed(params, packed, x[:, -1:], cfg, kinds,
                               final_combine)
    return logits[:, 0], cache


def _decode_core(params, packed, token, cache, *, cfg, kv_quant, lf_maker,
                 fused_packed=None, splits_table=None, kinds=None,
                 final_combine=None):
    """One decode step shared by the single-chip and TP engines.

    ``fused_packed``/``splits_table`` enable the fused qkv / gate_up path
    (single-chip only — fused entries concatenate along O, which would
    split q/k/v unevenly under a tp shard)."""
    pos = cache.length
    x = llama.embed_fwd(params, token[:, None], cfg)
    from ..models.registry import get_model_fns
    cos, sin = get_model_fns(cfg).rope_tables(cfg, 1, positions=pos[None])
    cosl, sinl = (llama.rope_tables(cfg, 1, positions=pos[None], local=True)
                  if getattr(cfg, "rope_local_theta", 0.0) else (cos, sin))
    new_k, new_v = cache.k, cache.v
    for i in range(cfg.num_layers):
        if kv_quant is None:
            kv = (new_k[i], new_v[i])
        elif kv_quant == "int8":
            # int8 caches flow to the fused decode-attention kernel
            # unmaterialized (scales applied in-kernel)
            kv = ("int8_cache", new_k[i], new_v[i],
                  cache.k_scale[i], cache.v_scale[i])
        else:
            ks, vs = cache.k_scale[i], cache.v_scale[i]
            kv = (_kv_dequantize(new_k[i], ks, cfg.dtype),
                  _kv_dequantize(new_v[i], vs, cfg.dtype))
        sl = llama.layer_is_sliding(cfg, i)
        x, k_new, v_new = _block_with_cache(
            params["blocks"][i], x, cosl if sl else cos,
            sinl if sl else sin, cfg,
            kv, pos, lf_maker(packed, i), packed=fused_packed,
            block_idx=i, splits_table=splits_table, kinds=kinds)
        if kv_quant is not None:
            k_new = _kv_quantize(k_new, cache.k_scale[i], kv_quant)
            v_new = _kv_quantize(v_new, cache.v_scale[i], kv_quant)
        new_k = jax.lax.dynamic_update_slice(
            new_k, k_new[None].astype(new_k.dtype), (i, 0, pos, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, v_new[None].astype(new_v.dtype), (i, 0, pos, 0, 0))
    logits = _final_fwd_packed(params, packed, x, cfg, kinds,
                               final_combine)
    return logits[:, 0], KVCache(new_k, new_v, pos + 1,
                                 cache.k_scale, cache.v_scale)


def _block_with_cache(weights, x, cos, sin, cfg, kv, pos, lf,
                      packed=None, block_idx=None, splits_table=None,
                      kinds=None):
    """Decoder block returning (out, k_new, v_new); kv=(k_all, v_all) with
    valid length ``pos`` enables decode attention over the cache.
    When ``packed``/``block_idx`` are given, fused qkv / gate_up packed
    projections are used where available (fewer kernel launches)."""
    B, S, H = x.shape
    hd = cfg.hd
    off = cfg.norm_offset
    h = llama.rms_norm(x, weights["input_layernorm"], cfg.rms_eps, off)
    fused_qkv = (QuantizedLlama._fused_call(packed, splits_table,
                                            block_idx, "qkv", h, kinds)
                 if packed is not None else None)
    if fused_qkv is not None:
        q, k, v = fused_qkv
        if weights.get("q_bias") is not None:
            q = q + weights["q_bias"]
            k = k + weights["k_bias"]
            v = v + weights["v_bias"]
    else:
        q = lf("q_proj", h, weights["q_proj"], weights.get("q_bias"))
        k = lf("k_proj", h, weights["k_proj"], weights.get("k_bias"))
        v = lf("v_proj", h, weights["v_proj"], weights.get("v_bias"))
    q = q.reshape(B, S, cfg.num_heads, hd)
    k = k.reshape(B, S, cfg.num_kv_heads, hd)
    v = v.reshape(B, S, cfg.num_kv_heads, hd)
    from ..models.llama4 import Llama4Config, _interleave, _l2_norm, \
        layer_uses_rope
    l4 = isinstance(cfg, Llama4Config)
    if l4:
        # Llama4: interleaved rope + weightless L2 q/k norm on rope
        # layers; NoPE layers skip rope and temperature-scale queries
        if layer_uses_rope(cfg, block_idx or 0):
            q = llama.apply_rope(_interleave(q), cos, sin)
            k = llama.apply_rope(_interleave(k), cos, sin)
            if cfg.use_qk_norm:
                q = _l2_norm(q, cfg.rms_eps)
                k = _l2_norm(k, cfg.rms_eps)
        elif cfg.attn_temperature_tuning:
            per_slot = pos is not None and jnp.ndim(pos) != 0
            if pos is None:
                p4 = jnp.arange(S)                       # prefill
            elif per_slot:
                p4 = pos                                  # (B,) decode
            else:
                p4 = pos + jnp.arange(S)                  # scalar decode
            ts = (jnp.log1p(jnp.floor((p4.astype(jnp.float32) + 1.0)
                                      / cfg.floor_scale))
                  * cfg.temp_attn_scale + 1.0)
            ts = (ts[:, None, None, None] if per_slot
                  else jnp.reshape(ts, (1, -1, 1, 1)))
            q = (q.astype(jnp.float32) * ts).astype(q.dtype)
    else:
        if cfg.qk_norm:  # Qwen3/Gemma3
            q = llama.rms_norm(q, weights["q_norm"], cfg.rms_eps, off)
            k = llama.rms_norm(k, weights["k_norm"], cfg.rms_eps, off)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
    k_new, v_new = k, v

    sliding = (block_idx is not None
               and llama.layer_is_sliding(cfg, block_idx))
    sinks = weights.get("sinks")
    if kv is None:
        mask = (llama.sliding_mask(cfg, S)
                if sliding and S > cfg.sliding_window else None)
        if sinks is not None:
            from ..models.gptoss import sink_attention
            attn = sink_attention(q, k, v, mask, sinks, cfg)
        else:
            attn = llama.attention(q, k, v, mask, cfg)
    elif isinstance(kv, tuple) and len(kv) == 5 and kv[0] == "int8_cache":
        # fused path: attend directly over the INT8 cache (per-head scales
        # folded into score scale / output epilogue) — no bf16 cache
        # materialization (ops/decode_attention.py)
        from ..ops.decode_attention import decode_attention
        _, k_all, v_all, ks, vs = kv          # int8 (B, T, n_kv, hd)
        ksv = ks.reshape(-1)                  # (n_kv,)
        vsv = vs.reshape(-1)
        k_tok = _kv_quantize(k, ks, "int8")
        v_tok = _kv_quantize(v, vs, "int8")
        if jnp.ndim(pos) == 0:
            k_full = jax.lax.dynamic_update_slice(k_all, k_tok,
                                                  (0, pos, 0, 0))
            v_full = jax.lax.dynamic_update_slice(v_all, v_tok,
                                                  (0, pos, 0, 0))
        else:
            bidx = jnp.arange(B)
            k_full = k_all.at[bidx, pos].set(k_tok[:, 0])
            v_full = v_all.at[bidx, pos].set(v_tok[:, 0])
        sm = 1.0 / (cfg.attn_scale if cfg.attn_scale is not None
                    else float(np.sqrt(hd)))
        chunked = bool(getattr(cfg, "chunked_attention", False))
        attn = decode_attention(
            q[:, 0], k_full, v_full, pos, ksv, vsv, sm,
            softcap=cfg.attn_logit_softcap or 0.0,
            window=(cfg.sliding_window if sliding and not chunked
                    else None),
            chunk=(cfg.sliding_window if sliding and chunked else None),
            sinks=sinks)[:, None]
    else:
        k_all, v_all = kv  # (B, T, n_kv, hd) preallocated
        T = k_all.shape[1]
        idx = jnp.arange(T)
        if jnp.ndim(pos) == 0:
            k_full = jax.lax.dynamic_update_slice(
                k_all, k.astype(k_all.dtype), (0, pos, 0, 0))
            v_full = jax.lax.dynamic_update_slice(
                v_all, v.astype(v_all.dtype), (0, pos, 0, 0))
            # mask positions beyond pos (+ current token); sliding layers
            # also drop positions older than the window
            valid = idx <= pos  # current token at index pos
            if sliding:
                w = cfg.sliding_window
                if getattr(cfg, "chunked_attention", False):
                    valid = valid & (idx >= (pos // w) * w)
                else:
                    valid = valid & (idx > pos - w)
            bias = jnp.where(valid, 0.0, -1e30)[None, None, None, :]
        else:
            # per-slot positions (continuous batching): each slot appends
            # its token at its own length and masks independently
            bidx = jnp.arange(B)
            k_full = k_all.at[bidx, pos].set(k[:, 0].astype(k_all.dtype))
            v_full = v_all.at[bidx, pos].set(v[:, 0].astype(v_all.dtype))
            valid = idx[None, :] <= pos[:, None]
            if sliding:
                w = cfg.sliding_window
                if getattr(cfg, "chunked_attention", False):
                    valid = valid & (idx[None, :]
                                     >= (pos[:, None] // w) * w)
                else:
                    valid = valid & (idx[None, :] > pos[:, None] - w)
            bias = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
        # attention() expects mask broadcastable to (B, nh, S, T)
        if sinks is not None:
            from ..models.gptoss import sink_attention
            attn = sink_attention(q, k_full, v_full, bias, sinks, cfg)
        else:
            attn = llama.attention(q, k_full, v_full, bias, cfg)
    attn = attn.reshape(B, S, -1)
    attn_out = lf("o_proj", attn, weights["o_proj"], weights.get("o_bias"))
    if cfg.sandwich_norms:  # Gemma2
        attn_out = llama.rms_norm(attn_out,
                                  weights["post_attention_layernorm"],
                                  cfg.rms_eps, off)
        x = x + attn_out
        h = llama.rms_norm(x, weights["pre_feedforward_layernorm"],
                           cfg.rms_eps, off)
    else:
        x = x + attn_out
        h = llama.rms_norm(x, weights["post_attention_layernorm"],
                           cfg.rms_eps, off)
    if "experts" in weights:
        from .. import envs
        if l4:
            from ..models.llama4 import _moe_mlp as _l4_moe_mlp
            mlp_out = _l4_moe_mlp(
                weights, h, cfg, lf,
                capacity_factor=envs.AR_MOE_CAPACITY_FACTOR)
        elif "router_bias" in weights:
            # GPT-OSS: top-k-then-softmax router with bias + clamped
            # SwiGLU experts — shared with the tuning path
            from ..models.gptoss import _moe_mlp as _oss_moe_mlp
            mlp_out = _oss_moe_mlp(
                weights, h, cfg, lf,
                capacity_factor=envs.AR_MOE_CAPACITY_FACTOR)
        elif "gate" in weights:
            # DeepSeek/GLM-style router (sigmoid/softmax + aux-free bias
            # + group limiting) — shared with the tuning path; capacity
            # dispatch rides the same env knob as Mixtral serving
            from .. import envs
            from ..models.deepseek import _moe_mlp as _ds_moe_mlp
            mlp_out = _ds_moe_mlp(
                weights, h, cfg, lf,
                capacity_factor=envs.AR_MOE_CAPACITY_FACTOR)
        else:
            # Mixtral-style sparse MoE via the shared interceptor (packed
            # expert projections hit the fused kernel through lf just like
            # dense layers); AR_MOE_CAPACITY_FACTOR>0 switches serving to
            # capacity-based dispatch (each expert computes C tokens,
            # not N)
            from .. import envs
            from ..models.mixtral import _moe_mlp
            mlp_out = _moe_mlp(weights, h, cfg, lf,
                               capacity_factor=envs.AR_MOE_CAPACITY_FACTOR)
    else:
        act = llama._act(cfg.hidden_act)
        fused_gu = (QuantizedLlama._fused_call(packed, splits_table,
                                               block_idx, "gate_up", h,
                                               kinds)
                    if packed is not None else None)
        if fused_gu is not None:
            gate, up = act(fused_gu[0]), fused_gu[1]
        else:
            gate = act(lf("gate_proj", h, weights["gate_proj"]))
            up = lf("up_proj", h, weights["up_proj"])
        mlp_in = gate * up
        if cfg.online_r4:
            mlp_in = llama.r4_rotate(mlp_in, cfg.r4_block)
        mlp_out = lf("down_proj", mlp_in, weights["down_proj"])
    if cfg.sandwich_norms:
        mlp_out = llama.rms_norm(mlp_out,
                                 weights["post_feedforward_layernorm"],
                                 cfg.rms_eps, off)
    return x + mlp_out, k_new, v_new
