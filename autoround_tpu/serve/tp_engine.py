"""Tensor+data-parallel serving engine over a ``jax.sharding.Mesh``.

New capability vs the reference (its serving story hands QuantLinear
kernels to HF/vLLM and has no multi-device engine of its own — SURVEY.md
§2.4): here the packed-int4 decode loop itself is laid out on a (dp, tp)
mesh the Megatron way and run under ``shard_map`` so the Pallas kernel
sees concrete per-shard shapes (``pallas_call`` does not partition under
GSPMD):

  * ``tp`` — column-parallel q/k/v/gate/up (qweight+scales sharded on O),
    row-parallel o/down (sharded on K) with one explicit ``psum`` per
    attention/MLP pair; the KV cache shards over kv-heads so attention is
    fully local and rides ICI only through the two psums per block.
  * ``dp`` — batch-shards prompts and the KV cache; no collectives in the
    forward path.

Fused qkv/gate_up entries are NOT used here: they concatenate along O, so
an even tp split would cut across the q/k/v boundary.  The unfused packed
entries (kept by ``_fuse_packed``) shard cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama
from ..ops.qmatmul import pack_w4_planes, unpack_w4_planes, w4a16_matmul
from ..utils.logger import logger
from .engine import (KVCache, QuantizedLlama, _decode_core, _prefill_core)

__all__ = ["TPQuantizedLlama"]

_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "q_b_proj")
_ROW = ("o_proj", "down_proj")
_BIAS = ("q_bias", "k_bias", "v_bias")


def _weight_spec(name: str, leaf) -> Optional[P]:
    if leaf is None:
        return None
    if name in _COL:
        return P("tp", None)
    if name in _ROW:
        return P(None, "tp")
    if name in _BIAS:
        return P("tp")
    if name == "kv_b_proj":
        # MLA decompression weight: (nh·(dn+dv), r) stays a dense leaf
        # (absorbed decode contracts it per head) and shards on heads —
        # a contiguous row split lands exactly on head boundaries
        return P("tp", None)
    if name == "sinks":
        return P("tp")  # per-head attention sinks follow the head split
    return P()  # norms / q_a / kv_a latents / expert biases (full-O,
    #             sliced to local experts in the grouped path) replicated


def _params_specs(params) -> Dict[str, Any]:
    def leaf_spec(n, w):
        if isinstance(w, dict):
            # expert / shared_expert dicts: shard leaf-wise BY NAME so
            # the dense fallback matches lf's row-parallel psum (a
            # replicated down_proj would double-count under the psum)
            return {kk: leaf_spec(kk, vv) for kk, vv in w.items()}
        if isinstance(w, (list, tuple)):
            return [leaf_spec(n, e) for e in w]
        return _weight_spec(n, w)

    specs: Dict[str, Any] = {}
    for k, v in params.items():
        if k == "blocks":
            specs[k] = [{n: leaf_spec(n, w) for n, w in blk.items()}
                        for blk in v]
        else:
            specs[k] = None if v is None else P()
    return specs


def _packed_specs(packed) -> Dict[str, Tuple[P, P]]:
    specs = {}
    for key, (qw, sc) in packed.items():
        lname = key.split(".")[-1]
        if "experts_stack" in key:
            # EXPERT PARALLELISM: the stacked (E, O, Kw) payload shards
            # on the expert dim; each device serves E/tp experts and the
            # routed output psums across tp (the combine)
            specs[key] = (P("tp", None, None), P("tp", None, None))
        # w8a8 entries carry a 1-D (O,) scale; w4 scales are (O, K/g)
        elif lname in _COL:
            sspec = P("tp") if sc.ndim == 1 else P("tp", None)
            specs[key] = (P("tp", None), sspec)
        elif lname in _ROW:
            # row-parallel: weight shards on K; per-O scales replicate
            sspec = P() if sc.ndim == 1 else P(None, "tp")
            specs[key] = (P(None, "tp"), sspec)
        elif key == "lm_head":
            # vocab-sharded head: each device scores V/tp tokens, the
            # cores all-gather the logit shards (final_combine)
            specs[key] = (P("tp", None), P("tp", None))
        else:
            specs[key] = (P(), P())
    return specs


def _cache_spec(kv_quant: Optional[str]) -> KVCache:
    sc = P(None, None, None, "tp", None) if kv_quant is not None else None
    return KVCache(k=P(None, "dp", None, "tp", None),
                   v=P(None, "dp", None, "tp", None),
                   length=P(), k_scale=sc, v_scale=sc)


def _mla_cache_spec(kv_quant: Optional[str]) -> KVCache:
    """MLA latents are MQA-like (one r+dr vector per token): the cache
    replicates over tp — every shard scores its local heads against the
    full latent stream — and shards only the batch over dp."""
    sc = P() if kv_quant is not None else None
    return KVCache(k=P(None, "dp", None, None, None),
                   v=P(None, "dp", None, None, None),
                   length=P(), k_scale=sc, v_scale=sc)


def _make_tp_linear_fn(packed, block_idx: int, kinds=None,
                       psum_dtype=None):
    """Per-shard linear: packed kernel or dense einsum; row-parallel
    layers complete their contraction with a psum over ``tp``.  Dequant
    is linear in the int32 accumulator, so per-shard dequantized partials
    (each with its own local per-token act scale) sum exactly.

    ``psum_dtype`` (the engine dtype) halves the activation all-reduce
    wire bytes for bf16 engines: attention/MLP internals hand the
    row-parallel projections f32 activations, so without the cast the
    (B, H) psums ride f32 even in a bf16 deployment.  f32 engines pass
    f32 and keep exact parity.

    Expert parallelism: stacked expert payloads shard on E, so
    ``lf.grouped`` serves the LOCAL expert slab, ``lf.expert_offset``
    maps global routing ids to local rows, and ``lf.expert_combine``
    psums the routed output across tp (the MoE combine)."""

    def lf(name, x, w, b=None):
        key = f"blocks.{block_idx}.{name}"
        if key in packed:
            kind = (kinds or {}).get(key) or "w4a16"
            if kind in ("w4a16", "w4a8"):
                # row shards may be tile-padded (see _reshard_row_layers):
                # zero-pad the matching x columns (codes there dequant to
                # 0, so the padded lanes contribute nothing)
                k_exp = packed[key][0].shape[1] * (
                    8 if kind == "w4a16" else 2)
                if x.shape[-1] < k_exp:
                    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                                + [(0, k_exp - x.shape[-1])])
            y = QuantizedLlama._packed_matmul(x, packed[key], kind)
        else:
            y = jnp.einsum("...i,oi->...o", x, w)
        # shared_experts.down_proj etc. are row-parallel too
        if name.split(".")[-1] in _ROW:
            if psum_dtype is not None and y.dtype != psum_dtype:
                y = jax.lax.psum(y.astype(psum_dtype), "tp").astype(y.dtype)
            else:
                y = jax.lax.psum(y, "tp")
        if b is not None:
            y = y + b
        return y

    prefix = f"blocks.{block_idx}.experts_stack."
    gnames = frozenset(k[len(prefix):] for k in packed
                       if k.startswith(prefix))

    def grouped(wname, x_slabs):
        entry = packed.get(prefix + wname)
        if entry is None:
            return None
        from ..ops.qmatmul import PLANES, w4a16_matmul_grouped
        qw, sc = entry
        g = (qw.shape[2] * PLANES) // sc.shape[2]
        return w4a16_matmul_grouped(x_slabs, qw, sc, g)

    lf.grouped = grouped
    lf.grouped_names = gnames
    if gnames:
        any_qw = packed[prefix + next(iter(gnames))][0]
        lf.local_experts = any_qw.shape[0]
        lf.expert_offset = jax.lax.axis_index("tp") * any_qw.shape[0]
        def _expert_combine(y):
            if psum_dtype is not None and y.dtype != psum_dtype:
                return jax.lax.psum(y.astype(psum_dtype),
                                    "tp").astype(y.dtype)
            return jax.lax.psum(y, "tp")
        lf.expert_combine = _expert_combine
    return lf


def _validate_shardable(cfg, packed, params, tp: int):
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.num_kv_heads % tp == 0, (cfg.num_kv_heads, tp)
    assert cfg.intermediate_size % tp == 0, (cfg.intermediate_size, tp)
    mi = getattr(cfg, "moe_intermediate_size", 0)
    if mi:
        # dense expert leaves shard by name (col/row); needs even splits
        assert mi % tp == 0, (mi, tp)
    from ..models.gptoss import GptOssConfig
    if isinstance(cfg, GptOssConfig) and getattr(cfg, "num_experts", 0):
        for bi in range(cfg.num_layers):
            if not any(k.startswith(f"blocks.{bi}.experts_stack.")
                       for k in packed):
                raise NotImplementedError(
                    f"TP for GPT-OSS needs stacked experts (block {bi} "
                    "didn't stack): the biased per-expert dense path "
                    "has no sharded fallback")
    for key, (qw, s) in packed.items():
        lname = key.split(".")[-1]
        if "experts_stack" in key:
            assert qw.shape[0] % tp == 0, (
                f"{key}: {qw.shape[0]} experts must divide tp={tp} for "
                "expert parallelism")
            continue
        if lname in _COL:
            assert qw.shape[0] % tp == 0 and s.shape[0] % tp == 0, key


def _reshard_row_layers(packed, params, cfg, tp: int, kinds=None):
    """Make row-parallel packed layers shardable along K.

    The nibble-plane layout interleaves the 8 groups of a K-tile inside
    each int32 word, so a contiguous dim-1 split of qweight is only a
    contiguous K split at whole-tile granularity.  Each shard's K chunk
    is repacked as its own valid nibble-plane block (the concatenation
    shards into per-device packings); a chunk whose K is not a whole
    tile multiple (e.g. the 8B down_proj: 14336/4 = 3584 = 3.5 tiles) is
    PADDED to the next tile with zero-dequant codes (code 8 → exactly 0
    under the sym grid) — the serving lf zero-pads the matching x
    columns, so the padded lanes contribute nothing to the dot or its
    zero-point row-sum correction.  Only group-misaligned splits (or
    packed kinds other than w4/w8a8) dequantize to dense and serve
    through the einsum path (correct, 4x weight bytes for that layer).
    """
    def _set_dense(key, w):
        # walk nested paths (experts.3.down_proj, shared_experts.w2)
        parts = key.split(".")
        tgt = params["blocks"][int(parts[1])]
        for p in parts[2:-1]:
            tgt = tgt[int(p)] if p.isdigit() else tgt[p]
        tgt[parts[-1]] = w

    for key in list(packed):
        lname = key.split(".")[-1]
        if lname not in _ROW or "experts_stack" in key:
            continue  # stacked experts shard on E, not K
        qw, s = packed[key]
        kind0 = (kinds or {}).get(key) or "w4a16"
        if kind0 == "w4a8":
            # byte-pair layout (O, K//2) int8: a contiguous K split is a
            # valid packing at 2g-tile granularity; otherwise pad each
            # shard's codes to the tile with zero-dequant code 8 (hi
            # nibble stores 8^8=0 -> (b & -16) = 0 exactly; lo rides the
            # rowsum correction against zero-padded x)
            from ..ops.qmatmul_int8 import pack_w4_bytes, unpack_w4_bytes
            K = qw.shape[1] * 2
            groups = s.shape[1]
            g = K // groups
            if groups % tp or g != 128:
                pass  # fall through to dense below
            else:
                Kl = K // tp
                tile = 2 * g
                Kp = -(-Kl // tile) * tile
                codes = unpack_w4_bytes(qw)
                chunks = jnp.split(codes, tp, axis=1)
                schunks = jnp.split(s, tp, axis=1)
                if Kp != Kl:
                    chunks = [jnp.pad(c, ((0, 0), (0, Kp - Kl)),
                                      constant_values=8) for c in chunks]
                    schunks = [jnp.pad(sc.astype(jnp.float32),
                                       ((0, 0), (0, (Kp - Kl) // g)),
                                       constant_values=1.0)
                               for sc in schunks]
                    logger.info("tp engine: %s per-shard K %d padded to "
                                "%d for byte-pair repack at tp=%d",
                                key, Kl, Kp, tp)
                packed[key] = (jnp.concatenate(
                    [pack_w4_bytes(c) for c in chunks], axis=1),
                    jnp.concatenate(schunks, axis=1))
                continue
            # dense fallback: exact byte-pair dequant
            codes = unpack_w4_bytes(qw)
            srep = jnp.repeat(s.astype(jnp.float32), g, axis=1)[:, :K]
            w = ((codes - 8).astype(jnp.float32) * srep).astype(cfg.dtype)
            _set_dense(key, w)
            del packed[key]
            logger.info("tp engine: %s K=%d (w4a8) not shardable at "
                        "tp=%d; serving dense", key, K, tp)
            continue
        if qw.dtype == jnp.int8:
            # w8a8: plain (O, K) int8 rows split contiguously on K; only
            # the per-shard lane multiple matters for the Pallas kernel
            if (qw.shape[1] // tp) % 256 == 0:
                continue
            w = (qw.astype(jnp.float32) * s[:, None]).astype(cfg.dtype)
            _set_dense(key, w)
            del packed[key]
            logger.info("tp engine: %s K=%d not lane-shardable at tp=%d; "
                        "serving dense", key, qw.shape[1], tp)
            continue
        kind = (kinds or {}).get(key) or "w4a16"
        K, groups = qw.shape[1] * 8, s.shape[1]
        g = K // groups
        if kind == "w4a16" and groups % tp == 0:
            codes = unpack_w4_planes(qw, g)  # (O, K)
            TKt = 8 * g
            Kl = K // tp
            Kp = -(-Kl // TKt) * TKt
            chunks = jnp.split(codes, tp, axis=1)
            schunks = jnp.split(s, tp, axis=1)
            if Kp != Kl:
                # pad each shard to a whole tile with zero-dequant codes
                chunks = [jnp.pad(c, ((0, 0), (0, Kp - Kl)),
                                  constant_values=8) for c in chunks]
                schunks = [jnp.pad(sc.astype(jnp.float32),
                                   ((0, 0), (0, (Kp - Kl) // g)),
                                   constant_values=1.0) for sc in schunks]
                logger.info("tp engine: %s per-shard K %d padded to %d "
                            "for tile repack at tp=%d", key, Kl, Kp, tp)
            packed[key] = (jnp.concatenate(
                [pack_w4_planes(c, g) for c in chunks], axis=1),
                jnp.concatenate(schunks, axis=1))
        else:
            if kind == "w4a16":
                codes = unpack_w4_planes(qw, g)
                srep = jnp.repeat(s.astype(jnp.float32), g, axis=1)[:, :K]
                w = ((codes - 8).astype(jnp.float32) * srep).astype(
                    cfg.dtype)
            else:
                # non-w4 packed kinds have no K-resharding path yet
                from .engine import QuantizedLlama as _QL
                eye = jnp.eye(K, dtype=jnp.bfloat16)
                w = _QL._packed_matmul(eye, packed[key], kind).astype(
                    cfg.dtype).T
            _set_dense(key, w)
            del packed[key]
            logger.info("tp engine: %s K=%d (%s) not shardable at tp=%d; "
                        "serving dense", key, K, kind, tp)
    return packed, params


@dataclasses.dataclass(eq=False)
class TPQuantizedLlama:
    """Mesh-sharded :class:`QuantizedLlama`.  Build with
    :meth:`from_engine`; batch size must divide the ``dp`` axis."""

    cfg: llama.LlamaConfig
    cfg_local: llama.LlamaConfig   # heads divided by tp; hidden dims global
    params: Dict[str, Any]
    packed: Dict[str, Tuple[jax.Array, jax.Array]]
    mesh: Mesh
    max_seq: int = 2048
    kv_quant: Optional[str] = None
    packed_kinds: Optional[Dict[str, str]] = None

    def __post_init__(self):
        from ..models.deepseek import DeepseekConfig
        is_mla = (isinstance(self.cfg, DeepseekConfig)
                  and bool(self.cfg.kv_lora_rank))
        pspec = _params_specs(self.params)
        kspec = _packed_specs(self.packed)
        cspec = (_mla_cache_spec if is_mla else _cache_spec)(self.kv_quant)
        mesh, cfg_l = self.mesh, self.cfg_local

        kinds = self.packed_kinds
        psum_dtype = jnp.dtype(self.cfg.dtype)
        lf_maker = lambda p, i: _make_tp_linear_fn(  # noqa: E731
            p, i, kinds, psum_dtype)

        # vocab-sharded packed head: gather the logit shards over tp
        combine = lambda y: jax.lax.all_gather(  # noqa: E731
            y, "tp", axis=y.ndim - 1, tiled=True)

        if is_mla:
            from .engine import _mla_decode_core, _mla_prefill_core
            pre_core, dec_core = _mla_prefill_core, _mla_decode_core
        else:
            pre_core, dec_core = _prefill_core, _decode_core

        def prefill_impl(params, packed, input_ids):
            return pre_core(
                params, packed, input_ids, cfg=cfg_l, max_seq=self.max_seq,
                kv_quant=self.kv_quant, lf_maker=lf_maker,
                kinds=kinds, final_combine=combine)

        def decode_impl(params, packed, token, cache):
            return dec_core(
                params, packed, token, cache, cfg=cfg_l,
                kv_quant=self.kv_quant, lf_maker=lf_maker,
                kinds=kinds, final_combine=combine)

        self._prefill_c = jax.jit(shard_map(
            prefill_impl, mesh=mesh,
            in_specs=(pspec, kspec, P("dp", None)),
            out_specs=(P("dp", None), cspec), check_vma=False))
        self._decode_c = jax.jit(shard_map(
            decode_impl, mesh=mesh,
            in_specs=(pspec, kspec, P("dp"), cspec),
            out_specs=(P("dp", None), cspec), check_vma=False))

        # distributed greedy/top-k head: decode WITHOUT gathering the
        # (B, V/tp) logit shards — shards exchange only winners (greedy,
        # 8 B/row) or top candidates (sampling), cutting the per-step
        # head collective from bs x V/tp floats to near-zero.  One
        # compiled executable per SamplingParams value (hashable).
        from .sampling import sample_token_sharded

        head_sharded = "lm_head" in self.packed

        def make_decode_sample(sp):
            from .sampling import sample_token

            def decode_sample_impl(params, packed, token, cache, key):
                logits_shard, cache2 = dec_core(
                    params, packed, token, cache, cfg=cfg_l,
                    kv_quant=self.kv_quant, lf_maker=lf_maker,
                    kinds=kinds, final_combine=lambda y: y)
                if head_sharded:
                    tok = sample_token_sharded(logits_shard, key, sp)
                else:
                    # dense lm_head replicates: full logits on every
                    # shard, plain sampling already agrees everywhere
                    k = None if sp is None or sp.is_greedy else key
                    tok = sample_token(logits_shard, k, sp)
                return tok, cache2
            return jax.jit(shard_map(
                decode_sample_impl, mesh=mesh,
                in_specs=(pspec, kspec, P("dp"), cspec, P()),
                out_specs=(P("dp"), cspec), check_vma=False))

        self._decode_sample_cache = {}
        self._make_decode_sample = make_decode_sample

    @classmethod
    def from_engine(cls, engine: QuantizedLlama, mesh: Mesh,
                    ) -> "TPQuantizedLlama":
        """Shard a single-chip engine's weights over ``mesh`` (axes
        ``dp``/``tp``) and return the mesh-parallel engine."""
        tp = mesh.shape["tp"]
        cfg = engine.cfg
        from ..models.llama4 import Llama4Config
        from ..models.minimax import MiniMaxConfig
        from ..models.qwen3next import Qwen3NextConfig
        if isinstance(cfg, (Llama4Config, Qwen3NextConfig, MiniMaxConfig)):
            raise NotImplementedError(
                f"TP engine covers the llama-family and MLA cache "
                f"layouts; {type(cfg).__name__} (NoPE variants / "
                "recurrent state) needs its own sharded cores")
        packed = {k: v for k, v in engine.packed.items()
                  if not k.endswith(("qkv", "gate_up"))}
        _validate_shardable(cfg, packed, engine.params, tp)
        eparams = jax.tree.map(lambda x: x, engine.params)  # container copy
        packed, eparams = _reshard_row_layers(packed, eparams, cfg, tp,
                                              engine.packed_kinds)
        # pin head_dim: cfg.hd derives from hidden/num_heads, which would
        # change when heads are divided by tp
        cfg_local = dataclasses.replace(
            cfg, num_heads=cfg.num_heads // tp,
            num_kv_heads=cfg.num_kv_heads // tp, head_dim=cfg.hd)

        pspec, kspec = _params_specs(eparams), _packed_specs(packed)
        params = jax.tree.map(
            lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
            eparams, pspec)
        packed = jax.tree.map(
            lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
            packed, kspec)
        logger.info("tp engine: %d packed layers sharded over tp=%d dp=%d",
                    len(packed), tp, mesh.shape["dp"])
        return cls(cfg=cfg, cfg_local=cfg_local, params=params,
                   packed=packed, mesh=mesh, max_seq=engine.max_seq,
                   kv_quant=engine.kv_quant,
                   packed_kinds=engine.packed_kinds)

    def prefill(self, input_ids: jax.Array) -> Tuple[jax.Array, KVCache]:
        input_ids = jnp.asarray(input_ids)
        dp = self.mesh.shape["dp"]
        assert input_ids.shape[0] % dp == 0, (
            f"batch {input_ids.shape[0]} must divide dp={dp}")
        return self._prefill_c(self.params, self.packed, input_ids)

    def decode_step(self, token: jax.Array, cache: KVCache
                    ) -> Tuple[jax.Array, KVCache]:
        out = self._decode_c(self.params, self.packed,
                             jnp.asarray(token), cache)
        if self.mesh.devices.flat[0].platform == "cpu":
            # XLA:CPU in-process collectives deadlock when several decode
            # executions are in flight (rendezvous threads from different
            # run_ids starve each other); serialize on the CPU backend.
            jax.block_until_ready(out)
        return out

    def decode_sample_step(self, token: jax.Array, cache: KVCache,
                           key: Optional[jax.Array] = None,
                           sampling=None) -> Tuple[jax.Array, KVCache]:
        """One decode step returning the NEXT TOKEN directly via the
        distributed head (no (B, V/tp) logit gather).  ``sampling`` None
        → greedy; the compiled executable is cached per SamplingParams."""
        sp_key = sampling  # hashable frozen dataclass or None
        fn = self._decode_sample_cache.get(sp_key)
        if fn is None:
            fn = self._make_decode_sample(sampling)
            self._decode_sample_cache[sp_key] = fn
        if key is None:
            key = jax.random.PRNGKey(0)
        out = fn(self.params, self.packed, jnp.asarray(token), cache, key)
        if self.mesh.devices.flat[0].platform == "cpu":
            jax.block_until_ready(out)  # same CPU-collective serialization
        return out

    def generate(self, input_ids: jax.Array, max_new_tokens: int = 32,
                 sampling=None) -> jax.Array:
        """Greedy by default; ``sampling`` (serve.SamplingParams) enables
        seeded temperature/top-k/top-p.  Decode steps run the
        DISTRIBUTED head (``decode_sample_step``): shards exchange
        winners/candidates instead of (B, V/tp) logit shards; sampling
        uses one replicated key per step so every shard agrees on the
        token by construction."""
        from .sampling import sample_token
        stochastic = sampling is not None and not sampling.is_greedy
        key = jax.random.PRNGKey(sampling.seed) if stochastic else None

        logits, cache = self.prefill(input_ids)
        k = None
        if stochastic:
            key, k = jax.random.split(key)
        tok = sample_token(logits, k, sampling)
        out = [tok]
        for _ in range(max_new_tokens - 1):
            k = None
            if stochastic:
                key, k = jax.random.split(key)
            tok, cache = self.decode_sample_step(tok, cache, k, sampling)
            out.append(tok)
        return jnp.stack(out, axis=1)
