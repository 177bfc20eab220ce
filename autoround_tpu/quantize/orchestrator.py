"""Block-chain quantization driver.

Role of the reference's ``CompressionOrchestrator``
(``auto_round/compressors/orchestrator.py:390`` ``quantize``,
``:525`` ``_quantize_data_driven``, ``:176`` ``_quantize_blocks``): cache
block-0 inputs, then walk blocks; per block compute the FP reference
outputs, tune (SignRound) or RTN the block's linears, and chain both the
FP input cache and the quantized input cache to the next block — the
dual-chain semantics of the reference composer
(``algorithms/composer.py:415-478``: target = block_fp(fp_input), tuning
input = q_input, both caches advance).

TPU-first: there are no hooks — the model zoo's blocks are pure functions
called in order, and each cache-advance forward is one jitted batched
call.  All per-sample caches are plain device arrays ``(nsamples, S, H)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms.actquant import (
    build_static_act_scales,
    collect_act_stats,
    collect_imatrix,
    collect_output_stats,
    make_act_quant_linear_fn,
)
from ..algorithms.rtn import rtn_quantize_layer
from ..algorithms.signround import TuneConfig, make_qdq_weights, tune_block
from ..dtypes.intq import QdqResult
from ..dtypes.registry import get_quant_func
from ..models import llama
from ..schemes import QuantizationScheme
from ..utils.logger import logger
from ..utils.pytree import get_by_path, set_by_path

__all__ = ["QuantizeConfig", "QuantizedLayer", "QuantizeResult", "quantize_model"]


@dataclass(frozen=True)
class QuantizeConfig:
    """Run-level knobs (reference entry kwargs, ``autoround.py:705``)."""

    iters: int = 200
    lr: Optional[float] = None
    minmax_lr: Optional[float] = None
    batch_size: int = 8
    seed: int = 42
    enable_quanted_input: bool = True
    enable_minmax_tuning: bool = True
    enable_round_tuning: bool = True
    use_best_params: bool = True
    dynamic_max_gap: int = -1
    gradient_accumulate_steps: int = 1
    cache_batch: int = 8  # batch size for cache-advance forwards
    enable_alg_ext: bool = False
    use_imatrix: bool = False  # opt-RTN: imatrix-weighted scale search
    enable_awq: bool = False   # per-block AWQ smoothing before tuning
    optimizer: str = "signsgd"  # or "adam" (AdamRound)
    # static attention quantization: collect q/k/v output amax per block
    # (reference experimental/attention.py FP8 attention scales)
    quant_attention: bool = False
    # tune norm weights + linear biases alongside rounding (reference
    # enable_norm_bias_tuning, wrapper.py:215,636-746)
    enable_norm_bias_tuning: bool = False
    # tune N consecutive blocks jointly (reference nblocks /
    # WrapperMultiblock, wrapper.py:748): larger receptive field for the
    # loss at the cost of a bigger tuning problem
    nblocks: int = 1
    # last-block LM cross-entropy loss instead of MSE (reference
    # enable_lfq, sign_round/quantizer.py:461-465)
    enable_lfq: bool = False
    # crash-resume directory (reference AR_RESUME_DIR).  Opt-in: each block
    # persists its payload + the chained caches (device→host copies — slow
    # over a TPU tunnel, cheap on a real host).
    resume_dir: Optional[str] = None
    # immediate packing (reference immediate_pack + ShardWriter,
    # compressors/utils.py:534): pack each block's int layers to the
    # autoround layout and stream them to sharded safetensors as blocks
    # finish, so peak memory never holds the packed model
    immediate_save_dir: Optional[str] = None
    shard_size_bytes: int = 4 << 30
    # free each original block's HBM as soon as its qdq replacement exists
    # (the role of the reference's offload/low_gpu_mem_usage for the
    # "both copies do not fit" regime).  MUTATES the caller's
    # params["blocks"] entries to None — opt in only when the FP params
    # are not needed afterwards.
    donate_params: bool = False
    # host-offload the params pytree: FP blocks live in host RAM, each
    # block transfers to HBM transiently for its tuning window, and the
    # qdq result returns to host immediately.  Peak HBM = one block +
    # the activation caches + compiled buffers, which is what unlocks
    # 8B-class models on a 16 GB chip (the role of the reference's
    # accelerate CPU-offload / low_gpu_mem_usage, done as explicit
    # host<->device placement instead of module hooks).  Requires fast
    # host<->device DMA — do not enable over a tunneled dev chip.
    offload_params: bool = False
    # rematerialize the tuning forward in the backward pass (the TPU
    # answer to the reference's low_gpu_mem_usage: recompute saved
    # activations instead of holding them — required to tune 8B-shape
    # blocks at seqlen 2048 inside 16 GB alongside the caches)
    use_remat: bool = False

    def tune_config(self) -> TuneConfig:
        return TuneConfig(
            iters=self.iters, lr=self.lr, minmax_lr=self.minmax_lr,
            batch_size=self.batch_size, seed=self.seed,
            enable_minmax_tuning=self.enable_minmax_tuning,
            enable_round_tuning=self.enable_round_tuning,
            use_best_params=self.use_best_params,
            dynamic_max_gap=self.dynamic_max_gap,
            gradient_accumulate_steps=self.gradient_accumulate_steps,
            enable_alg_ext=self.enable_alg_ext,
            optimizer=self.optimizer,
            enable_norm_bias_tuning=self.enable_norm_bias_tuning,
            use_remat=self.use_remat,
        )


@dataclass
class QuantizedLayer:
    """Export payload for one layer: qdq weight + scale/zp + scheme,
    plus static activation scales when the scheme quantizes activations."""

    name: str
    scheme: QuantizationScheme
    qdq: jax.Array
    scale: jax.Array
    zp: Optional[jax.Array]
    act_scale: Optional[jax.Array] = None       # static act scale (FP8/int)
    act_global_scale: Optional[jax.Array] = None  # NVFP4 global scale
    extras: Optional[Dict[str, Any]] = None      # GGUF dq export payload
    # W4-sym packed nibble planes captured at the offload pull — the
    # serving engine reuses them verbatim (host->HBM transfer of 0.5
    # byte/weight instead of re-deriving codes and shipping int32)
    packed_w4: Optional[Tuple[np.ndarray, np.ndarray]] = None


@dataclass
class QuantizeResult:
    params: Dict[str, Any]               # model params with qdq weights baked
    layers: Dict[str, QuantizedLayer]    # per-layer export payloads
    loss_traces: Dict[int, np.ndarray] = field(default_factory=dict)
    # per-block FP8 attention scales {block: {"q_proj"/"k_proj"/"v_proj": s}}
    attention_scales: Dict[int, Dict[str, Any]] = field(default_factory=dict)
    # per-layer input second moments collected under use_imatrix — the
    # GGUF export reuses them to weighted-search UNTUNED/upgraded layers
    # (reference imatrix packer args, export_to_gguf/packing.py:658,788)
    imatrices: Dict[str, np.ndarray] = field(default_factory=dict)
    # wall-clock phase breakdown (seconds) when AR_PROFILE_PHASES=1
    profile: Dict[str, float] = field(default_factory=dict)


_APPLY_CACHE: Dict[Any, Callable] = {}


def _batched_block_apply(block_weights, x, cos, sin, cfg, batch: int,
                         linear_fn=None, attn_mask=None, block_fwd=None):
    """Advance a cache through one block in jitted batches (static shapes).

    The jitted callable is cached on (family block_fwd, cfg, linear_fn) so
    every block of a model reuses one compiled executable per shape —
    fresh closures would recompile per block (minutes each on a
    remote-compile TPU).  ``attn_mask`` (additive attention bias, traced)
    carries the sliding-window mask for Gemma2-style alternating layers so
    the FP reference chain matches ``model_fwd`` at S > window."""
    from ..models.registry import get_model_fns
    if block_fwd is None:
        block_fwd = get_model_fns(cfg).block_fwd
    n = x.shape[0]
    key = (block_fwd, cfg, linear_fn, attn_mask is not None)
    fn0 = _APPLY_CACHE.get(key)
    if fn0 is None:
        if attn_mask is None:
            def apply_impl(w, xb, c, s):
                return block_fwd(w, xb, c, s, cfg, linear_fn=linear_fn)
        else:
            def apply_impl(w, xb, c, s, m):
                return block_fwd(w, xb, c, s, cfg, mask=m,
                                 linear_fn=linear_fn)
        fn0 = jax.jit(apply_impl)
        _APPLY_CACHE[key] = fn0
        if len(_APPLY_CACHE) > 64:
            _APPLY_CACHE.pop(next(iter(_APPLY_CACHE)))
    if attn_mask is None:
        fn = lambda w, xb: fn0(w, xb, cos, sin)
    else:
        fn = lambda w, xb: fn0(w, xb, cos, sin, attn_mask)
    outs = []
    for s in range(0, n, batch):
        e = min(s + batch, n)
        xb = x[s:e]
        if xb.shape[0] != batch and n > batch:
            # pad tail batch to keep one compiled shape
            padn = batch - xb.shape[0]
            xb = jnp.concatenate([xb, jnp.zeros((padn,) + xb.shape[1:], xb.dtype)])
            outs.append(fn(block_weights, xb)[: e - s])
        else:
            outs.append(fn(block_weights, xb))
    return jnp.concatenate(outs, axis=0)


def _norm_bias_leaves_for(block: Dict[str, Any]) -> Tuple[str, ...]:
    """Block-local paths of tunable norm weights and linear biases.

    Norm weights are the 1-D ``*norm*`` leaves (input/post_attention/
    pre-post_feedforward layernorms, qk_norm gammas); biases are the
    ``*_bias`` leaves attached to projections.  (Reference wraps these
    with WrapperLayerNorm/WrapperLlamaNorm and bias_v respectively.)"""
    out = []
    for k, v in block.items():
        if v is None or not hasattr(v, "ndim"):
            continue
        if ("norm" in k and v.ndim == 1) or k.endswith("_bias"):
            out.append(k)
    return tuple(sorted(out))


def _finalize_layer(name, w, scheme, tune_params, tcfg,
                    inner_name=None, extra_kw=None) -> QuantizedLayer:
    """Re-run the qdq once with the best params to harvest scale/zp.
    ``extra_kw`` carries the same per-layer statics (frozen dq grid,
    imatrix) the tuning-scan qdq saw — baking must use the exact grid
    the best-loss snapshot validated."""
    fn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym)
    key = inner_name if inner_name is not None else name.split(".")[-1]
    p = tune_params.get(key, {}) if tune_params else {}
    kw = dict(extra_kw or {})
    if scheme.super_bits is not None:
        kw.update(super_bits=scheme.super_bits,
                  super_group_size=scheme.super_group_size)
    r: QdqResult = fn(
        w, bits=scheme.bits, group_size=scheme.group_size,
        v=p.get("v"), min_scale=p.get("min_scale"), max_scale=p.get("max_scale"),
        clip_lo=tcfg.clip_lo, clip_hi=tcfg.clip_hi, **kw)
    return QuantizedLayer(name=name, scheme=scheme, qdq=r.qdq, scale=r.scale,
                          zp=r.zp, extras=getattr(r, "extras", None))


def _quantize_grouped(params, model_cfg, mfns, per_block, x_fp, x_q, cos,
                      sin, tcfg, cfg, mask, layers, traces, layer_schemes,
                      attention_scales, shard_writer=None, pack_layer=None,
                      resume=None, start_block=0) -> "QuantizeResult":
    """nblocks>1: tune N consecutive blocks jointly (reference
    WrapperMultiblock, ``wrapper.py:748``).  The tuning pytree is
    {"blocks": [block_i, ..., block_{i+N-1}]} with dotted scheme paths, and
    the forward chains the group — everything else reuses tune_block.
    Resume (group-granular) and immediate streaming pack are supported;
    AWQ preproc is rejected loudly by the caller."""
    n = len(params["blocks"])
    new_blocks: List[Dict[str, Any]] = []
    # resume restarts at a group boundary (chains are checkpointed at
    # group ends only)
    start_block = (start_block // cfg.nblocks) * cfg.nblocks

    # sliding-window mask for Gemma2-style alternating layers at S > window
    seqlen = x_fp.shape[1]
    smask = None
    if (getattr(model_cfg, "sliding_window", None) is not None
            and seqlen > model_cfg.sliding_window):
        smask = llama.sliding_mask(model_cfg, seqlen)
    if getattr(model_cfg, "rope_local_theta", 0.0):
        cosl, sinl = llama.rope_tables(model_cfg, seqlen, local=True)
    else:
        cosl, sinl = cos, sin

    def _am(bi):
        return (smask if smask is not None
                and llama.layer_is_sliding(model_cfg, bi) else None)

    def _tabs(bi):
        return ((cosl, sinl) if llama.layer_is_sliding(model_cfg, bi)
                else (cos, sin))

    _gbf_for = getattr(mfns, "block_fwd_for", None)

    def _gbf(bi):
        return _gbf_for(model_cfg, bi) if _gbf_for else mfns.block_fwd

    # group forwards cached per sliding-parity so tune_block's compiled
    # scan is shared across identically-structured groups
    _group_fwd_cache: Dict[Any, Callable] = {}

    def _group_fwd_for(gstart: int, glen: int):
        if smask is None:
            key = ("plain", glen)
        else:
            key = (gstart % 2, glen)
        fn = _group_fwd_cache.get(key)
        if fn is None:
            if smask is None and cosl is cos and _gbf_for is None:
                def fn(weights, xb):
                    for b in weights["blocks"]:
                        xb = mfns.block_fwd(b, xb, cos, sin, model_cfg)
                    return xb
            else:
                par = gstart % 2
                def fn(weights, xb, par=par, gstart=gstart):
                    for j, b in enumerate(weights["blocks"]):
                        bi = (gstart + j
                              if cosl is not cos or _gbf_for is not None
                              else par + j)
                        m = (smask if smask is not None
                             and llama.layer_is_sliding(model_cfg, bi)
                             else None)
                        cj, sj = _tabs(bi)
                        xb = _gbf(bi)(b, xb, cj, sj, model_cfg, mask=m)
                    return xb
            _group_fwd_cache[key] = fn
        return fn

    for gstart in range(0, n, cfg.nblocks):
        group = params["blocks"][gstart: gstart + cfg.nblocks]
        schemes = {}
        for j in range(len(group)):
            for lname, s in per_block.get(gstart + j, {}).items():
                schemes[f"blocks.{j}.{lname}"] = s

        if resume is not None and gstart + len(group) <= start_block:
            # group already done in a previous run: restore qdq leaves
            qdq_group = list(group)
            for j in range(len(group)):
                bi = gstart + j
                payload = resume.load_block(bi)
                for lname, scheme in per_block.get(bi, {}).items():
                    w_orig = get_by_path(group[j], lname)
                    qdq = jnp.asarray(payload[f"{lname}.qdq"])
                    qdq_group[j] = set_by_path(qdq_group[j], lname,
                                               qdq.astype(w_orig.dtype))
                    zk = f"{lname}.zp"
                    layers[f"blocks.{bi}.{lname}"] = QuantizedLayer(
                        name=f"blocks.{bi}.{lname}", scheme=scheme, qdq=qdq,
                        scale=jnp.asarray(payload[f"{lname}.scale"]),
                        zp=(jnp.asarray(payload[zk]) if zk in payload
                            else None))
            new_blocks.extend(qdq_group)
            if gstart + len(group) == start_block:
                fp_np, q_np = resume.load_chain(start_block - 1)
                x_fp = jnp.asarray(fp_np, x_fp.dtype)
                x_q = None if q_np is None else jnp.asarray(q_np, x_fp.dtype)
            continue

        ref = x_fp
        for j, b in enumerate(group):
            cj, sj = _tabs(gstart + j)
            ref = _batched_block_apply(b, ref, cj, sj, model_cfg,
                                       cfg.cache_batch,
                                       attn_mask=_am(gstart + j),
                                       block_fwd=_gbf(gstart + j))
        if not schemes:
            new_blocks.extend(group)
            if x_q is not None:
                for j, b in enumerate(group):
                    cj, sj = _tabs(gstart + j)
                    x_q = _batched_block_apply(b, x_q, cj, sj, model_cfg,
                                               cfg.cache_batch,
                                               attn_mask=_am(gstart + j),
                                               block_fwd=_gbf(gstart + j))
            x_fp = ref
            continue

        tune_in = x_q if x_q is not None else x_fp
        best, info = tune_block(_group_fwd_for(gstart, len(group)),
                                {"blocks": list(group)}, tune_in,
                                ref, schemes, tcfg, mask=mask)
        traces[gstart] = info["loss_trace"]
        logger.info("blocks %d-%d: loss iter0 %.6f -> best %.6f", gstart,
                    gstart + len(group) - 1, info["first_loss"],
                    info["best_loss"])

        qdq_group = list(group)
        for path, scheme in schemes.items():
            j = int(path.split(".")[1])
            lname = path.split(".", 2)[2]
            w_orig = get_by_path(group[j], lname)
            ql = _finalize_layer(f"blocks.{gstart + j}.{lname}", w_orig,
                                 scheme, best, tcfg, inner_name=path)
            qdq_group[j] = set_by_path(qdq_group[j], lname,
                                       ql.qdq.astype(w_orig.dtype))
            layers[ql.name] = ql
        new_blocks.extend(qdq_group)
        x_fp = ref
        if x_q is not None:
            for j, b in enumerate(qdq_group):
                cj, sj = _tabs(gstart + j)
                x_q = _batched_block_apply(b, x_q, cj, sj, model_cfg,
                                           cfg.cache_batch,
                                           attn_mask=_am(gstart + j),
                                           block_fwd=_gbf(gstart + j))
        if shard_writer is not None:
            for path in schemes:
                j = int(path.split(".")[1])
                lname = path.split(".", 2)[2]
                shard_writer.add_many(pack_layer(
                    layers[f"blocks.{gstart + j}.{lname}"]))
        if resume is not None:
            fp_np = np.asarray(x_fp)
            q_np = None if x_q is None else np.asarray(x_q)
            for j in range(len(group)):
                bi = gstart + j
                payload = {}
                for lname in per_block.get(bi, {}):
                    ql = layers[f"blocks.{bi}.{lname}"]
                    payload[f"{lname}.qdq"] = np.asarray(ql.qdq, np.float32)
                    payload[f"{lname}.scale"] = np.asarray(ql.scale,
                                                           np.float32)
                    if ql.zp is not None:
                        payload[f"{lname}.zp"] = np.asarray(ql.zp,
                                                            np.float32)
                # the group-end chain is stored on every member so
                # next_block() stays contiguous; restart rounds down to
                # the group boundary anyway
                resume.mark_block_done(bi, payload, fp_np, q_np)

    new_params = dict(params)
    new_params["blocks"] = new_blocks
    if "lm_head" in layer_schemes and not (
            "lm_head" not in params and "embed_tokens" in layers):
        head_name = "lm_head" if "lm_head" in params else "embed_tokens"
        w = params.get("lm_head", params["embed_tokens"])
        r = rtn_quantize_layer(w, layer_schemes["lm_head"])
        new_params[head_name] = r.qdq.astype(w.dtype)
        layers["lm_head"] = QuantizedLayer(
            name="lm_head", scheme=layer_schemes["lm_head"], qdq=r.qdq,
            scale=r.scale, zp=r.zp, extras=getattr(r, "extras", None))
    if shard_writer is not None:
        from ..export import _flatten_params
        flat = _flatten_params(new_params)
        quant_names = set(layers)
        for k, v in flat.items():
            if k not in quant_names:
                shard_writer.add(k, np.asarray(v))
        if "lm_head" in layers:
            shard_writer.add_many(pack_layer(layers["lm_head"]))
        shard_writer.finalize()
    return QuantizeResult(params=new_params, layers=layers,
                          loss_traces=traces,
                          attention_scales=attention_scales)


def quantize_model(
    params: Dict[str, Any],
    model_cfg: llama.LlamaConfig,
    layer_schemes: Dict[str, QuantizationScheme],
    input_ids: jax.Array,
    cfg: QuantizeConfig = QuantizeConfig(),
    mask: Optional[jax.Array] = None,
) -> QuantizeResult:
    """Quantize a llama-family model block-by-block.

    input_ids: (nsamples, seqlen) calibration token batch.
    mask: optional (nsamples, seqlen) valid-token mask (pad → 0).
    iters == 0 → pure RTN zero-shot path (reference ``iters=0`` →
    RTNQuantizer swap, ``autoround.py:487-495``).
    """
    from ..models.registry import get_model_fns
    mfns = get_model_fns(model_cfg)
    # multimodal / diffusion batches arrive as dicts ({"input_ids", ...}
    # or {"pixel_values", "timesteps", ...})
    if isinstance(input_ids, dict):
        ids = input_ids.get("input_ids")
        if ids is not None:
            nsamples, seqlen = ids.shape
        else:
            nsamples = next(iter(input_ids.values())).shape[0]
            seqlen = 1  # rope unused by non-LM families
    else:
        ids = input_ids
        nsamples, seqlen = ids.shape
    if hasattr(mfns, "rope_tables_for_inputs"):
        # batch-dependent rope (Qwen2-VL m-rope: vision-token positions
        # carry t/h/w components); shared=True because the tuning loop
        # closure-captures ONE (S, hd) table for all sample slices
        cos, sin = mfns.rope_tables_for_inputs(model_cfg, input_ids,
                                               shared=True)
    else:
        cos, sin = mfns.rope_tables(model_cfg, seqlen)
    # Gemma3 dual rope: sliding layers use local-base-frequency tables
    if getattr(model_cfg, "rope_local_theta", 0.0):
        cosl, sinl = llama.rope_tables(model_cfg, seqlen, local=True)
    else:
        cosl, sinl = cos, sin
    tcfg = cfg.tune_config()
    from .. import envs as _envs
    if _envs.AR_ENABLE_ACT_MINMAX_TUNING:
        # honor the act min/max tuning flag (reference
        # AR_ENABLE_ACT_MINMAX_TUNING -> wrapper.py:209-211 act_max_scale)
        import dataclasses as _dc
        tcfg = _dc.replace(tcfg, tune_act_scales=True)
    if tcfg.enable_alg_ext and tcfg.clip_hi <= 1.0:
        # tune_block widens the min/max clamp to (0, 2) under alg_ext
        # (reference sign_roundv2/quantizer.py:128-155); apply the SAME
        # widening here so _finalize_layer bakes weights with the exact
        # TuneConfig the best-loss snapshot was validated under —
        # otherwise tuned max_scale values above 1 get clamped at bake.
        import dataclasses as _dc
        tcfg = _dc.replace(tcfg, clip_lo=0.0, clip_hi=2.0)

    # group flat layer plan by block index; inner key is the (possibly
    # dotted) path within the block, e.g. "q_proj" or "experts.3.w1"
    per_block: Dict[int, Dict[str, QuantizationScheme]] = {}
    for flat, scheme in layer_schemes.items():
        parts = flat.split(".", 2)
        if parts[0] == "blocks":
            per_block.setdefault(int(parts[1]), {})[parts[2]] = scheme

    x_fp = mfns.embed_fwd(params, input_ids, model_cfg)
    x_q = x_fp if (cfg.enable_quanted_input and cfg.iters > 0) else None

    # inter-block residual injections (Qwen3-VL deepstack: visual
    # features add to the hidden states after the first few decoder
    # layers).  Applied to BOTH chains after each block advance — the
    # identical additive constant cancels in every block's tuning loss,
    # so calibration stays exact (models/qwen3vlmoe.chain_extras).
    _extras_map: Dict[int, jax.Array] = {}
    if hasattr(mfns, "chain_extras"):
        _extras_map = mfns.chain_extras(params, input_ids, model_cfg)
        if _extras_map and cfg.nblocks > 1:
            raise NotImplementedError(
                "deepstack chain extras (inter-block injections) require "
                "nblocks=1 — the grouped tuner chains blocks internally")

    def _apply_extras(bi: int, xf, xq):
        ex = _extras_map.get(bi)
        if ex is None:
            return xf, xq
        return xf + ex, (None if xq is None else xq + ex)

    if cfg.offload_params:
        # FP blocks live on host; the loop below transfers one block to
        # HBM per tuning window and sends its qdq replacement back
        params = dict(params)
        params["blocks"] = [
            jax.tree.map(lambda t: np.asarray(t), b)
            for b in params["blocks"]]

    # Gemma2-style alternating sliding-window layers: at S > window the
    # sliding layers' FP reference AND tuning forward must apply the
    # window mask (round-1 regression: tuning matched a full-causal
    # reference that diverges from model_fwd on every sliding layer)
    smask = None
    if (getattr(model_cfg, "sliding_window", None) is not None
            and seqlen > model_cfg.sliding_window):
        smask = llama.sliding_mask(model_cfg, seqlen)

    def _attn_mask_for(bi: int):
        return (smask if smask is not None
                and llama.layer_is_sliding(model_cfg, bi) else None)

    def _use_sliding_fn(bi: int) -> bool:
        """Sliding-layer callables apply the window mask AND the local
        rope tables; a Gemma3 sliding layer needs the latter even when
        S <= window (no mask)."""
        if _attn_mask_for(bi) is not None:
            return True
        return bool(getattr(model_cfg, "rope_local_theta", 0.0)
                    ) and llama.layer_is_sliding(model_cfg, bi)

    # families with per-layer forward VARIANTS (Llama4 rope vs NoPE
    # layers) expose block_fwd_for(cfg, bi) -> stable per-kind callable;
    # everything below keys its compile caches on that callable identity
    _bf_for = getattr(mfns, "block_fwd_for", None)

    def _block_fwd_for(bi: int):
        return _bf_for(model_cfg, bi) if _bf_for else mfns.block_fwd

    # ONE stable tuning forward per (variant, sliding) pair (tune_block
    # caches its compiled scan on the callable's identity)
    _base_fn_cache: Dict[Any, Callable] = {}

    def _base_fn_for(bi: int):
        bf = _block_fwd_for(bi)
        sliding = _use_sliding_fn(bi)
        key = (bf, sliding)
        fn = _base_fn_cache.get(key)
        if fn is None:
            if sliding:
                def fn(w, xb, _bf=bf):
                    return _bf(w, xb, cosl, sinl, model_cfg, mask=smask)
            else:
                def fn(w, xb, _bf=bf):
                    return _bf(w, xb, cos, sin, model_cfg)
            _base_fn_cache[key] = fn
        return fn

    # ONE stable interceptor forward per (variant, sliding) pair for all
    # stats passes (the collectors cache their compiled pass on the
    # callable's identity)
    _stats_fn_cache: Dict[Any, Callable] = {}

    def _stats_fn_for(bi: int):
        bf = _block_fwd_for(bi)
        sliding = _use_sliding_fn(bi)
        key = (bf, sliding)
        fn = _stats_fn_cache.get(key)
        if fn is None:
            if sliding:
                def fn(w, xb, lf, _bf=bf):
                    return _bf(w, xb, cosl, sinl, model_cfg, mask=smask,
                               linear_fn=lf)
            else:
                def fn(w, xb, lf, _bf=bf):
                    return _bf(w, xb, cos, sin, model_cfg, linear_fn=lf)
            _stats_fn_cache[key] = fn
        return fn

    _act_schemes_cache = {}
    # act-quant variant: per-block static/global act scales ride INSIDE
    # the weights pytree under a reserved key, so they are traced
    # arguments and each callable stays block-invariant per variant
    _act_fn_cache: Dict[Any, Callable] = {}

    def _act_fn_for(bi: int):
        bf = _block_fwd_for(bi)
        sliding = _use_sliding_fn(bi)
        key = (bf, sliding)
        fn = _act_fn_cache.get(key)
        if fn is None:
            def fn(w, xb, _bf=bf, _sl=sliding):
                scales = w["_act_scales"]
                lf = make_act_quant_linear_fn(
                    _act_schemes_cache["schemes"],
                    scales.get("static") or None,
                    scales.get("global") or None)
                inner = {k: v for k, v in w.items() if k != "_act_scales"}
                if _sl:
                    return _bf(inner, xb, cosl, sinl, model_cfg,
                               mask=smask, linear_fn=lf)
                return _bf(inner, xb, cos, sin, model_cfg, linear_fn=lf)
            _act_fn_cache[key] = fn
        return fn

    new_blocks: List[Dict[str, jax.Array]] = []
    layers: Dict[str, QuantizedLayer] = {}
    traces: Dict[int, np.ndarray] = {}
    attention_scales: Dict[int, Dict[str, Any]] = {}
    imatrices: Dict[str, np.ndarray] = {}

    # GGUF-path embedding quantization + q-chain re-cache (reference
    # compress_embedding_layer, compressors/orchestrator.py:583-594 →
    # quantization/base.py:79-145): embed_tokens is RTN-quantized up
    # front and the quantized-input chain restarts from the QDQ embedding
    # so block tuning compensates embedding damage; the FP reference
    # chain keeps the FP embedding.
    if "embed_tokens" in layer_schemes:
        w_emb = params["embed_tokens"]
        emb_scheme = layer_schemes["embed_tokens"]
        r = rtn_quantize_layer(w_emb, emb_scheme)
        layers["embed_tokens"] = QuantizedLayer(
            name="embed_tokens", scheme=emb_scheme, qdq=r.qdq,
            scale=r.scale, zp=r.zp, extras=getattr(r, "extras", None))
        params = dict(params)
        params["embed_tokens"] = r.qdq.astype(w_emb.dtype)
        if x_q is not None:
            x_q = mfns.embed_fwd(params, input_ids, model_cfg)
        logger.info("embed_tokens quantized (%s); q-chain re-cached",
                    emb_scheme.key())

    from .. import envs
    from ..utils.memory import MemoryMonitor
    monitor = MemoryMonitor() if envs.AR_LOG_MEMORY else None

    # immediate streaming pack (reference ShardWriter integration)
    shard_writer = None
    if cfg.immediate_save_dir:
        from ..export import codes_from_qdq
        from ..export.packing import pack_quantized
        from ..export.shard_writer import ShardWriter
        shard_writer = ShardWriter(cfg.immediate_save_dir,
                                   shard_size_bytes=cfg.shard_size_bytes)

        def _pack_layer(ql: QuantizedLayer):
            s = ql.scheme
            if s.data_type != "int" or isinstance(s.group_size, tuple):
                return {ql.name: np.asarray(ql.qdq, np.float32)}
            qdq = np.asarray(ql.qdq, np.float32)
            scale = np.asarray(ql.scale, np.float32)
            zp = None if ql.zp is None else np.asarray(ql.zp)
            g = s.group_size if s.group_size > 0 else qdq.shape[1]
            codes = codes_from_qdq(qdq, scale, zp, s.bits, g)
            payload = pack_quantized(codes, scale, zp, s.bits)
            return {f"{ql.name}.{k}": v for k, v in payload.items()}

    # crash-resume (reference AR_RESUME_DIR, utils/resume.py)
    import os as _os
    resume = None
    start_block = 0
    resume_dir = cfg.resume_dir or _os.environ.get("AR_RESUME_DIR")
    if resume_dir:
        from ..utils.resume import ResumeState, run_signature
        sig = run_signature(model_cfg, layer_schemes,
                            ids if ids is not None
                            else next(iter(input_ids.values())), cfg)
        resume = ResumeState(resume_dir, sig)
        start_block = resume.next_block()

    if cfg.nblocks > 1 and cfg.iters > 0:
        if cfg.enable_awq:
            # AWQ smoothing is a per-block preproc; inside a jointly-tuned
            # group the later blocks' inputs shift as earlier ones tune,
            # invalidating the smoothing stats — reject loudly rather
            # than silently dropping the feature
            raise ValueError("enable_awq is not supported with nblocks>1; "
                             "use nblocks=1 (reference tunes AWQ per "
                             "block too)")
        return _quantize_grouped(params, model_cfg, mfns, per_block, x_fp,
                                 x_q, cos, sin, tcfg, cfg, mask, layers,
                                 traces, layer_schemes, attention_scales,
                                 shard_writer=shard_writer,
                                 pack_layer=(_pack_layer if shard_writer
                                             is not None else None),
                                 resume=resume, start_block=start_block)

    import contextlib as _contextlib
    import time as _time
    from ..utils.profiling import block_step, maybe_trace
    _trace = _contextlib.ExitStack()
    _trace.enter_context(maybe_trace())
    _ann = None                    # current per-block StepTraceAnnotation

    # offload double-buffering: device_put is async, so issuing the NEXT
    # block's host->HBM upload right after this block's tuning scan is
    # dispatched hides the transfer entirely under the compute
    _prefetched: Dict[int, Any] = {}

    # per-phase wall-clock attribution (AR_PROFILE_PHASES=1): syncs at
    # phase boundaries so each bucket is true device+host time
    _prof: Optional[Dict[str, float]] = (
        {} if envs.AR_PROFILE_PHASES else None)

    # ---- async offload pull (round-5 flagship profile: the pull was
    # 935 s of 2839 s — a THIRD of the quant wall-clock spent in
    # device->host transfer + host nibble unpack while the chip idled).
    # One worker thread overlaps that host work with the NEXT block's
    # tuning scan; depth 1 bounds device residency to one extra qdq
    # tree.  shard_writer/resume consume ql.qdq right after the pull, so
    # those modes join immediately (same wall as before, no behavior
    # change).
    _pull_exec = None
    _pull_prev = None
    if cfg.offload_params:
        import concurrent.futures as _cf
        _pull_exec = _cf.ThreadPoolExecutor(max_workers=1)

    def _pull_join():
        nonlocal _pull_prev
        if _pull_prev is not None:
            _t0 = _time.time()
            _pull_prev.result()
            _pull_prev = None
            _phase("pull_wait", _t0)

    def _phase(key: str, t0: float, sync=None):
        if _prof is None:
            return
        if sync is not None:
            jax.block_until_ready(sync)
        _prof[key] = _prof.get(key, 0.0) + (_time.time() - t0)

    def _block_on_device(bi: int, raw):
        if not cfg.offload_params:
            return raw
        dev = _prefetched.pop(bi, None)
        return dev if dev is not None else jax.device_put(raw)

    def _prefetch_next(bi: int):
        nb = bi + 1
        if (cfg.offload_params and nb < len(params["blocks"])
                and nb >= start_block and nb not in _prefetched):
            _prefetched[nb] = jax.device_put(params["blocks"][nb])

    def _pull_unpack_job(bi, schemes, packed_pull, qdq_block,
                         leaf_dtypes):
        """Worker: pure-numpy nibble unpack + layer payload rebuild
        (NO jax calls — a transfer from a second thread races the
        tunnel stream)."""
        for lname, (words_np, scale_np) in packed_pull.items():
            O, Kw = words_np.shape
            g = schemes[lname].group_size
            w = words_np.astype(np.uint32).reshape(O, Kw // g, 1, g)
            shifts = (np.arange(8, dtype=np.uint32) * 4
                      )[None, None, :, None]
            codes_np = ((w >> shifts) & 0xF).reshape(O, Kw * 8)
            srep = np.repeat(scale_np, g, axis=1)
            qdq_np = ((codes_np.astype(np.float32) - 8.0) * srep
                      ).astype(leaf_dtypes[lname])
            ql = layers[f"blocks.{bi}.{lname}"]
            ql.qdq = qdq_np
            ql.scale = scale_np
            ql.packed_w4 = (words_np, scale_np)
            qdq_block = set_by_path(qdq_block, lname, qdq_np)
        new_blocks[bi] = qdq_block
        for lname in schemes:
            if lname in packed_pull:
                continue
            ql = layers[f"blocks.{bi}.{lname}"]
            shared = (ql.scheme.data_type == "int"
                      and ql.scheme.bits <= 4 and ql.extras is None)
            if shared:
                leaf = get_by_path(qdq_block, lname)
                if getattr(leaf, "shape", None) == ql.qdq.shape:
                    ql.qdq = leaf

    for bi, block in enumerate(params["blocks"]):
        if envs.AR_TRACE_DIR:
            if _ann is not None:
                _ann.__exit__(None, None, None)
            _ann = block_step(bi)
            _ann.__enter__()
        _t_block = _time.time()
        schemes = per_block.get(bi, {})
        if resume is not None and bi < start_block:
            payload = resume.load_block(bi)
            qdq_block = block
            for lname, scheme in schemes.items():
                w_orig = get_by_path(block, lname)
                qdq = jnp.asarray(payload[f"{lname}.qdq"])
                qdq_block = set_by_path(qdq_block, lname,
                                        qdq.astype(w_orig.dtype))
                zp_key = f"{lname}.zp"
                layers[f"blocks.{bi}.{lname}"] = QuantizedLayer(
                    name=f"blocks.{bi}.{lname}", scheme=scheme, qdq=qdq,
                    scale=jnp.asarray(payload[f"{lname}.scale"]),
                    zp=(jnp.asarray(payload[zp_key])
                        if zp_key in payload else None))
            new_blocks.append(qdq_block)
            if bi == start_block - 1:
                fp_np, q_np = resume.load_chain(bi)
                x_fp = jnp.asarray(fp_np, x_fp.dtype)
                x_q = None if q_np is None else jnp.asarray(q_np, x_fp.dtype)
            continue
        am = _attn_mask_for(bi)
        cb, sb = (cosl, sinl) if _use_sliding_fn(bi) else (cos, sin)
        bf_i = _block_fwd_for(bi)
        _t0 = _time.time()
        block = _block_on_device(bi, block)
        _phase("upload", _t0, block)
        _t0 = _time.time()
        ref_out = _batched_block_apply(block, x_fp, cb, sb, model_cfg,
                                       cfg.cache_batch, attn_mask=am,
                                       block_fwd=bf_i)
        _phase("fp_ref", _t0, ref_out)
        _prefetch_next(bi)
        if not schemes:
            new_blocks.append(block)
            x_fp = ref_out
            if x_q is not None:
                x_q = _batched_block_apply(block, x_q, cb, sb, model_cfg,
                                           cfg.cache_batch, attn_mask=am,
                                           block_fwd=bf_i)
            x_fp, x_q = _apply_extras(bi, x_fp, x_q)
            if resume is not None:
                resume.mark_block_done(
                    bi, {"_empty": np.zeros((1,), np.int8)},
                    np.asarray(x_fp), None if x_q is None else np.asarray(x_q))
            continue

        if cfg.quant_attention:
            qkv_amax = collect_output_stats(
                _stats_fn_for(bi), block, x_fp[: cfg.cache_batch],
                ("q_proj", "k_proj", "v_proj"))
            attention_scales[bi] = {
                k: v / 448.0 for k, v in qkv_amax.items()}

        # AWQ smoothing (composer preprocessor step, reference
        # composer.py:393-413): exact reparameterization before tuning
        init_scales = None
        if cfg.enable_awq:
            from ..transforms.awq import awq_clip_search, awq_smooth_block
            block, _ = awq_smooth_block(
                block,
                lambda w, xx, linear_fn=None, _bf=bf_i: _bf(
                    w, xx, cb, sb, model_cfg, linear_fn=linear_fn),
                x_fp[: cfg.cache_batch], schemes)
            # clip search seeds the min/max clip init (reference
            # awq/base.py:120-125 -> wrapper.py:173-175)
            im_clip = collect_imatrix(
                _stats_fn_for(bi), block, x_fp[: cfg.cache_batch],
                set(schemes))
            init_scales = awq_clip_search(block, schemes, im_clip)

        # activation quantization: collect per-layer amax on the FP pass
        # (reference act_max hooks fire during the FP reference forward),
        # derive static/global scales, and build the interceptor.
        act_lf = None
        static_scales: Dict[str, jax.Array] = {}
        global_scales: Dict[str, jax.Array] = {}
        if any(s.effective_act().is_act_quantized for s in schemes.values()):
            amax = collect_act_stats(
                _stats_fn_for(bi), block, x_fp[: cfg.cache_batch],
                set(schemes))
            static_scales, global_scales = build_static_act_scales(
                schemes, amax)
            act_lf = make_act_quant_linear_fn(schemes, static_scales,
                                              global_scales)

        if cfg.iters > 0:
            tune_in = x_q if x_q is not None else x_fp
            tune_weights = block
            if act_lf is None:
                # stable per (sliding?) parity → at most two tuning compiles
                block_fn = _base_fn_for(bi)
            else:
                _act_schemes_cache["schemes"] = schemes
                tune_weights = dict(block)
                tune_weights["_act_scales"] = {"static": static_scales,
                                               "global": global_scales}
                block_fn = _act_fn_for(bi)
            lfq_fn = None
            if (cfg.enable_lfq and ids is not None
                    and bi == len(params["blocks"]) - 1):
                head_w = params.get("lm_head", params["embed_tokens"])
                norm_g = params["norm"]

                def lfq_fn(pred, idx):
                    h = llama.rms_norm(pred, norm_g, model_cfg.rms_eps)
                    logits = jnp.einsum(
                        "bsi,oi->bso", h.astype(jnp.float32),
                        head_w.astype(jnp.float32))
                    labels = jnp.take(ids, idx, axis=0)
                    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
                    nll = -jnp.take_along_axis(
                        logp, labels[:, 1:, None], axis=-1)[..., 0]
                    m = (jnp.take(mask, idx, axis=0)[:, 1:]
                         if mask is not None else jnp.ones_like(nll))
                    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

            nb_leaves = (_norm_bias_leaves_for(block)
                         if tcfg.enable_norm_bias_tuning else None)
            tune_extras = None
            if tcfg.enable_alg_ext:
                # alg_ext: GGUF-dq layers tune against a frozen searched
                # grid (iter-0 search re-run, reference
                # sign_roundv2/quantizer.py:268-281); with use_imatrix the
                # search weights by FP-input second moments (reference
                # _register_imatrix_hooks during tuning, :396-400)
                from ..dtypes.gguf import search_dq_grid
                dq_names = {ln for ln, s in schemes.items()
                            if s.super_bits is not None
                            and s.data_type == "int_dq"}
                im_tune: Dict[str, jax.Array] = {}
                if dq_names and cfg.use_imatrix:
                    im_tune = collect_imatrix(
                        _stats_fn_for(bi), block, x_fp[: cfg.cache_batch],
                        dq_names)
                    for ln, v in im_tune.items():
                        imatrices[f"blocks.{bi}.{ln}"] = np.asarray(v)
                ex = {}
                for lname in dq_names:
                    s = schemes[lname]
                    ex[lname] = search_dq_grid(
                        get_by_path(block, lname), s.bits, s.group_size,
                        s.super_bits, s.super_group_size, s.sym,
                        imatrix=im_tune.get(lname))
                tune_extras = ex or None
            _t0 = _time.time()
            best, info = tune_block(
                block_fn, tune_weights, tune_in, ref_out, schemes, tcfg,
                mask=mask, lfq_fn=lfq_fn, init_scales=init_scales,
                norm_bias_leaves=nb_leaves, extras=tune_extras)
            _phase("tune", _t0, best)
            traces[bi] = info["loss_trace"]
            logger.info(
                "block %d: loss iter0 %.6f -> best %.6f (%.1fs)",
                bi, info["first_loss"], info["best_loss"],
                _time.time() - _t_block)
            if "_act" in best:
                # bake the tuned act-scale shrink into the static scales
                # (reference unwrapper applies best act_max_scale,
                # wrapper.py:429-439)
                for lname, p in best["_act"].items():
                    if lname in static_scales:
                        static_scales[lname] = static_scales[lname] \
                            * jnp.clip(p["scale"], tcfg.clip_lo,
                                       tcfg.clip_hi)
                act_lf = make_act_quant_linear_fn(schemes, static_scales,
                                                  global_scales)
            qdq_block = block
            if "_nb" in best:
                # bake tuned norm/bias perturbations (reference unwrapper
                # applies best v through the same wo_round qdq,
                # wrapper.py:664-672)
                from ..dtypes.intq import qdq_asym_wo_round
                for nname, p in best["_nb"].items():
                    leaf = get_by_path(block, nname)
                    qdq_block = set_by_path(
                        qdq_block, nname,
                        qdq_asym_wo_round(leaf, p["v"]).astype(leaf.dtype))
            _t0 = _time.time()
            for lname, scheme in schemes.items():
                w_orig = get_by_path(block, lname)
                ql = _finalize_layer(f"blocks.{bi}.{lname}", w_orig,
                                     scheme, best, tcfg, inner_name=lname,
                                     extra_kw=(tune_extras or {}).get(lname))
                qdq_block = set_by_path(qdq_block, lname,
                                        ql.qdq.astype(w_orig.dtype))
                layers[ql.name] = ql
            _phase("finalize", _t0, qdq_block)
        else:
            im: Dict[str, jax.Array] = {}
            if cfg.use_imatrix:
                im = collect_imatrix(
                    _stats_fn_for(bi), block, x_fp[: cfg.cache_batch],
                    set(schemes))
                for ln, v in im.items():
                    imatrices[f"blocks.{bi}.{ln}"] = np.asarray(v)
            qdq_block = block
            for lname, scheme in schemes.items():
                w_orig = get_by_path(block, lname)
                r = rtn_quantize_layer(w_orig, scheme,
                                       imatrix=im.get(lname))
                qdq_block = set_by_path(qdq_block, lname,
                                        r.qdq.astype(w_orig.dtype))
                layers[f"blocks.{bi}.{lname}"] = QuantizedLayer(
                    name=f"blocks.{bi}.{lname}", scheme=scheme, qdq=r.qdq,
                    scale=r.scale, zp=r.zp, extras=getattr(r, "extras", None))
        for lname in schemes:
            ql = layers[f"blocks.{bi}.{lname}"]
            ql.act_scale = static_scales.get(lname)
            ql.act_global_scale = global_scales.get(lname)

        new_blocks.append(qdq_block)
        if cfg.donate_params:
            params["blocks"][bi] = None  # free original block HBM
            block = None
        # advance chains (q-chain keeps act quant active, like the
        # reference's persistent WrapperWALayer)
        x_fp = ref_out
        if x_q is not None:
            _t0 = _time.time()
            x_q = _batched_block_apply(qdq_block, x_q, cb, sb, model_cfg,
                                       cfg.cache_batch, linear_fn=act_lf,
                                       attn_mask=am, block_fwd=bf_i)
            _phase("qchain", _t0, x_q)
        x_fp, x_q = _apply_extras(bi, x_fp, x_q)
        if cfg.offload_params:
            _t0 = _time.time()
            # qdq result returns to host; only the caches stay in HBM.
            # Host-link bytes are the offload regime's bottleneck, so:
            #   * W4-sym-g layers transfer PACKED int4 codes + scales
            #     (devicewards pack_w4_planes, 4.5x fewer bytes than the
            #     bf16 qdq) and the host reconstructs the identical qdq
            #     as scale*(code-8) — exact, both sides compute the same
            #     fp32 product before the bf16 cast
            #   * everything else transfers the model-dtype qdq ONCE and
            #     the export payload SHARES the buffer for int bits<=4
            #     (code recovery rint(qdq/scale) is exact under bf16
            #     rounding there: |code| <= 15, rel err 2^-9)
            from ..ops.qmatmul import pack_w4_planes
            packed_pull = {}
            for lname in schemes:
                s = schemes[lname]
                ql = layers[f"blocks.{bi}.{lname}"]
                leaf = get_by_path(qdq_block, lname)
                g = s.group_size if isinstance(s.group_size, int) else 0
                if (s.data_type == "int" and s.bits == 4 and s.sym
                        and ql.extras is None and g > 0
                        and getattr(leaf, "ndim", 0) == 2
                        and leaf.shape == ql.qdq.shape
                        and leaf.shape[1] % (8 * g) == 0):
                    scale = ql.scale.astype(jnp.float32)
                    srep = jnp.repeat(scale, g, axis=1)
                    safe = jnp.where(srep == 0.0, 1.0, srep)
                    codes = jnp.clip(
                        jnp.round(ql.qdq.astype(jnp.float32) / safe) + 8,
                        0, 15).astype(jnp.int32)
                    packed_pull[lname] = (pack_w4_planes(codes, g), scale)
                    # drop the (O, K) int32/f32 pack transients NOW —
                    # as function locals they would pin ~700 MB of HBM
                    # through the next block's tuning
                    codes = srep = safe = scale = None
            # words transfer synchronously on the MAIN thread:
            # copy_to_host_async on this experimental tunnel backend
            # stalls the device stream permanently (observed twice,
            # blocks 15-16), and a transfer from a second thread races
            # it too — ~7 s/block for the 0.5 byte/weight words is the
            # robust price; the host unpack still overlaps on the worker
            packed_pull = {
                ln: (np.asarray(w), np.asarray(sc))
                for ln, (w, sc) in packed_pull.items()}
            # drop the packed layers' DEVICE qdq leaves FIRST — the
            # q-chain has already advanced, so they are dead; leaving
            # them in the tree would make the conversion below stream
            # the full 0.44 GB bf16 qdq over the ~17 MB/s tunnel D2H
            # (the round-5 v6 run measured exactly that: 26 s/block)
            leaf_dtypes = {}
            for lname in packed_pull:
                leaf_dtypes[lname] = get_by_path(qdq_block, lname).dtype
                qdq_block = set_by_path(qdq_block, lname, None)
                # the QuantizedLayer ALSO references the device qdq
                # (finalize output) — the worker rebuilds both from the
                # packed words, so drop the refs now or the tree
                # survives into the next block's tuning (OOM)
                ql = layers[f"blocks.{bi}.{lname}"]
                ql.qdq = None
                ql.scale = None
            # remaining device leaves (norms + non-packed scales/zp —
            # tiny) convert synchronously; the worker stays jax-free
            qdq_block = jax.tree.map(
                lambda t: t if isinstance(t, np.ndarray)
                else np.asarray(t), qdq_block)
            for lname in schemes:
                if lname in packed_pull:
                    continue
                ql = layers[f"blocks.{bi}.{lname}"]
                if not isinstance(ql.qdq, np.ndarray):
                    ql.qdq = np.asarray(ql.qdq)
                if ql.scale is not None and not isinstance(
                        ql.scale, np.ndarray):
                    ql.scale = np.asarray(ql.scale)
                if ql.zp is not None and not isinstance(
                        ql.zp, np.ndarray):
                    ql.zp = np.asarray(ql.zp)
            _pull_join()             # depth 1: previous unpack done
            _pull_prev = _pull_exec.submit(
                _pull_unpack_job, bi, dict(schemes), packed_pull,
                qdq_block, leaf_dtypes)
            if shard_writer is not None or resume is not None:
                # those paths consume ql.qdq below — stay synchronous
                _pull_join()
            _phase("pull", _t0)
        if cfg.offload_params:
            # each iteration leaves ~one bf16 block copy (device upload /
            # pre-pull qdq tree) in REFERENCE CYCLES that only gen-2 gc
            # reclaims; at 8B that lag OOMed the 16 GB chip at block 15
            # (measured: live device bytes sawtoothed 2.5->3.6 GB with
            # occasional gc dips).  Collect deterministically per block —
            # microseconds against a ~50 s tuning window.
            block = None       # release this block's device upload now
            _t0 = _time.time()
            import gc as _gc
            _gc.collect()
            _phase("gc", _t0)
        if monitor is not None:
            monitor.log_summary(f"block {bi}")
            from ..utils.memory import log_live_arrays
            log_live_arrays(f"block {bi}")
        if shard_writer is not None:
            for lname in schemes:
                shard_writer.add_many(
                    _pack_layer(layers[f"blocks.{bi}.{lname}"]))
        if resume is not None:
            payload = {}
            for lname in schemes:
                ql = layers[f"blocks.{bi}.{lname}"]
                payload[f"{lname}.qdq"] = np.asarray(ql.qdq, np.float32)
                payload[f"{lname}.scale"] = np.asarray(ql.scale, np.float32)
                if ql.zp is not None:
                    payload[f"{lname}.zp"] = np.asarray(ql.zp, np.float32)
            # durable write before the manifest marks the block done
            resume.mark_block_done(
                bi, payload, np.asarray(x_fp),
                None if x_q is None else np.asarray(x_q))

    _pull_join()
    if _pull_exec is not None:
        _pull_exec.shutdown(wait=True)
    if _ann is not None:
        _ann.__exit__(None, None, None)
    _trace.close()

    new_params = dict(params)
    new_params["blocks"] = new_blocks

    # outside-block layers (lm_head): tuned against the final hidden
    # states when iters > 0 (reference quantize_layer_outside_block,
    # sign_round/quantizer.py:527-722), else RTN
    if "lm_head" in layer_schemes and not (
            "lm_head" not in params and "embed_tokens" in layers):
        # (tied embeddings already quantized above → the output head
        # reuses the quantized embedding, as llama.cpp does)
        head_name = "lm_head" if "lm_head" in params else "embed_tokens"
        w = params.get("lm_head", params["embed_tokens"])
        scheme = layer_schemes["lm_head"]
        if cfg.iters > 0:
            h_src = x_q if x_q is not None else x_fp
            normed = llama.rms_norm(h_src, params["norm"], model_cfg.rms_eps)
            ref = jnp.einsum("bsi,oi->bso", normed.astype(jnp.float32),
                             w.astype(jnp.float32)).astype(normed.dtype)
            head_fwd = lambda ws, xb: jnp.einsum("bsi,oi->bso", xb, ws["head"])
            best, info = tune_block(head_fwd, {"head": w}, normed, ref,
                                    {"head": scheme}, tcfg, mask=mask)
            logger.info("lm_head: loss iter0 %.6f -> best %.6f",
                        info["first_loss"], info["best_loss"])
            ql = _finalize_layer("lm_head", w, scheme, best, tcfg,
                                 inner_name="head")
        else:
            r = rtn_quantize_layer(w, scheme)
            ql = QuantizedLayer(name="lm_head", scheme=scheme, qdq=r.qdq,
                                scale=r.scale, zp=r.zp,
                                extras=getattr(r, "extras", None))
        new_params[head_name] = ql.qdq.astype(w.dtype)
        layers["lm_head"] = ql

    if shard_writer is not None:
        # non-quantized leaves + (possibly tuned) head round out the shards
        from ..export import _flatten_params
        flat = _flatten_params(new_params)
        quant_names = set(layers)
        for k, v in flat.items():
            if k not in quant_names:
                shard_writer.add(k, np.asarray(v))
        if "lm_head" in layers:
            shard_writer.add_many(_pack_layer(layers["lm_head"]))
        shard_writer.finalize()

    if _prof is not None:
        total = sum(_prof.values())
        logger.info("phase profile (%.1fs attributed): %s", total,
                    {k: round(v, 1) for k, v in sorted(
                        _prof.items(), key=lambda kv: -kv[1])})
    return QuantizeResult(params=new_params, layers=layers,
                          loss_traces=traces,
                          attention_scales=attention_scales,
                          imatrices=imatrices,
                          profile=dict(_prof or {}))
