"""SignRound: block-wise sign-SGD tuning of rounding offsets + clip scales.

The heart of the framework — role of the reference's
``SignRoundQuantizer.quantize_block`` (``auto_round/algorithms/quantization/
sign_round/quantizer.py:297-525``: wrap layers → SignSGD over ``iters``
steps of batched block forwards with qdq weights → MSE(pred, fp_ref)×1000 →
keep the best-loss parameter snapshot → bake qdq weights).

TPU-first design (SURVEY.md §7): instead of mutating per-layer wrapper
modules, the tunable state is one pytree ``{layer: {v, min_scale,
max_scale}}`` and the whole tuning run is a single jitted
``lax.scan`` over steps — one compilation, no host round-trips.  The
best-loss snapshot is kept on-device with ``jnp.where`` (the reference
calls ``.item()`` every iter, ``quantizer.py:469`` — a host sync we avoid
entirely), and ``dynamic_max_gap`` early-stop is a carry flag that freezes
further updates.

The block forward is supplied by the caller as a pure function
``block_fwd(weights, inputs) -> outputs`` where ``weights`` is the block's
parameter pytree; quantized layers are substituted with their qdq'd
weights before the call, so model code stays quantization-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes.registry import get_quant_func
from ..schemes import QuantizationScheme
from ..utils.pytree import get_by_path, set_by_path
from .signsgd import sign_sgd

__all__ = ["TuneConfig", "TuneResult", "init_tune_params", "make_qdq_weights",
           "tune_block", "mse_loss"]


@dataclass(frozen=True)
class TuneConfig:
    """Tuning hyper-parameters (field surface from the reference's config
    ownership table, ``auto_round/autoround.py:350-367``)."""

    iters: int = 200
    lr: Optional[float] = None          # None → 1/iters (reference default)
    minmax_lr: Optional[float] = None   # None → lr
    batch_size: int = 8
    seed: int = 42
    enable_minmax_tuning: bool = True
    enable_round_tuning: bool = True
    use_best_params: bool = True        # inverse of not_use_best_mse
    dynamic_max_gap: int = -1           # >0 → freeze updates after no-improve gap
    momentum: float = 0.0
    clip_lo: float = 0.0                # min/max_scale clamp range
    clip_hi: float = 1.0                # alg_ext widens to (0, 2)
    loss_scale: float = 1000.0          # reference multiplies MSE by 1000
    gradient_accumulate_steps: int = 1
    # alg_ext (SignRoundV2, reference sign_roundv2/quantizer.py): searched
    # per-group init scale, widened clamp, outlier-masked loss for bits<4
    enable_alg_ext: bool = False
    outlier_mask_frac: float = 0.001
    # "signsgd" (default) or "adam" (AdamRound — reference
    # adam_round/adam.py:25: torch AdamW swap-in for SignSGD)
    optimizer: str = "signsgd"
    # rematerialize the block forward in the backward pass (the TPU
    # answer to the reference's low_gpu_mem_usage: trade FLOPs for HBM)
    use_remat: bool = False
    # tune a per-layer shrink on the static activation scales (reference
    # AR_ENABLE_ACT_MINMAX_TUNING act_max_scale, wrapper.py:209-211,
    # clamped to [clip_lo, clip_hi] like the reference's [0, 1])
    tune_act_scales: bool = False
    # tune norm weights and linear biases with a round-free asym-grid
    # perturbation (reference enable_norm_bias_tuning: WrapperLayerNorm /
    # WrapperLlamaNorm + bias_v, wrapper.py:215,318-335,636-746)
    enable_norm_bias_tuning: bool = False

    def resolved_lr(self) -> float:
        return self.lr if self.lr is not None else 1.0 / max(self.iters, 1)

    def resolved_minmax_lr(self) -> float:
        return self.minmax_lr if self.minmax_lr is not None else self.resolved_lr()


class TuneResult(dict):
    """dict of best params per layer + .loss_trace / .final_loss attributes."""

    loss_trace: np.ndarray = None
    first_loss: float = None
    best_loss: float = None


_INIT_SEARCH_CACHE: Dict[str, Any] = {}


def _search_init_max_scale(w: jax.Array, scheme: QuantizationScheme
                           ) -> jax.Array:
    """alg_ext searched init: per-group max_scale minimizing qdq error.

    int-sym uses the closed grid search; other dtypes sweep a uniform
    candidate grid through their own qdq and pick per-group argmin
    (reference dispatch, ``data_type/utils.py:178-310``).
    """
    from ..dtypes.intq import search_init_scale_ratio

    g = scheme.group_size
    if scheme.data_type == "int" and scheme.sym and isinstance(g, int) \
            and scheme.super_bits is None:
        return search_init_scale_ratio(w, scheme.bits, g)

    fn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym)
    O, I = w.shape
    is_mx = scheme.data_type.startswith("mx")
    cands = jnp.concatenate([
        1.0 - 0.05 * jnp.arange(10, dtype=jnp.float32),
        (1.0 + 0.25 * jnp.arange(1, 5, dtype=jnp.float32)) if is_mx
        else jnp.zeros((0,), jnp.float32),
    ])

    # ONE compiled executable per (scheme, weight shape): unjitted, the
    # sweep dispatches every op separately — minutes of 4-28 ms tunnel
    # round-trips per 8B block at orchestration time (r3 weak #7).  The
    # jitted fn closes over the SCHEME only; weights/candidates ride as
    # arguments so one cache entry serves every layer of that scheme
    # (jit re-specializes per shape internally).
    key = repr(scheme)
    sweep = _INIT_SEARCH_CACHE.get(key)
    if sweep is None:
        gs = scheme.group_size
        kw = {}
        if scheme.super_bits is not None:
            kw = dict(super_bits=scheme.super_bits,
                      super_group_size=scheme.super_group_size)

        @jax.jit
        def sweep(wx, cx):
            Ox, Ix = wx.shape
            ggx = Ix if (not isinstance(gs, int) or gs in (-1, 0)) \
                else min(gs, Ix)

            def err_for(c):
                ms = jnp.full((Ox, -(-Ix // ggx)), c, jnp.float32)
                qdq = fn(wx, bits=scheme.bits, group_size=gs,
                         max_scale=ms, clip_lo=0.0, clip_hi=2.0,
                         **kw).qdq
                d = (qdq.astype(jnp.float32)
                     - wx.astype(jnp.float32)) ** 2
                pad = (-Ix) % ggx
                if pad:
                    d = jnp.pad(d, ((0, 0), (0, pad)))
                return d.reshape(Ox, -1, ggx).sum(-1)  # (O, groups)

            errs = jax.vmap(err_for)(cx)
            return cx[jnp.argmin(errs, axis=0)]

        _INIT_SEARCH_CACHE[key] = sweep
        if len(_INIT_SEARCH_CACHE) > 64:
            _INIT_SEARCH_CACHE.pop(next(iter(_INIT_SEARCH_CACHE)))
    return sweep(w, cands)


def init_tune_params(
    weights: Dict[str, jax.Array],
    schemes: Dict[str, QuantizationScheme],
    cfg: TuneConfig,
    init_scales: Optional[Dict[str, jax.Array]] = None,
    norm_bias_leaves: Optional[Tuple[str, ...]] = None,
) -> Dict[str, Dict[str, jax.Array]]:
    """V = 0 (shape of W), min/max_scale = 1.0 per group — reference init
    (``wrapper.py:179-181, 252-254``).  fp32 params, like the reference.
    With ``enable_alg_ext``, max_scale seeds from a per-group search."""
    params = {}
    for name, scheme in schemes.items():
        w = get_by_path(weights, name)
        O, I = w.shape
        g = scheme.group_size if scheme.group_size not in (-1, 0) else I
        if isinstance(g, tuple):
            groups_shape = (1, 1)  # 2-D block fp8: clip scales per-tensor here
        else:
            # (O, groups_per_row): same axis semantics as the weight, so
            # tensor-parallel shardings of W apply unchanged (parallel/mesh.py)
            groups_shape = (O, -(-I // g))
        layer = {}
        if cfg.enable_round_tuning:
            layer["v"] = jnp.zeros((O, I), jnp.float32)
        if cfg.enable_minmax_tuning:
            if (cfg.enable_alg_ext and not isinstance(g, tuple)
                    and not (scheme.super_bits is not None
                             and scheme.data_type == "int_dq")):
                # (dq schemes under alg_ext anchor on the frozen searched
                # grid instead — min/max start at 1.0 on that grid)
                init = _search_init_max_scale(w, scheme).reshape(groups_shape)
            else:
                init = jnp.ones(groups_shape, jnp.float32)
            if init_scales and name in init_scales:
                # AWQ clip search seeds the clip init (reference
                # awq_clip_max consumed at wrapper.py:173-175)
                init = jnp.asarray(init_scales[name], jnp.float32).reshape(
                    groups_shape)
            layer["min_scale"] = init
            layer["max_scale"] = init
        params[name] = layer
    if (cfg.tune_act_scales and isinstance(weights, dict)
            and "_act_scales" in weights):
        static = weights["_act_scales"].get("static") or {}
        # leaf key "scale" routes these to the minmax LR group (reference
        # trains act_max_scale alongside the clip scales)
        act = {n: {"scale": jnp.ones((), jnp.float32)}
               for n in static if n in schemes}
        if act:
            params["_act"] = act
    if cfg.enable_norm_bias_tuning and norm_bias_leaves:
        # one continuous grid-unit perturbation per norm/bias element
        # (leaf key "v" routes these to the main-LR SignSGD group, like
        # the reference's bias_v/norm v params)
        params["_nb"] = {
            n: {"v": jnp.zeros(get_by_path(weights, n).shape, jnp.float32)}
            for n in norm_bias_leaves}
    return params


def make_qdq_weights(
    weights: Dict[str, Any],
    tune_params: Dict[str, Dict[str, jax.Array]],
    schemes: Dict[str, QuantizationScheme],
    cfg: TuneConfig,
    extras: Optional[Dict[str, Dict[str, Any]]] = None,
) -> Dict[str, Any]:
    """Substitute qdq'd weights for every tuned layer; pass the rest through.

    ``extras`` carries per-layer static tensors (imatrix, global_scale...).
    Layer names may be dotted paths into nested structures (MoE experts).
    """
    out = weights
    if "_act" in tune_params and isinstance(weights, dict) \
            and "_act_scales" in weights:
        sc = dict(weights["_act_scales"])
        static = dict(sc.get("static") or {})
        for n, m in tune_params["_act"].items():
            if n in static:
                static[n] = static[n] * jnp.clip(m["scale"], cfg.clip_lo,
                                                 cfg.clip_hi)
        sc["static"] = static
        out = dict(out)
        out["_act_scales"] = sc
    for name, p in tune_params.get("_nb", {}).items():
        from ..dtypes.intq import qdq_asym_wo_round
        leaf = get_by_path(weights, name)
        out = set_by_path(out, name, qdq_asym_wo_round(leaf, p["v"]))
    for name, scheme in schemes.items():
        fn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym)
        p = tune_params.get(name, {})
        kw = dict(extras.get(name, {})) if extras else {}
        if scheme.super_bits is not None:
            kw.setdefault("super_bits", scheme.super_bits)
            kw.setdefault("super_group_size", scheme.super_group_size)
        r = fn(
            get_by_path(weights, name),
            bits=scheme.bits,
            group_size=scheme.group_size,
            v=p.get("v"),
            min_scale=p.get("min_scale"),
            max_scale=p.get("max_scale"),
            clip_lo=cfg.clip_lo,
            clip_hi=cfg.clip_hi,
            **kw,
        )
        out = set_by_path(out, name, r.qdq)
    return out


def mse_loss(pred, ref, mask=None):
    """MSE in fp32; optional valid-token mask (reference masks -100 ids,
    ``quantization/base.py:270-293``)."""
    return _masked_mse(pred, ref, mask)


def _masked_mse(pred, ref, mask):
    diff = (pred.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2
    if mask is None:
        return jnp.mean(diff)
    m = mask.astype(jnp.float32)
    while m.ndim < diff.ndim:
        m = m[..., None]
    denom = jnp.maximum(jnp.sum(m) * (diff.size / m.size), 1.0)
    return jnp.sum(diff * m) / denom

_RUN_CACHE: Dict[Any, Callable] = {}


def _build_run(block_fwd, schemes, cfg: TuneConfig, has_mask: bool,
               has_extras: bool, lfq_fn, mask_outliers: bool):
    """Build the jitted scan-over-steps runner.

    All per-block data (weights, caches, masks, extras, init carry, batch
    indices) flow in as traced ARGUMENTS so one compiled executable serves
    every block with the same shapes/config — jax.jit caches on function
    identity, and per-block closures would recompile the whole tuning scan
    for each block (minutes apiece under remote TPU compilation).
    """
    lr_scale = cfg.resolved_minmax_lr() / max(cfg.resolved_lr(), 1e-12)
    if cfg.optimizer == "adam":
        import optax
        _adam = optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_schedule(
                lambda t: -cfg.resolved_lr()
                * jnp.maximum(1.0 - t / max(cfg.iters, 1), 0.0)))
        opt_init = _adam.init
        def opt_update(grads, state, params=None):
            return _adam.update(grads, state)
    else:
        opt_init, opt_update = sign_sgd(
            cfg.resolved_lr(), cfg.iters, momentum=cfg.momentum,
            lr_scale_fn=lambda n: lr_scale if "scale" in n else 1.0)

    def run_impl(weights, inputs, ref_outputs, mask, extras, carry,
                 batch_idx):
        def loss_fn(params, idx):
            qweights = make_qdq_weights(weights, params, schemes, cfg,
                                        extras)
            batch_in = jax.tree.map(lambda a: jnp.take(a, idx, axis=0),
                                    inputs)
            batch_ref = jnp.take(ref_outputs, idx, axis=0)
            batch_mask = (None if mask is None
                          else jnp.take(mask, idx, axis=0))
            out = block_fwd(qweights, batch_in)
            if lfq_fn is not None:
                return lfq_fn(out, idx)
            if mask_outliers:
                diff2 = jax.lax.stop_gradient(
                    (out.astype(jnp.float32)
                     - batch_ref.astype(jnp.float32)) ** 2)
                thr = jnp.quantile(diff2.reshape(-1),
                                   1.0 - cfg.outlier_mask_frac)
                keep = (diff2 <= thr).astype(jnp.float32)
                d = ((out.astype(jnp.float32)
                      - batch_ref.astype(jnp.float32)) ** 2) * keep
                if batch_mask is not None:
                    m = batch_mask.astype(jnp.float32)
                    while m.ndim < d.ndim:
                        m = m[..., None]
                    d = d * m
                    denom = jnp.maximum(jnp.sum(keep * m), 1.0)
                else:
                    denom = jnp.maximum(jnp.sum(keep), 1.0)
                return jnp.sum(d) / denom * cfg.loss_scale
            return _masked_mse(out, batch_ref, batch_mask) * cfg.loss_scale

        def grad_accum(params, idx_groups):
            # accum == 1 must NOT go through a loop: a fori_loop body is a
            # separate XLA while-computation, blocking fusion/aliasing of
            # the whole gradient step
            if cfg.gradient_accumulate_steps == 1:
                return jax.value_and_grad(loss_fn)(params, idx_groups[0])
            def one(i, acc):
                l, g = jax.value_and_grad(loss_fn)(params, idx_groups[i])
                acc_l, acc_g = acc
                return (acc_l + l, jax.tree.map(jnp.add, acc_g, g))
            zero = (jnp.zeros(()), jax.tree.map(jnp.zeros_like, params))
            tot_l, tot_g = jax.lax.fori_loop(
                0, cfg.gradient_accumulate_steps, one, zero)
            k = float(cfg.gradient_accumulate_steps)
            return tot_l / k, jax.tree.map(lambda x: x / k, tot_g)

        def step(c, idx_groups):
            params, opt_state, best_params, best_loss, since_best = c
            loss, grads = grad_accum(params, idx_groups)

            is_best = loss < best_loss
            new_best_params = jax.tree.map(
                lambda b, cc: jnp.where(is_best, cc, b), best_params, params)
            new_best_loss = jnp.minimum(best_loss, loss)
            since_best = jnp.where(is_best, 0, since_best + 1)

            updates, new_opt_state = opt_update(grads, opt_state)
            if cfg.dynamic_max_gap > 0:
                frozen = since_best >= cfg.dynamic_max_gap
                new_params = jax.tree.map(
                    lambda pp, u: jnp.where(frozen, pp, pp + u), params,
                    updates)
            else:
                new_params = jax.tree.map(lambda pp, u: pp + u, params,
                                          updates)
            return ((new_params, new_opt_state, new_best_params,
                     new_best_loss, since_best), loss)

        return jax.lax.scan(step, carry, batch_idx)

    return jax.jit(run_impl), opt_init


def tune_block(
    block_fwd: Callable[[Dict[str, Any], Any], jax.Array],
    weights: Dict[str, Any],
    inputs: Any,
    ref_outputs: jax.Array,
    schemes: Dict[str, QuantizationScheme],
    cfg: TuneConfig,
    mask: Optional[jax.Array] = None,
    extras: Optional[Dict[str, Dict[str, Any]]] = None,
    lfq_fn: Optional[Callable] = None,
    init_scales: Optional[Dict[str, jax.Array]] = None,
    norm_bias_leaves: Optional[Tuple[str, ...]] = None,
) -> Tuple[Dict[str, Dict[str, jax.Array]], Dict[str, np.ndarray]]:
    """Tune one block's rounding params.  Returns (best_params, info).

    inputs: pytree whose leaves are batched along axis 0 with nsamples
    (cached block inputs); ref_outputs: (nsamples, ...) FP block outputs.
    mask: optional (nsamples, seqlen) validity mask.
    lfq_fn: optional ``(block_output, idx) -> scalar`` replacing the MSE
    loss (reference last-block LM cross-entropy, ``quantizer.py:253-295``).

    Pass the SAME ``block_fwd`` callable for every block of a model — the
    compiled tuning scan is cached on its identity.
    """
    if cfg.enable_alg_ext and cfg.clip_hi <= 1.0:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, clip_lo=0.0, clip_hi=2.0)
    if cfg.use_remat:
        block_fwd = jax.checkpoint(block_fwd)
    mask_outliers = cfg.enable_alg_ext and any(
        s.bits < 4 or (s.act_bits <= 4 and s.is_act_quantized)
        for s in schemes.values())

    nsamples = jax.tree.leaves(inputs)[0].shape[0]
    bs = min(cfg.batch_size, nsamples)
    # Cyclic shuffled batch sampling (reference IndexSampler,
    # compressors/utils.py:388-440), precomputed host-side for determinism.
    rng = np.random.default_rng(cfg.seed)
    n_batches_per_epoch = max(nsamples // bs, 1)
    idx_epochs = []
    total_draws = cfg.iters * cfg.gradient_accumulate_steps
    while len(idx_epochs) * n_batches_per_epoch < total_draws:
        perm = rng.permutation(nsamples)[: n_batches_per_epoch * bs]
        idx_epochs.append(perm.reshape(n_batches_per_epoch, bs))
    all_idx = np.concatenate(idx_epochs)[:total_draws]
    batch_idx = jnp.asarray(
        all_idx.reshape(cfg.iters, cfg.gradient_accumulate_steps, bs))

    tune_params = init_tune_params(weights, schemes, cfg,
                                   init_scales=init_scales,
                                   norm_bias_leaves=norm_bias_leaves)

    cache_key = (
        block_fwd, lfq_fn, cfg,
        tuple(sorted((k, repr(v)) for k, v in schemes.items())),
        mask is None, extras is None, mask_outliers,
    )
    cached = _RUN_CACHE.get(cache_key)
    if cached is None:
        cached = _build_run(block_fwd, dict(schemes), cfg, mask is not None,
                            extras is not None, lfq_fn, mask_outliers)
        _RUN_CACHE[cache_key] = cached
        if len(_RUN_CACHE) > 64:
            _RUN_CACHE.pop(next(iter(_RUN_CACHE)))
    run, opt_init = cached

    init_carry = (
        tune_params,
        opt_init(tune_params),
        jax.tree.map(lambda x: x, tune_params),
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.zeros((), jnp.int32),
    )

    (final_params, _, best_params, best_loss, _), losses = run(
        weights, inputs, ref_outputs, mask, extras, init_carry, batch_idx)

    if not cfg.use_best_params:
        best_params = final_params
    losses = np.asarray(losses)
    info = {
        "loss_trace": losses,
        "first_loss": float(losses[0]) if len(losses) else float("nan"),
        "best_loss": float(np.asarray(best_loss)),
    }
    return best_params, info
