"""AutoScheme: mixed-precision bit-width assignment under an avg-bits budget.

Role of the reference's ``auto_round/auto_scheme/`` (``AutoScheme``
dataclass ``gen_auto_scheme.py:28``, delta-loss scoring
``delta_loss.py:100-160`` and knapsack ``choose_bits_per_layer_with_path``
``delta_loss.py:1291``): score every quantizable layer under each candidate
scheme with a first-order Taylor estimate of LM-loss damage

    score(layer, scheme) = Σ | ∂L/∂W ⊙ (W − qdq_scheme(W)) |

then assign one scheme per layer minimizing total estimated damage subject
to the average-bits budget.

TPU-first: the gradient pass is one ``jax.grad`` of the LM cross-entropy
through the functional model (no wrapper modules, no backward hooks), and
scheme scoring is a vectorized qdq sweep.  The selector uses a Lagrangian
bisection over the bits/loss trade-off (each step is an independent
per-layer argmin — embarrassingly parallel) with a greedy refinement,
rather than the reference's beam-pruned DP; for the small layer×option
spaces involved both find the same frontier points.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes.registry import get_quant_func
from ..models import llama
from ..schemes import QuantizationScheme, parse_scheme
from ..utils.logger import logger

__all__ = ["AutoScheme", "gen_auto_scheme", "scheme_storage_bits"]


@dataclass(frozen=True)
class AutoScheme:
    """User-facing search spec (reference ``gen_auto_scheme.py:28``)."""
    avg_bits: float
    options: Tuple[Union[str, QuantizationScheme], ...]
    nsamples: int = 8
    seed: int = 42
    # cache delta-loss score matrices under AR_WORK_SPACE so re-running
    # with a different avg_bits target skips the scoring passes
    enable_cache: bool = False
    # score GGUF k-quant / opt-RTN options with an imatrix-weighted quant
    # search (reference delta_loss.py:375-466 imatrix GGUF wrappers):
    # one calibration forward accumulates per-input-channel x^2 means
    use_imatrix: bool = False


def scheme_storage_bits(scheme: QuantizationScheme, shape) -> float:
    """Effective stored bits/weight incl. scale/zp overhead (the reference
    accounts scale storage when computing avg bits)."""
    O, I = shape
    g = scheme.group_size
    if isinstance(g, tuple):
        n_groups = (-(-O // g[0])) * (-(-I // g[1]))
        per_weight_overhead = n_groups * 16 / (O * I)
        return scheme.bits + per_weight_overhead
    if g in (0,):
        return float(scheme.bits)
    if g == -1:
        g = I
    n_groups = O * (-(-I // g))
    scale_bits = 16.0
    zp_bits = 0.0 if scheme.sym else scheme.bits
    if scheme.super_bits is not None:
        # k-quant: sub-scales are super_bits ints + fp16 supers
        sgs = scheme.super_group_size or 8
        scale_bits = scheme.super_bits + 16.0 / sgs
        zp_bits = 0.0 if scheme.sym else scheme.super_bits + 16.0 / sgs
    return scheme.bits + n_groups * (scale_bits + zp_bits) / (O * I)


def _lm_loss(params, cfg, ids):
    from ..models.registry import get_model_fns
    logits = get_model_fns(cfg).model_fwd(
        params, ids[:, :-1], cfg).astype(jnp.float32)
    targets = ids[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def gen_auto_scheme(
    params,
    model_cfg,
    auto_scheme: AutoScheme,
    input_ids: jax.Array,
    layer_names: Optional[Sequence[str]] = None,
) -> Dict[str, QuantizationScheme]:
    """Return {flat_layer_name: scheme} hitting the avg-bits budget."""
    options = [parse_scheme(o) for o in auto_scheme.options]
    if layer_names is None:
        from ..models.registry import get_model_fns
        from .layer_config import prune_missing_layers
        layer_names = [
            f"blocks.{i}.{ln}" for i in range(model_cfg.num_layers)
            for ln in get_model_fns(model_cfg).block_linear_names(model_cfg)]
        layer_names = list(prune_missing_layers(
            {n: None for n in layer_names}, params))

    ids = input_ids[: auto_scheme.nsamples]

    # score cache (reference work-space caching of delta-loss scores):
    # keyed on model identity, layer set, options, and calib tokens —
    # NOT on avg_bits, so budget re-targeting reuses the matrices
    cache_path, cached = None, None
    if auto_scheme.enable_cache:
        import hashlib
        import os as _os

        from .. import envs
        h = hashlib.sha1()
        h.update(repr((type(model_cfg).__name__,
                       {k: str(v) for k, v in model_cfg.__dict__.items()
                        if k != "dtype"},
                       tuple(layer_names),
                       tuple(o.key() for o in options),
                       int(auto_scheme.nsamples),
                       bool(auto_scheme.use_imatrix))).encode())
        h.update(np.asarray(ids).tobytes())
        h.update(np.asarray(params["embed_tokens"][:4],
                            np.float32).tobytes())
        cache_path = _os.path.join(envs.AR_WORK_SPACE, "auto_scheme_cache",
                                   h.hexdigest() + ".npz")
        if _os.path.exists(cache_path):
            z = np.load(cache_path)
            cached = (z["scores"], z["bits_cost"], z["nparams"])
            logger.info("AutoScheme: score cache hit %s", cache_path)

    # one gradient pass over the quantizable leaves — jitted with the
    # params as ARGUMENTS (no captured-constant HLO, one executable)
    def _grad_blocks(blocks, rest, i):
        return jax.grad(
            lambda b: _lm_loss({**rest, "blocks": b}, model_cfg, i))(blocks)

    grads_blocks = (jax.jit(_grad_blocks)(
        params["blocks"],
        {k: v for k, v in params.items() if k != "blocks"}, ids)
        if cached is None else None)

    # activation-side damage (reference mix_score = weight_score +
    # act_score, delta_loss.py:100-160): capture each quantized linear's
    # input x and dL/dx via zero probes injected through the linear
    # interceptor, then score |dL/dx * (x - qdq_act(x))| per option.
    act_options = [o for o in options
                   if o.effective_act().is_act_quantized]
    act_x, act_g = {}, {}
    imatrices = {}
    if (act_options or auto_scheme.use_imatrix) and cached is None:
        from ..algorithms.actquant import qdq_act
        from ..models.registry import get_model_fns as _gmf
        mfns = _gmf(model_cfg)
        from ..models import llama as _ll
        inner = {n.split(".", 2)[2] for n in layer_names}
        cos, sin = mfns.rope_tables(model_cfg, ids.shape[1] - 1)

        # params/ids ride as jit ARGUMENTS (closure capture would bake
        # the whole model into the HLO as constants — the remote-compile
        # payload then ships GBs per compile)
        def fwd_with_probes(probes, params, ids):
            x = mfns.embed_fwd(params, ids[:, :-1], model_cfg)
            captured = {}

            for bi, b in enumerate(params["blocks"]):
                def lf(name, xx, ww, bias=None, bi=bi):
                    key = f"blocks.{bi}.{name}"
                    if key in probes:
                        xx = xx + probes[key]
                        captured[key] = xx
                    y = jnp.einsum("...i,oi->...o", xx, ww)
                    if bias is not None:
                        y = y + bias
                    return y

                x = mfns.block_fwd(b, x, cos, sin, model_cfg, linear_fn=lf)
            logits = mfns.final_fwd(params, x, model_cfg).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)
            return jnp.mean(nll), captured

        # probe shapes: one per quantized layer input
        probe_shapes = {}
        x0 = mfns.embed_fwd(params, ids[:1, :-1], model_cfg)
        from ..utils.pytree import get_by_path as _gbp
        for flat in layer_names:
            if not flat.startswith("blocks."):
                continue
            w = _gbp(params["blocks"], flat.split(".", 1)[1])
            probe_shapes[flat] = (ids.shape[0], ids.shape[1] - 1, w.shape[1])
        probes = {k: jnp.zeros(s, x0.dtype) for k, s in probe_shapes.items()}
        if act_options:
            (loss_val, act_x), g = jax.jit(
                lambda p, w, i: jax.value_and_grad(
                    fwd_with_probes, has_aux=True)(p, w, i)
            )(probes, params, ids)
            act_g = g
        else:   # imatrix only: plain forward capture, no gradient
            _, act_x = jax.jit(fwd_with_probes)(probes, params, ids)
        if auto_scheme.use_imatrix:
            imatrices = {k: jnp.mean(jnp.square(v.astype(jnp.float32)),
                                     axis=(0, 1))
                         for k, v in act_x.items()}

    from ..utils.pytree import get_by_path

    def get_leaf(tree, flat):
        parts = flat.split(".", 2)
        if parts[0] == "blocks":
            return get_by_path(tree[int(parts[1])], parts[2])
        raise KeyError(flat)

    def leaf_of(flat, tree_blocks, full_tree):
        if flat == "lm_head":
            return full_tree.get("lm_head", full_tree["embed_tokens"])
        return get_leaf(tree_blocks, flat)

    # GGUF 256-divisibility fallback (reference
    # ``gen_auto_scheme.py:206-249``): a k-quant option on an odd-shaped
    # layer silently substitutes the Q8_0-grid int8 scheme
    _gguf_fallback = QuantizationScheme(bits=8, group_size=32, sym=True,
                                        data_type="int")

    def effective_option(opt: QuantizationScheme, shape):
        if opt.super_bits is not None:
            block = (opt.group_size or 1) * (opt.super_group_size or 1)
            if shape[1] % block:
                return _gguf_fallback
        return opt

    # score every (layer, option): layers grouped by weight shape and
    # scored as ONE stacked vmapped device program per (shape, option) —
    # per-pair float() syncs were hundreds of round-trips over a
    # tunneled link (round-1 weak #6)
    n_l, n_o = len(layer_names), len(options)
    if cached is not None:
        scores, bits_cost, nparams = cached
        scores = scores.copy()
    else:
        scores = np.zeros((n_l, n_o))
        bits_cost = np.zeros((n_l, n_o))
        nparams = np.zeros(n_l)

        def weight_score(w, g, opt: QuantizationScheme, im=None):
            fn = get_quant_func(opt.data_type, opt.bits, opt.sym, mode="rtn")
            kw = {}
            if opt.super_bits is not None:
                kw = dict(super_bits=opt.super_bits,
                          super_group_size=opt.super_group_size)
            if im is not None:
                # imatrix-weighted k-quant search scores the qdq the
                # export would actually produce (reference imatrix GGUF
                # wrappers, delta_loss.py:375-466)
                kw["imatrix"] = im
            qdq = fn(w, bits=opt.bits, group_size=opt.group_size, **kw).qdq
            return jnp.sum(jnp.abs(
                g.astype(jnp.float32)
                * (w.astype(jnp.float32) - qdq.astype(jnp.float32))))

        from collections import defaultdict
        by_shape = defaultdict(list)
        for li, flat in enumerate(layer_names):
            w = leaf_of(flat, params["blocks"], params)
            nparams[li] = w.size
            by_shape[tuple(w.shape)].append(li)

        _stack_cache: Dict = {}

        def scorer_for(opt, with_im=False):
            key = (opt, with_im)
            fn = _stack_cache.get(key)
            if fn is None:
                if with_im:
                    fn = jax.jit(jax.vmap(
                        lambda w, g, im, opt=opt: weight_score(w, g, opt,
                                                               im)))
                else:
                    fn = jax.jit(jax.vmap(
                        lambda w, g, opt=opt: weight_score(w, g, opt)))
                _stack_cache[key] = fn
            return fn

        pending = []  # (li_list, oi, device array) — fetched in one sync
        grads_full = {"lm_head": None}
        if "lm_head" in layer_names:
            head_name = "lm_head" if "lm_head" in params else "embed_tokens"

            def loss_of_head(hw):
                p = dict(params)
                p[head_name] = hw
                return _lm_loss(p, model_cfg, ids)
            grads_full["lm_head"] = jax.grad(loss_of_head)(params[head_name])

        for shape, lis in by_shape.items():
            W = jnp.stack([leaf_of(layer_names[li], params["blocks"], params)
                           for li in lis])
            G = jnp.stack([
                grads_full["lm_head"] if layer_names[li] == "lm_head"
                else get_leaf(grads_blocks, layer_names[li]) for li in lis])
            IM = None
            if auto_scheme.use_imatrix and imatrices:
                IM = jnp.stack([
                    imatrices.get(layer_names[li],
                                  jnp.ones((shape[1],), jnp.float32))
                    for li in lis])
            for oi, opt in enumerate(options):
                eff = effective_option(opt, shape)
                use_im = IM is not None and eff.super_bits is not None
                pending.append((lis, oi,
                                scorer_for(eff, use_im)(W, G, IM) if use_im
                                else scorer_for(eff)(W, G)))
                for li in lis:
                    bits_cost[li, oi] = scheme_storage_bits(eff, shape)

        # activation-side damage: per-layer jitted scores, fetched in the
        # same single sync (shapes differ per layer input width)
        act_pending = []
        if act_options:
            from ..algorithms.actquant import qdq_act

            act_score_fns = {}
            for oi, opt in enumerate(options):
                if not opt.effective_act().is_act_quantized:
                    continue

                def make(opt=opt):
                    @jax.jit
                    def s(x, gx):
                        dq = qdq_act(x, opt)
                        return jnp.sum(jnp.abs(
                            gx.astype(jnp.float32)
                            * (x.astype(jnp.float32) - dq.astype(jnp.float32))))
                    return s
                act_score_fns[oi] = make()
            for li, flat in enumerate(layer_names):
                for oi in act_score_fns:
                    if flat in act_x:
                        act_pending.append(
                            (li, oi, act_score_fns[oi](act_x[flat],
                                                       act_g[flat])))

        # ONE host sync for everything
        fetched = jax.device_get([p[2] for p in pending]
                                 + [p[2] for p in act_pending])
        for (lis, oi, _), vals in zip(pending, fetched[:len(pending)]):
            for j, li in enumerate(lis):
                scores[li, oi] = float(vals[j])
        for (li, oi, _), v in zip(act_pending, fetched[len(pending):]):
            scores[li, oi] += float(v)
        if cache_path is not None:
            import os as _os
            _os.makedirs(_os.path.dirname(cache_path), exist_ok=True)
            np.savez(cache_path, scores=scores,
                     bits_cost=bits_cost, nparams=nparams)
            logger.info("AutoScheme: scores cached -> %s", cache_path)

    # lm-head trick (reference ``delta_loss.py:1439`` _apply_head_trick):
    # logits take lm_head error undampened — bias its candidates toward
    # high precision, relaxed below if the budget cannot fit
    head_restricted = None
    if "lm_head" in layer_names:
        hl = layer_names.index("lm_head")
        high = [oi for oi, o in enumerate(options) if o.bits >= 6]
        if len(high) == 1:
            allowed = high
        elif len(high) > 1 and auto_scheme.avg_bits > 6:
            allowed = [max(high, key=lambda oi: options[oi].bits)]
        elif high:
            allowed = high
        else:
            allowed = [int(np.argmin(scores[hl]))]
        head_restricted = (hl, scores[hl].copy())
        for oi in range(n_o):
            if oi not in allowed:
                scores[hl, oi] = np.inf

    budget = auto_scheme.avg_bits * nparams.sum()
    weighted_bits = bits_cost * nparams[:, None]

    def _feasible_min():
        wb = weighted_bits.copy()
        wb[scores == np.inf] = np.inf
        return float(wb.min(1) @ np.ones(1)) if False else float(
            np.where(np.isfinite(wb), wb, np.nan).min(1).sum())

    if head_restricted is not None and _feasible_min() > budget:
        hl, saved = head_restricted
        scores[hl] = saved  # relax: restriction made the budget infeasible

    lo_bits = float((weighted_bits.min(1)).sum())
    hi_bits = float((weighted_bits.max(1)).sum())
    if not (lo_bits <= budget <= hi_bits):
        raise ValueError(
            f"avg_bits={auto_scheme.avg_bits} outside reachable range "
            f"[{lo_bits/nparams.sum():.3f}, {hi_bits/nparams.sum():.3f}]")

    def assign(lam):
        return np.argmin(scores + lam * weighted_bits, axis=1)

    lam_lo, lam_hi = 0.0, 1.0
    while (weighted_bits[np.arange(len(layer_names)), assign(lam_hi)].sum()
           > budget and lam_hi < 1e12):
        lam_hi *= 4.0
    for _ in range(80):
        lam = 0.5 * (lam_lo + lam_hi)
        used = weighted_bits[np.arange(len(layer_names)), assign(lam)].sum()
        if used > budget:
            lam_lo = lam
        else:
            lam_hi = lam
    choice = assign(lam_hi)

    # greedy refinement: spend leftover budget on the best loss-per-bit
    # upgrades (recovers frontier points the bisection can straddle)
    used = weighted_bits[np.arange(len(layer_names)), choice].sum()
    improved = True
    while improved:
        improved = False
        best = None
        for li in range(len(layer_names)):
            cur = choice[li]
            for oi in range(len(options)):
                extra = weighted_bits[li, oi] - weighted_bits[li, cur]
                gain = scores[li, cur] - scores[li, oi]
                if gain > 0 and used + extra <= budget:
                    rate = gain / max(extra, 1e-9) if extra > 0 else np.inf
                    if best is None or rate > best[0]:
                        best = (rate, li, oi, extra)
        if best is not None:
            _, li, oi, extra = best
            choice[li] = oi
            used += extra
            improved = True

    plan = {}
    for li, flat in enumerate(layer_names):
        w = leaf_of(flat, params["blocks"], params)
        plan[flat] = effective_option(options[choice[li]], tuple(w.shape))
    achieved = used / nparams.sum()
    logger.info("AutoScheme: avg_bits target %.3f -> achieved %.3f "
                "(est. loss damage %.4g)", auto_scheme.avg_bits, achieved,
                float(scores[np.arange(len(layer_names)), choice].sum()))
    return plan
