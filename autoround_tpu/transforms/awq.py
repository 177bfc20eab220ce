"""AWQ activation-aware smoothing.

Role of the reference's ``transforms/awq/`` (``AWQTransform``
``awq/base.py:106``: activation-magnitude collection → per-mapping grid
search over smooth ratios scored by the block's own quantized-output MSE →
scale balance applied to weights): channels with large activations get
their weights scaled up (and the producer scaled down) so quantization
error lands on easy channels.

Functional form for a llama block, with the classic mappings:

  input_layernorm  → {q,k,v}:      gain /= s,  W[:, c] *= s
  post_attn_norm   → {gate,up}:    gain /= s,  W[:, c] *= s
  up_proj          → {down}:       up rows /= s, down[:, c] *= s

with s = amax_x^α / (amax_x^α).mean, α grid-searched per mapping against
MSE(block_q(x), block_fp(x)).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms.rtn import rtn_quantize_layer
from ..schemes import QuantizationScheme
from ..utils.logger import logger

__all__ = ["awq_smooth_block", "collect_channel_amax"]


def collect_channel_amax(fwd: Callable, weights, x, layer_names):
    """Per-layer per-IN-CHANNEL activation amax via the linear interceptor."""
    layer_names = set(layer_names)

    @jax.jit
    def fn(w, xx):
        stats = {}

        def tap(name, xi, wi, b=None):
            if name in layer_names:
                flat = jnp.abs(xi.astype(jnp.float32)).reshape(-1, xi.shape[-1])
                stats[name] = jnp.max(flat, axis=0)
            y = jnp.einsum("...i,oi->...o", xi, wi)
            if b is not None:
                y = y + b
            return y

        fwd(w, xx, tap)
        return stats

    return fn(weights, x)


# (scale_site, kind, target linears) — kind "norm" divides a gain vector,
# kind "linear_out" divides the producer's output rows
_MAPPINGS = [
    ("input_layernorm", "norm", ("q_proj", "k_proj", "v_proj")),
    ("post_attention_layernorm", "norm", ("gate_proj", "up_proj")),
    ("up_proj", "linear_out", ("down_proj",)),
]


def _apply_scale(block: Dict[str, Any], site: str, kind: str,
                 targets: Sequence[str], s: jax.Array) -> Dict[str, Any]:
    b = dict(block)
    sf = s.astype(jnp.float32)
    if kind == "norm":
        b[site] = (b[site].astype(jnp.float32) / sf).astype(b[site].dtype)
    else:
        b[site] = (b[site].astype(jnp.float32) / sf[:, None]).astype(
            b[site].dtype)
    for t in targets:
        b[t] = (b[t].astype(jnp.float32) * sf[None, :]).astype(b[t].dtype)
    return b


def awq_smooth_block(
    block: Dict[str, Any],
    block_fwd: Callable,        # (weights, x, linear_fn=None) -> out
    x_calib: jax.Array,
    schemes: Dict[str, QuantizationScheme],
    alphas: Sequence[float] = (0.0, 0.15, 0.3, 0.45, 0.6, 0.75, 0.9),
) -> Tuple[Dict[str, Any], Dict[str, float]]:
    """Grid-search smoothing scales per mapping.  Returns (block', chosen α)."""
    amax = collect_channel_amax(
        lambda w, xx, lf: block_fwd(w, xx, linear_fn=lf),
        block, x_calib, [m[2][0] for m in _MAPPINGS])
    ref_out = block_fwd(block, x_calib)

    def quantized_mse(b):
        qb = dict(b)
        for lname, scheme in schemes.items():
            if lname in qb:
                qb[lname] = rtn_quantize_layer(qb[lname], scheme).qdq.astype(
                    qb[lname].dtype)
        out = block_fwd(qb, x_calib)
        return float(jnp.mean((out.astype(jnp.float32)
                               - ref_out.astype(jnp.float32)) ** 2))

    chosen = {}
    cur = block
    for site, kind, targets in _MAPPINGS:
        if site not in block or not any(
                t in schemes and t in block for t in targets):
            continue  # non-llama block shapes (MoE experts) skip for now
        ax = jnp.maximum(amax[targets[0]], 1e-5)
        best_alpha, best_loss, best_block = 0.0, None, cur
        for alpha in alphas:
            if alpha == 0.0:
                cand = cur
            else:
                s = ax ** alpha
                s = s / jnp.exp(jnp.mean(jnp.log(s)))  # geo-mean normalize
                s = jnp.clip(s, 1e-3, 1e3)
                cand = _apply_scale(cur, site, kind, targets, s)
            loss = quantized_mse(cand)
            if best_loss is None or loss < best_loss:
                best_alpha, best_loss, best_block = alpha, loss, cand
        chosen[site] = best_alpha
        cur = best_block
    logger.info("AWQ smoothing: chosen alphas %s", chosen)
    return cur, chosen


def awq_clip_search(
    block: Dict[str, Any],
    schemes: Dict[str, QuantizationScheme],
    imatrix: Dict[str, jax.Array],
    n_grid: int = 10,
    max_shrink: float = 0.5,
) -> Dict[str, jax.Array]:
    """Per-group weight-clip ratio search (reference ``awq/base.py:120-125``
    clip search; result consumed as the min/max clip INIT at
    ``wrapper.py:173-175``).

    For each layer, grid-search a shrink ratio r ∈ [max_shrink, 1] of the
    group min/max (applied through the scheme's own qdq via max_scale=r)
    minimizing activation-weighted reconstruction error
    ``sum_i E[x_i^2] (qdq_ij - w_ij)^2`` — the per-group argmin seeds
    ``min_scale``/``max_scale`` so tuning starts from the clipped range.
    Returns {layer: (O, n_groups) ratio array}.
    """
    from ..dtypes.registry import get_quant_func
    from ..utils.pytree import get_by_path

    out: Dict[str, jax.Array] = {}
    ratios = 1.0 - jnp.arange(n_grid, dtype=jnp.float32) / n_grid \
        * (1.0 - max_shrink)
    for lname, scheme in schemes.items():
        g = scheme.group_size
        if isinstance(g, tuple):
            continue  # 2-D block fp8 has no row-group clip semantics
        try:
            w = get_by_path(block, lname)
        except (KeyError, IndexError, TypeError):
            continue
        O, I = w.shape
        gg = I if g in (-1, 0) else min(g, I)
        im = imatrix.get(lname)
        weight = (jnp.ones((I,), jnp.float32) if im is None
                  else jnp.maximum(im.astype(jnp.float32), 1e-12))
        fn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym)
        kw = {}
        if scheme.super_bits is not None:
            kw = dict(super_bits=scheme.super_bits,
                      super_group_size=scheme.super_group_size)

        def err_for(r, w=w, fn=fn, gg=gg, weight=weight, kw=kw,
                    scheme=scheme, O=O, I=I):
            ms = jnp.full((O, -(-I // gg)), r, jnp.float32)
            qdq = fn(w, bits=scheme.bits, group_size=scheme.group_size,
                     min_scale=ms, max_scale=ms,
                     clip_lo=0.0, clip_hi=1.0, **kw).qdq
            d = (qdq.astype(jnp.float32) - w.astype(jnp.float32)) ** 2
            d = d * weight[None, :]
            pad = (-I) % gg
            if pad:
                d = jnp.pad(d, ((0, 0), (0, pad)))
            return d.reshape(O, -1, gg).sum(-1)  # (O, groups)

        errs = jax.vmap(err_for)(ratios)
        out[lname] = ratios[jnp.argmin(errs, axis=0)]
    return out
