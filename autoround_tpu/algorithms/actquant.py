"""Activation fake-quant: dynamic and static, per scheme.

Role of the reference's ``WrapperWALayer`` (``auto_round/wrapper.py:563``)
and the act_max calibration hooks (``algorithms/composer.py:221-277``) —
done the TPU way as explicit functions: a ``linear_fn`` interceptor that
qdq's the activation before the matmul, and a stats pass that returns
per-layer act amax instead of mutating module attributes.

Activation grouping semantics (reference ``schemes.py`` act fields):
  * act_group_size 0  → per-tensor
  * act_group_size -1 → per-token (row)
  * act_group_size n  → groups of n along the channel axis (MX/NVFP)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..dtypes import fp8 as fp8_mod
from ..dtypes import mxfp as mxfp_mod
from ..dtypes import nvfp as nvfp_mod
from ..dtypes.ste import round_ste
from ..schemes import QuantizationScheme

__all__ = ["qdq_act", "make_act_quant_linear_fn", "collect_act_stats"]


def _qdq_act_int(x, bits, group_size, sym, static_scale=None):
    """Dynamic (or static per-tensor) int activation qdq."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    if sym:
        qmax = 2.0 ** (bits - 1) - 1
        if static_scale is not None:
            scale = static_scale
        elif group_size == 0:
            scale = jnp.max(jnp.abs(xf)) / qmax
        else:  # per-token
            scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / qmax
        scale = jnp.maximum(scale, 1e-8)
        q = jnp.clip(round_ste(xf / scale), -qmax - 1, qmax)
        return (q * scale).astype(dt)
    qmax = 2.0 ** bits - 1
    if group_size == 0:
        lo, hi = jnp.min(xf), jnp.max(xf)
    else:
        lo = jnp.min(xf, axis=-1, keepdims=True)
        hi = jnp.max(xf, axis=-1, keepdims=True)
    scale = jnp.maximum((hi - lo) / qmax, 1e-8)
    zp = jnp.round(-lo / scale)
    q = jnp.clip(round_ste(xf / scale) + zp, 0, qmax)
    return ((q - zp) * scale).astype(dt)


def qdq_act(x: jax.Array, scheme: QuantizationScheme,
            static_scale: Optional[jax.Array] = None,
            global_scale: Optional[jax.Array] = None) -> jax.Array:
    """qdq an activation tensor according to the scheme's act_* fields.

    x: (..., H).  Channel-group dtypes (MX/NVFP) reshape the trailing axis.
    """
    s = scheme.effective_act()
    if not s.is_act_quantized:
        return x
    adt = s.act_data_type
    if adt.startswith("mx_"):
        shp = x.shape
        x2 = x.reshape(-1, shp[-1])
        name = adt if adt in mxfp_mod.MX_FORMATS else {
            ("mx_fp", 4): "mx_fp4", ("mx_fp", 6): "mx_fp6_e2m3",
            ("mx_fp", 8): "mx_fp8", ("mx_int", 8): "mx_int8",
            ("mx_int", 4): "mx_int4",
        }[(adt, s.act_bits)]
        r = mxfp_mod.qdq_mx(x2, name, group_size=s.act_group_size or 32,
                            rounding="rceil")
        return r.qdq.reshape(shp)
    if adt.startswith("nv_fp"):
        shp = x.shape
        x2 = x.reshape(-1, shp[-1])
        r = nvfp_mod.qdq_nvfp4(x2, group_size=s.act_group_size or 16,
                               global_scale=global_scale)
        return r.qdq.reshape(shp)
    if "fp8" in adt:
        shp = x.shape
        x2 = x.reshape(-1, shp[-1])
        gs = 0 if not s.act_dynamic else (s.act_group_size
                                          if s.act_group_size in (0, -1) else 0)
        r = fp8_mod.qdq_fp8_sym(x2, group_size=gs, scale=static_scale)
        return r.qdq.reshape(shp)
    # int
    return _qdq_act_int(x, s.act_bits, s.act_group_size or 0, bool(s.act_sym),
                        static_scale=static_scale)


def make_act_quant_linear_fn(
    schemes: Dict[str, QuantizationScheme],
    static_scales: Optional[Dict[str, jax.Array]] = None,
    global_scales: Optional[Dict[str, jax.Array]] = None,
) -> Callable:
    """Build a block ``linear_fn`` that act-quantizes quantized layers'
    inputs.  Layers without an act-quantized scheme pass through."""
    act_layers = {n: s for n, s in schemes.items()
                  if s.effective_act().is_act_quantized}

    def linear_fn(name, x, w, b=None):
        if name in act_layers:
            ss = static_scales.get(name) if static_scales else None
            gs = global_scales.get(name) if global_scales else None
            x = qdq_act(x, act_layers[name], static_scale=ss, global_scale=gs)
        y = jnp.einsum("...i,oi->...o", x, w)
        if b is not None:
            y = y + b
        return y

    return linear_fn


# jit caches on callable identity: keyed on (fwd, kind, names) so every
# block of a model reuses ONE compiled stats pass (same fix as the tuning
# loop's _RUN_CACHE — a fresh closure per block would recompile each time,
# ~10-100 s apiece over the remote TPU compiler).
_STATS_CACHE: Dict[Any, Callable] = {}


def _stats_pass(fwd: Callable, kind: str, layer_names) -> Callable:
    names = tuple(sorted(layer_names))
    key = (fwd, kind, names)
    fn = _STATS_CACHE.get(key)
    if fn is not None:
        return fn
    nameset = set(names)

    @jax.jit
    def stats_fn(w, x):
        stats = {}

        def tap(name, xx, ww, b=None):
            if kind == "in_amax" and name in nameset:
                stats[name] = jnp.max(jnp.abs(xx.astype(jnp.float32)))
            if kind == "imatrix" and name in nameset:
                flat = xx.astype(jnp.float32).reshape(-1, xx.shape[-1])
                stats[name] = jnp.mean(flat * flat, axis=0)
            y = jnp.einsum("...i,oi->...o", xx, ww)
            if b is not None:
                y = y + b
            if kind == "out_amax" and name in nameset:
                stats[name] = jnp.max(jnp.abs(y.astype(jnp.float32)))
            return y

        fwd(w, x, tap)
        return stats

    if len(_STATS_CACHE) >= 64:  # fwd closures pin device buffers
        _STATS_CACHE.pop(next(iter(_STATS_CACHE)))
    _STATS_CACHE[key] = stats_fn
    return stats_fn


def collect_act_stats(fwd: Callable, weights: Dict[str, Any],
                      inputs: jax.Array, layer_names) -> Dict[str, jax.Array]:
    """One explicit jitted pass returning per-layer input amax (role of the
    reference's act_max hooks, ``composer.py:221-277``).

    ``fwd(weights, x, linear_fn)`` applies the block with the interceptor.
    Pass a STABLE ``fwd`` (same object per model) to reuse the compile.
    """
    return _stats_pass(fwd, "in_amax", layer_names)(weights, inputs)


def collect_output_stats(fwd: Callable, weights: Dict[str, Any],
                         inputs: jax.Array, layer_names
                         ) -> Dict[str, jax.Array]:
    """Per-layer OUTPUT amax — the q/k/v scale collection of the
    reference's static-attention context (``experimental/attention.py:164``
    hooks q/k/v for FP8 attention scales)."""
    return _stats_pass(fwd, "out_amax", layer_names)(weights, inputs)


def collect_imatrix(fwd: Callable, weights: Dict[str, Any],
                    inputs: jax.Array, layer_names) -> Dict[str, jax.Array]:
    """Per-layer importance matrix: mean of squared inputs per in-channel
    (role of the reference's imatrix hooks, ``rtn/quantizer.py:85-104``)."""
    return _stats_pass(fwd, "imatrix", layer_names)(weights, inputs)


def build_static_act_scales(schemes: Dict[str, QuantizationScheme],
                            act_amax: Dict[str, jax.Array]):
    """Derive static act scales / NVFP global scales from collected amax
    (reference: fp8 static scale = amax/448, NVFP4 global scale formula)."""
    static_scales: Dict[str, jax.Array] = {}
    global_scales: Dict[str, jax.Array] = {}
    for name, scheme in schemes.items():
        s = scheme.effective_act()
        if not s.is_act_quantized or name not in act_amax:
            continue
        amax = jnp.maximum(act_amax[name], 1e-12)
        adt = s.act_data_type
        if adt.startswith("nv_fp"):
            global_scales[name] = (448.0 * 6.0) / amax
        elif "fp8" in adt and not s.act_dynamic:
            static_scales[name] = amax / 448.0
        elif adt.startswith("int") and not s.act_dynamic:
            static_scales[name] = amax / (2.0 ** (s.act_bits - 1) - 1)
    return static_scales, global_scales
