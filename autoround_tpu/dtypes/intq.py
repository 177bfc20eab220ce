"""Integer fake-quant simulators (sym / asym, group-wise) in pure JAX.

Role of the reference's ``auto_round/data_type/int.py``: given a weight
``w (O, I)``, optional tunable rounding offsets ``v`` (same shape as ``w``)
and per-group clip multipliers ``min_scale``/``max_scale``, produce the
quantize-dequantize (qdq) weight plus the scale/zero-point needed for
export.  Everything is a pure function of arrays + static config, so it
jits and differentiates (STE through the round) cleanly on TPU.

Symmetric quantization uses the *full-range* trick (credited by the
reference to llama.cpp, ``int.py:228-231``): the signed extreme of each
group is mapped onto the wider endpoint ``-2^(b-1)`` of the signed range,
flipping the scale sign when the positive side dominates, so no integer
code is wasted.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import functools

import jax
import jax.numpy as jnp

from .grouping import from_groups, to_groups
from .ste import round_ste

__all__ = ["QdqResult", "qdq_int_sym", "qdq_int_asym", "rtn_int_sym",
           "rtn_int_asym", "opt_rtn_int_sym", "qdq_asym_wo_round"]

_EPS = 1e-8


class QdqResult(NamedTuple):
    """qdq weight (original shape) + per-group scale/zp in row layout.

    scale/zp have shape ``(O, n_groups_per_row)``; zp is None for dtypes
    without a zero point.  ``extras`` carries format-specific export
    payloads (GGUF double-quant: d_super/m_super/d_hat/m_hat in
    super-block layout) so export can pack TUNED scales verbatim instead
    of re-deriving them (reference ``export_to_gguf/packing.py:788``
    explicit-scale packer inputs).
    """

    qdq: jax.Array
    scale: jax.Array
    zp: Optional[jax.Array]
    extras: Optional[dict] = None


def _clip_params(g_shape, min_scale, max_scale, clip_lo, clip_hi, dtype):
    """Broadcast + clamp the tunable clip multipliers to per-group column vectors."""
    one = jnp.ones((g_shape[0], 1), dtype)
    if min_scale is None:
        mn = one
    else:
        mn = jnp.clip(min_scale.reshape(-1, 1).astype(dtype), clip_lo, clip_hi)
    if max_scale is None:
        mx = one
    else:
        mx = jnp.clip(max_scale.reshape(-1, 1).astype(dtype), clip_lo, clip_hi)
    return mn, mx


def qdq_asym_wo_round(w: jax.Array, v, bits: int = 4,
                      q_scale_thresh: float = 1e-5) -> jax.Array:
    """Round-FREE asym qdq for norm-weight / bias tuning.

    Role of the reference's ``quant_tensor_asym_wo_round``
    (``data_type/int.py:368-424``, consumed by WrapperLayerNorm /
    WrapperLlamaNorm and the linear ``bias_v`` path,
    ``wrapper.py:318-335,636-746``): the tensor is mapped onto the asym
    int grid with a continuous perturbation ``v`` in grid units and NO
    rounding — a bounded, scale-aware delta that SignSGD can tune with
    useful gradients.  Group size is the whole last dim (reference
    group_size=-1 on 1-D norm/bias tensors)."""
    maxq = 2.0 ** bits - 1
    f = w.astype(jnp.float32)
    wmin = jnp.minimum(jnp.min(f, axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(jnp.max(f, axis=-1, keepdims=True), 0.0)
    scale = jnp.maximum((wmax - wmin) / maxq, q_scale_thresh)
    zp = -wmin / scale  # float zp, not rounded (reference keeps it float)
    q = jnp.clip(f / scale + v + zp, 0.0, maxq)
    return (scale * (q - zp)).astype(w.dtype)


def _group_v(v, w_shape, group_size):
    if v is None:
        return 0.0
    vg, _ = to_groups(v, group_size)
    return vg


def qdq_int_sym(
    w: jax.Array,
    bits: int,
    group_size: int,
    v: Optional[jax.Array] = None,
    min_scale: Optional[jax.Array] = None,
    max_scale: Optional[jax.Array] = None,
    clip_lo: float = 0.0,
    clip_hi: float = 1.0,
) -> QdqResult:
    """Full-range symmetric int qdq (reference ``int.py`` ``quant_tensor_sym``).

    q = clamp(round(w/s + v) + 2^(b-1), 0, 2^b - 1);  dq = (q - 2^(b-1)) * s
    where s carries the sign of the dominant group extreme.
    """
    O, I = w.shape
    compute_dtype = jnp.promote_types(w.dtype, jnp.float32)
    wg, pad = to_groups(w.astype(compute_dtype), group_size)
    vg = _group_v(None if v is None else v.astype(compute_dtype), w.shape, group_size)

    maxq = 2 ** (bits - 1)
    wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
    mn, mx = _clip_params(wg.shape, min_scale, max_scale, clip_lo, clip_hi,
                          compute_dtype)
    wmin = wmin * mn
    wmax = wmax * mx
    # Signed dominant extreme → scale sign flip for full-range utilization:
    # the extreme always lands on the wider endpoint -2^(b-1).
    extreme = jnp.where(-wmin > wmax, wmin, wmax)
    scale = -extreme / maxq  # > 0 iff the negative side dominates
    scale = jnp.where(jnp.abs(scale) < _EPS, _EPS, scale)

    q = round_ste(wg / scale + vg)
    q = jnp.clip(q + maxq, 0, 2 ** bits - 1)
    qdq = (q - maxq) * scale

    qdq = from_groups(qdq, (O, I), pad).astype(w.dtype)
    scale_rows = scale.reshape(O, -1)
    return QdqResult(qdq, scale_rows, None)


def qdq_int_asym(
    w: jax.Array,
    bits: int,
    group_size: int,
    v: Optional[jax.Array] = None,
    min_scale: Optional[jax.Array] = None,
    max_scale: Optional[jax.Array] = None,
    clip_lo: float = 0.0,
    clip_hi: float = 1.0,
) -> QdqResult:
    """Asymmetric int qdq with rounded zero point (reference ``int.py``
    ``quant_tensor_asym``): s = (wmax-wmin)/(2^b-1), zp = round(-wmin/s)."""
    O, I = w.shape
    compute_dtype = jnp.promote_types(w.dtype, jnp.float32)
    wg, pad = to_groups(w.astype(compute_dtype), group_size)
    vg = _group_v(None if v is None else v.astype(compute_dtype), w.shape, group_size)

    maxq = 2 ** bits - 1
    wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
    mn, mx = _clip_params(wg.shape, min_scale, max_scale, clip_lo, clip_hi,
                          compute_dtype)
    wmin = wmin * mn
    wmax = wmax * mx

    scale = jnp.maximum((wmax - wmin) / maxq, _EPS)
    zp = round_ste(-wmin / scale)  # STE so clip grads flow to min_scale
    q = round_ste(wg / scale + vg)
    q = jnp.clip(q + zp, 0, maxq)
    qdq = (q - zp) * scale

    qdq = from_groups(qdq, (O, I), pad).astype(w.dtype)
    return QdqResult(qdq, scale.reshape(O, -1), zp.reshape(O, -1))


def rtn_int_sym(w, bits, group_size, **_):
    """Zero-shot round-to-nearest (no tuned params)."""
    return qdq_int_sym(w, bits, group_size)


def rtn_int_asym(w, bits, group_size, **_):
    return qdq_int_asym(w, bits, group_size)


@functools.partial(jax.jit,
                   static_argnames=("bits", "group_size", "num_steps",
                                    "step"))
def search_init_scale_ratio(
    w: jax.Array,
    bits: int,
    group_size: int,
    num_steps: Optional[int] = None,
    step: float = 0.01,
    imatrix: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-group best scale-shrink ratio (O, groups_per_row) — the alg_ext
    searched init for ``max_scale`` (role of the reference's
    SignRoundOptimizedWrapperLinear seeded init,
    ``sign_roundv2/quantizer.py:101`` + dispatch ``data_type/utils.py:178``).
    """
    O, I = w.shape
    compute_dtype = jnp.promote_types(w.dtype, jnp.float32)
    wg, _ = to_groups(w.astype(compute_dtype), group_size)
    if num_steps is None:
        num_steps = 90 if bits <= 2 else 30
    maxq = 2 ** (bits - 1)

    wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
    extreme = jnp.where(-wmin > wmax, wmin, wmax)
    base_scale = -extreme / maxq
    base_scale = jnp.where(jnp.abs(base_scale) < _EPS, _EPS, base_scale)

    if imatrix is None:
        weight = jnp.ones_like(wg)
    else:
        im = jnp.broadcast_to(
            imatrix.astype(compute_dtype).reshape(1, -1), (O, I))
        weight, _ = to_groups(im, group_size)

    ratios = 1.0 - step * jnp.arange(num_steps, dtype=compute_dtype)

    def err_for(ratio):
        s = base_scale * ratio
        q = jnp.clip(jnp.round(wg / s) + maxq, 0, 2 ** bits - 1)
        dq = (q - maxq) * s
        return jnp.sum(weight * (wg - dq) ** 2, axis=-1)

    errs = jax.vmap(err_for)(ratios)
    best = ratios[jnp.argmin(errs, axis=0)]
    return best.reshape(O, -1)


def opt_rtn_int_sym(
    w: jax.Array,
    bits: int,
    group_size: int,
    imatrix: Optional[jax.Array] = None,
    num_steps: Optional[int] = None,
    step: float = 0.01,
    **_,
) -> QdqResult:
    """Optimized RTN: grid search over scale shrink ratios, weighted by an
    importance matrix (mean of squared input activations per in-channel).

    Role of the reference's ``opt_rtn_int_sym`` / ``search_scales``
    (``data_type/int.py:24-86``; W2 uses 90 x 0.01 shrink steps).  The whole
    grid is evaluated as one vectorized pass over a static candidate axis —
    on TPU this is a single fused VPU sweep, no Python loop.
    """
    O, I = w.shape
    compute_dtype = jnp.promote_types(w.dtype, jnp.float32)
    wg, pad = to_groups(w.astype(compute_dtype), group_size)
    if num_steps is None:
        num_steps = 90 if bits <= 2 else 30
    maxq = 2 ** (bits - 1)

    wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
    extreme = jnp.where(-wmin > wmax, wmin, wmax)
    base_scale = -extreme / maxq
    base_scale = jnp.where(jnp.abs(base_scale) < _EPS, _EPS, base_scale)

    if imatrix is None:
        weight = jnp.ones_like(wg)
    else:
        # imatrix is per-input-channel (I,); tile to grouped layout
        im = imatrix.astype(compute_dtype).reshape(1, -1)
        im = jnp.broadcast_to(im, (O, I))
        img, _ = to_groups(im, group_size)
        weight = img

    ratios = 1.0 - step * jnp.arange(num_steps, dtype=compute_dtype)

    def err_for(ratio):
        s = base_scale * ratio
        q = jnp.clip(jnp.round(wg / s) + maxq, 0, 2 ** bits - 1)
        dq = (q - maxq) * s
        return jnp.sum(weight * (wg - dq) ** 2, axis=-1)  # (n_groups,)

    errs = jax.vmap(err_for)(ratios)  # (num_steps, n_groups)
    best = jnp.argmin(errs, axis=0)  # (n_groups,)
    best_ratio = ratios[best][:, None]
    scale = base_scale * best_ratio

    q = jnp.clip(jnp.round(wg / scale) + maxq, 0, 2 ** bits - 1)
    qdq = (q - maxq) * scale
    qdq = from_groups(qdq, (O, I), pad).astype(w.dtype)
    return QdqResult(qdq, scale.reshape(O, -1), None)
