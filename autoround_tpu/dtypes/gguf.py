"""GGUF k-quant (double-quant / super-block) fake-quant simulators.

Role of the reference's ``auto_round/data_type/gguf.py`` (tunable
``int_sym_dq``/``int_asym_dq``, weighted search ``search_gguf_scale_min_*``
/ ``iterative_wls_quant_search``), built from the llama.cpp k-quant format
definition:

A super-block of ``group_size * super_group_size`` elements shares two
fp scales; each sub-group's scale (and min, for asym) is itself quantized
to ``super_bits`` unsigned ints against those:

  asym (Q2_K/Q4_K/Q5_K):  w ≈ d̂_g * q - m̂_g,  q ∈ [0, 2^bits)
      d̂_g = q_d[g] * d_super,   m̂_g = q_m[g] * m_super
  sym  (Q3_K/Q6_K):       w ≈ d̂_g * q,        q ∈ [-2^(b-1), 2^(b-1))
      d̂_g = q_d[g] * d_super with signed super_bits codes

The tunable variants add the AutoRound rounding offset ``v`` (STE) and
min/max clip multipliers applied to the group min/max before scale
derivation.  The RTN variants add a vectorized weighted grid search over
scale shrink ratios (the role of llama.cpp's make_qkx2_quants refinement),
imatrix-weighted when provided.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .grouping import from_groups, to_groups
from .intq import QdqResult
from .ste import round_ste

__all__ = ["qdq_int_dq_sym", "qdq_int_dq_asym", "rtn_int_dq_sym",
           "rtn_int_dq_asym", "DqResult"]

_EPS = 1e-8


class DqResult(NamedTuple):
    """Extended payload for GGUF export: quantized sub-scales and supers."""

    qdq: jax.Array
    d_super: jax.Array       # (n_super, 1) fp
    m_super: Optional[jax.Array]
    q_d: jax.Array           # (n_super, super_group_size) codes
    q_m: Optional[jax.Array]


def _to_super_groups(w, group_size, super_group_size):
    """(O, I) → (n_super, sgs, g).  Requires I % (g*sgs) == 0 (GGUF's
    256-divisibility rule; the layer-config resolver falls back for odd
    shapes like the reference does)."""
    O, I = w.shape
    block = group_size * super_group_size
    assert I % block == 0, (
        f"in_features {I} not divisible by super-block {block}")
    return w.reshape(-1, super_group_size, group_size)


def qdq_int_dq_sym(
    w: jax.Array,
    bits: int,
    group_size: int,
    super_bits: int = 6,
    super_group_size: int = 16,
    v: Optional[jax.Array] = None,
    min_scale: Optional[jax.Array] = None,
    max_scale: Optional[jax.Array] = None,
    clip_lo: float = 0.5,
    clip_hi: float = 1.5,
    frozen_d: Optional[jax.Array] = None,
    **_,
) -> QdqResult:
    """Symmetric double-quant (Q3_K/Q6_K family).

    ``frozen_d`` (alg_ext iter-0 search re-run, reference
    sign_roundv2/quantizer.py:268-281): a pre-searched per-sub-group scale
    grid replaces the minmax derivation; tuning then moves only v (and a
    multiplicative max_scale on the frozen grid)."""
    O, I = w.shape
    f32 = jnp.float32
    wg = _to_super_groups(w.astype(f32), group_size, super_group_size)
    vg = 0.0
    if v is not None:
        vg = _to_super_groups(v.astype(f32), group_size, super_group_size)

    maxq = 2.0 ** (bits - 1)
    if frozen_d is not None:
        d = frozen_d.astype(f32).reshape(wg.shape[0], wg.shape[1], 1)
        if max_scale is not None:
            d = d * jnp.clip(max_scale.reshape(d.shape).astype(f32),
                             clip_lo, clip_hi)
    else:
        # full-range signed extreme per sub-group (same trick as int_sym)
        wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
        wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
        if max_scale is not None:
            ms = jnp.clip(max_scale.reshape(wmax.shape).astype(f32),
                          clip_lo, clip_hi)
            wmax = wmax * ms
            wmin = wmin * ms
        extreme = jnp.where(-wmin > wmax, wmin, wmax)
        d = -extreme / maxq                               # (ns, sgs, 1)

    # quantize sub-scales: signed super_bits codes against d_super
    smaxq = 2.0 ** (super_bits - 1) - 1
    d_super = jnp.max(jnp.abs(d), axis=1, keepdims=True) / smaxq
    d_super = jnp.maximum(d_super, _EPS)
    q_d = round_ste(d / d_super)
    q_d = jnp.clip(q_d, -smaxq - 1, smaxq)
    d_hat = q_d * d_super
    d_hat = jnp.where(jnp.abs(d_hat) < _EPS, _EPS, d_hat)

    q = round_ste(wg / d_hat + vg)
    q = jnp.clip(q, -maxq, maxq - 1)
    qdq = (q * d_hat).reshape(O, I).astype(w.dtype)
    extras = {"d_super": d_super[:, 0, 0], "d_hat": d_hat[..., 0],
              "sym": True, "super_bits": super_bits,
              "super_group_size": super_group_size,
              "group_size": group_size}
    return QdqResult(qdq, d_hat.reshape(O, -1), None, extras)


def qdq_int_dq_asym(
    w: jax.Array,
    bits: int,
    group_size: int,
    super_bits: int = 6,
    super_group_size: int = 8,
    v: Optional[jax.Array] = None,
    min_scale: Optional[jax.Array] = None,
    max_scale: Optional[jax.Array] = None,
    clip_lo: float = 0.5,
    clip_hi: float = 1.5,
    frozen_d: Optional[jax.Array] = None,
    frozen_m: Optional[jax.Array] = None,
    **_,
) -> QdqResult:
    """Asymmetric double-quant (Q2_K/Q4_K/Q5_K family): w ≈ d̂ q - m̂.

    ``frozen_d``/``frozen_m``: pre-searched (scale, min) grid from
    :func:`search_dq_grid` replaces the minmax derivation (alg_ext
    iter-0 re-search; min/max_scale become multipliers on the grid)."""
    O, I = w.shape
    f32 = jnp.float32
    wg = _to_super_groups(w.astype(f32), group_size, super_group_size)
    vg = 0.0
    if v is not None:
        vg = _to_super_groups(v.astype(f32), group_size, super_group_size)

    maxq = 2.0 ** bits - 1
    if frozen_d is not None:
        d = frozen_d.astype(f32).reshape(wg.shape[0], wg.shape[1], 1)
        m = frozen_m.astype(f32).reshape(wg.shape[0], wg.shape[1], 1)
        if max_scale is not None:
            d = d * jnp.clip(max_scale.reshape(d.shape).astype(f32),
                             clip_lo, clip_hi)
        if min_scale is not None:
            m = m * jnp.clip(min_scale.reshape(m.shape).astype(f32),
                             clip_lo, clip_hi)
        d = jnp.maximum(d, _EPS)
    else:
        wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
        wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
        if min_scale is not None:
            wmin = wmin * jnp.clip(min_scale.reshape(wmin.shape).astype(f32),
                                   clip_lo, clip_hi)
        if max_scale is not None:
            wmax = wmax * jnp.clip(max_scale.reshape(wmax.shape).astype(f32),
                                   clip_lo, clip_hi)

        d = jnp.maximum((wmax - wmin) / maxq, _EPS)       # (ns, sgs, 1)
        m = -wmin                                         # ≥ 0

    smaxq = 2.0 ** super_bits - 1
    d_super = jnp.maximum(jnp.max(d, axis=1, keepdims=True) / smaxq, _EPS)
    m_super = jnp.maximum(jnp.max(m, axis=1, keepdims=True) / smaxq, _EPS)
    q_d = jnp.clip(round_ste(d / d_super), 0, smaxq)
    q_m = jnp.clip(round_ste(m / m_super), 0, smaxq)
    d_hat = jnp.maximum(q_d * d_super, _EPS)
    m_hat = q_m * m_super

    q = round_ste((wg + m_hat) / d_hat + vg)
    q = jnp.clip(q, 0, maxq)
    qdq = (q * d_hat - m_hat).reshape(O, I).astype(w.dtype)
    extras = {"d_super": d_super[:, 0, 0], "m_super": m_super[:, 0, 0],
              "d_hat": d_hat[..., 0], "m_hat": m_hat[..., 0],
              "sym": False, "super_bits": super_bits,
              "super_group_size": super_group_size,
              "group_size": group_size}
    # zp equivalent: m̂/d̂ (fp zero point, like gguf float-zp formats)
    return QdqResult(qdq, d_hat.reshape(O, -1),
                     (m_hat / d_hat).reshape(O, -1), extras)


def _weighted_err(wg, dq, weight):
    return jnp.sum(weight * (wg - dq) ** 2, axis=-1)


def search_dq_grid(w, bits, group_size, super_bits, super_group_size,
                   sym: bool, imatrix=None):
    """alg_ext iter-0 dq grid search (reference
    sign_roundv2/quantizer.py:268-281 ``_run_search``): run the weighted
    k-quant scale(/min) search ONCE and freeze the resulting raw grid for
    the whole tuning scan — the tuner then moves v (and multiplicative
    min/max scales) against a stationary grid instead of re-deriving
    scales from the shifting minmax each step.

    Returns {"frozen_d": (ns, sgs)} (+ "frozen_m" when asym) for the
    ``extras`` channel of make_qdq_weights."""
    f32 = jnp.float32
    O, I = w.shape
    wg = _to_super_groups(w.astype(f32), group_size, super_group_size)
    if imatrix is None:
        weight = jnp.ones_like(wg)
    else:
        im = jnp.broadcast_to(imatrix.astype(f32).reshape(1, -1), (O, I))
        weight = _to_super_groups(im, group_size, super_group_size)

    if sym:
        maxq = 2.0 ** (bits - 1)
        wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
        wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
        extreme = jnp.where(-wmin > wmax, wmin, wmax)
        base_d = -extreme / maxq
        base_d = jnp.where(jnp.abs(base_d) < _EPS, _EPS, base_d)
        ratios = 1.0 - 0.01 * jnp.arange(20, dtype=f32)

        def err_for(r):
            d = base_d * r
            q = jnp.clip(jnp.round(wg / d), -maxq, maxq - 1)
            return _weighted_err(wg, q * d, weight)

        errs = jax.vmap(err_for)(ratios)
        d = base_d * ratios[jnp.argmin(errs, axis=0)][..., None]
        return {"frozen_d": d[..., 0]}

    maxq = 2.0 ** bits - 1
    wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
    base_d = jnp.maximum((wmax - wmin) / maxq, _EPS)
    ratios = 1.0 - 0.0125 * jnp.arange(16, dtype=f32)

    def err_for(r):
        d = base_d * r
        q = jnp.clip(jnp.round((wg - wmin) / d), 0, maxq)
        sw = jnp.sum(weight, -1)
        sx = jnp.sum(weight * q, -1)
        sxx = jnp.sum(weight * q * q, -1)
        sy = jnp.sum(weight * wg, -1)
        sxy = jnp.sum(weight * q * wg, -1)
        det = sw * sxx - sx * sx
        d_fit = jnp.where(jnp.abs(det) > _EPS,
                          (sw * sxy - sx * sy) / jnp.maximum(det, _EPS),
                          d[..., 0])
        m_fit = jnp.where(jnp.abs(det) > _EPS,
                          (sxx * sy - sx * sxy) / jnp.maximum(det, _EPS),
                          wmin[..., 0])
        d_fit = jnp.maximum(d_fit, _EPS)[..., None]
        m_fit = jnp.minimum(m_fit, 0.0)[..., None]
        return _weighted_err(wg, q * d_fit + m_fit, weight), d_fit, m_fit

    errs, ds, ms = jax.vmap(err_for)(ratios)
    best = jnp.argmin(errs, axis=0)
    take = lambda arr: jnp.take_along_axis(
        arr, best[None, ..., None], axis=0)[0]
    return {"frozen_d": take(ds)[..., 0], "frozen_m": -take(ms)[..., 0]}


def rtn_int_dq_sym(w, bits, group_size, super_bits=6, super_group_size=16,
                   imatrix=None, num_steps: int = 20, step: float = 0.01, **_):
    """Zero-shot sym k-quant with weighted scale-shrink search (role of
    llama.cpp make_qx_quants refinement / reference ``search_gguf_scale_*``)."""
    O, I = w.shape
    f32 = jnp.float32
    wg = _to_super_groups(w.astype(f32), group_size, super_group_size)
    maxq = 2.0 ** (bits - 1)

    if imatrix is None:
        weight = jnp.ones_like(wg)
    else:
        im = jnp.broadcast_to(imatrix.astype(f32).reshape(1, -1), (O, I))
        weight = _to_super_groups(im, group_size, super_group_size)

    wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
    extreme = jnp.where(-wmin > wmax, wmin, wmax)
    base_d = -extreme / maxq
    base_d = jnp.where(jnp.abs(base_d) < _EPS, _EPS, base_d)

    ratios = 1.0 - step * jnp.arange(num_steps, dtype=f32)

    def err_for(r):
        d = base_d * r
        q = jnp.clip(jnp.round(wg / d), -maxq, maxq - 1)
        return _weighted_err(wg, q * d, weight)  # (ns, sgs)

    errs = jax.vmap(err_for)(ratios)
    best = jnp.argmin(errs, axis=0)
    d = base_d * ratios[best][..., None]

    # double-quant the searched scales, then final qdq
    smaxq = 2.0 ** (super_bits - 1) - 1
    d_super = jnp.maximum(jnp.max(jnp.abs(d), axis=1, keepdims=True) / smaxq,
                          _EPS)
    q_d = jnp.clip(jnp.round(d / d_super), -smaxq - 1, smaxq)
    d_hat = q_d * d_super
    d_hat = jnp.where(jnp.abs(d_hat) < _EPS, _EPS, d_hat)
    q = jnp.clip(jnp.round(wg / d_hat), -maxq, maxq - 1)
    qdq = (q * d_hat).reshape(O, I).astype(w.dtype)
    extras = {"d_super": d_super[:, 0, 0], "d_hat": d_hat[..., 0],
              "sym": True, "super_bits": super_bits,
              "super_group_size": super_group_size,
              "group_size": group_size}
    return QdqResult(qdq, d_hat.reshape(O, -1), None, extras)


def rtn_int_dq_asym(w, bits, group_size, super_bits=6, super_group_size=8,
                    imatrix=None, num_steps: int = 16, **_):
    """Zero-shot asym k-quant with a joint (scale, min) candidate search —
    vectorized stand-in for llama.cpp's make_qkx2_quants iteration."""
    O, I = w.shape
    f32 = jnp.float32
    wg = _to_super_groups(w.astype(f32), group_size, super_group_size)
    maxq = 2.0 ** bits - 1

    if imatrix is None:
        weight = jnp.ones_like(wg)
    else:
        im = jnp.broadcast_to(imatrix.astype(f32).reshape(1, -1), (O, I))
        weight = _to_super_groups(im, group_size, super_group_size)

    wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
    base_d = jnp.maximum((wmax - wmin) / maxq, _EPS)

    ratios = 1.0 - 0.0125 * jnp.arange(num_steps, dtype=f32)

    def err_for(r):
        d = base_d * r
        q = jnp.clip(jnp.round((wg - wmin) / d), 0, maxq)
        # weighted LS refit of (d, m) given codes q — one WLS step of the
        # iterative search
        sw = jnp.sum(weight, -1)
        sx = jnp.sum(weight * q, -1)
        sxx = jnp.sum(weight * q * q, -1)
        sy = jnp.sum(weight * wg, -1)
        sxy = jnp.sum(weight * q * wg, -1)
        det = sw * sxx - sx * sx
        d_fit = jnp.where(jnp.abs(det) > _EPS,
                          (sw * sxy - sx * sy) / jnp.maximum(det, _EPS),
                          d[..., 0])
        m_fit = jnp.where(jnp.abs(det) > _EPS,
                          (sxx * sy - sx * sxy) / jnp.maximum(det, _EPS),
                          wmin[..., 0])
        d_fit = jnp.maximum(d_fit, _EPS)[..., None]
        m_fit = jnp.minimum(m_fit, 0.0)[..., None]
        dq = q * d_fit + m_fit
        return _weighted_err(wg, dq, weight), d_fit, m_fit

    errs, ds, ms = jax.vmap(err_for)(ratios)
    best = jnp.argmin(errs, axis=0)                      # (ns, sgs)
    take = lambda arr: jnp.take_along_axis(
        arr, best[None, ..., None], axis=0)[0]
    d = take(ds)
    m = -take(ms)                                        # store positive min

    smaxq = 2.0 ** super_bits - 1
    d_super = jnp.maximum(jnp.max(d, axis=1, keepdims=True) / smaxq, _EPS)
    m_super = jnp.maximum(jnp.max(m, axis=1, keepdims=True) / smaxq, _EPS)
    d_hat = jnp.maximum(jnp.clip(jnp.round(d / d_super), 0, smaxq) * d_super,
                        _EPS)
    m_hat = jnp.clip(jnp.round(m / m_super), 0, smaxq) * m_super
    q = jnp.clip(jnp.round((wg + m_hat) / d_hat), 0, maxq)
    qdq = (q * d_hat - m_hat).reshape(O, I).astype(w.dtype)
    extras = {"d_super": d_super[:, 0, 0], "m_super": m_super[:, 0, 0],
              "d_hat": d_hat[..., 0], "m_hat": m_hat[..., 0],
              "sym": False, "super_bits": super_bits,
              "super_group_size": super_group_size,
              "group_size": group_size}
    return QdqResult(qdq, d_hat.reshape(O, -1),
                     (m_hat / d_hat).reshape(O, -1), extras)
