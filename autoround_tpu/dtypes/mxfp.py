"""Microscaling (OCP MX) fake-quant simulators: MXFP4/6/8 and MXINT4/8.

Role of the reference's ``auto_round/data_type/mxfp.py`` (format cache at
``mxfp.py:26-43``, shared-pow2-exponent qdq at ``mxfp.py:233-291``, rceil
variants at ``:294,358``), implemented from the OCP Microscaling spec:
groups of 32 share one power-of-two (E8M0) scale; elements are narrow FP
(e2m1 / e2m3 / e3m2 / e4m3 / e5m2) or fixed-point INT.

The shared exponent uses ``floor(log2(max_abs)) - emax`` with an STE floor
so minmax-tuning gradients flow; the ``rceil`` variant divides the group
max by ``max_norm`` and ceils, and ``rceil_7_25`` uses a 7.25 divisor for
FP4 (MXAttention trick, reference ``mxfp.py:358``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .grouping import from_groups, to_groups
from .intq import QdqResult
from .ste import ceil_ste, floor_ste, round_ste

__all__ = ["MX_FORMATS", "MxFormat", "quant_fp_elements", "qdq_mx",
           "rtn_mx", "qdq_mx_rceil"]


class MxFormat(NamedTuple):
    ebits: int      # exponent bits of the element format (0 → fixed-point int)
    mbits: int      # mantissa (fraction) bits
    emax: int       # max unbiased exponent of the element format
    max_norm: float # largest representable magnitude


# Element formats per the OCP MX spec v1.0.
MX_FORMATS = {
    "mx_fp4": MxFormat(2, 1, 2, 6.0),
    "mx_fp6_e2m3": MxFormat(2, 3, 2, 7.5),
    "mx_fp6_e3m2": MxFormat(3, 2, 4, 28.0),
    "mx_fp8": MxFormat(4, 3, 8, 448.0),          # e4m3 default
    "mx_fp8_e4m3": MxFormat(4, 3, 8, 448.0),
    "mx_fp8_e5m2": MxFormat(5, 2, 15, 57344.0),
    # INT elements: two's complement, (bits-2) fraction bits → max (2^(b-1)-1)/2^(b-2)
    "mx_int2": MxFormat(0, 0, 0, 1.0 / 1.0),
    "mx_int4": MxFormat(0, 2, 0, 7.0 / 4.0),
    "mx_int8": MxFormat(0, 6, 0, 127.0 / 64.0),
}

_E8M0_MIN = -127.0
_E8M0_MAX = 127.0


def quant_fp_elements(x: jax.Array, fmt: MxFormat,
                      v: Optional[jax.Array] = None,
                      rand: Optional[jax.Array] = None) -> jax.Array:
    """Quantize (already scale-divided) values to the narrow element format.

    FP formats: per-element private exponent with subnormal support, RTNE
    mantissa rounding (STE) with optional additive rounding offset ``v``.
    INT formats: fixed-point with ``mbits`` fraction bits.

    ``rand`` (uniform [0,1) per element) switches the mantissa round to
    stochastic rounding — ``floor(y + u)`` is unbiased in expectation
    (role of the reference's stochastic element rounding, mxfp.py:49-85).
    """
    vv = 0.0 if v is None else v

    def _round(y):
        if rand is not None:
            return floor_ste(y + rand)
        return round_ste(y + vv)

    if fmt.ebits == 0:
        step = 2.0 ** (-fmt.mbits)
        q = _round(x / step) * step
        return jnp.clip(q, -fmt.max_norm, fmt.max_norm)
    if (fmt.ebits, fmt.mbits) == (2, 1):
        # E2M1 fast path: the grid {0,±.5,±1,±1.5,±2,±3,±4,±6} is three
        # uniform regions — a branchless select instead of log2/exp2,
        # which compiles and differentiates far cheaper (MX act-quant
        # tuning scans went from pathological to ordinary compile times)
        ax = jnp.abs(x)
        lo = _round(2.0 * x) * 0.5            # |x| < 2, step .5
        mid = _round(x)                       # 2 <= |x| < 4, step 1
        hi = _round(0.5 * x) * 2.0            # |x| >= 4, step 2
        q = jnp.where(ax < 2.0, lo, jnp.where(ax < 4.0, mid, hi))
        return jnp.clip(q, -fmt.max_norm, fmt.max_norm)
    # min normal exponent of a format with bias 2^(ebits-1)-1 and no inf/nan
    # reserved (e2m1-style): emin = 2 - 2^(ebits-1) ... for e2m1 this is 0.
    emin = -(2 ** (fmt.ebits - 1) - 2)
    ax = jnp.abs(x)
    private_exp = jnp.floor(jnp.log2(jnp.maximum(ax, 1e-30)))
    private_exp = jnp.maximum(private_exp, float(emin))
    lsb = jnp.exp2(private_exp - fmt.mbits)
    q = _round(x / lsb) * lsb
    return jnp.clip(q, -fmt.max_norm, fmt.max_norm)


def qdq_mx(
    w: jax.Array,
    data_type: str = "mx_fp4",
    group_size: int = 32,
    v: Optional[jax.Array] = None,
    max_scale: Optional[jax.Array] = None,
    rounding: str = "floor",
    divisor: Optional[float] = None,
    stochastic_key: Optional[jax.Array] = None,
    **_,
) -> QdqResult:
    """Shared-exponent MX qdq.

    rounding: 'floor'      → shared_exp = floor(log2(amax)) - emax (spec default)
              'rceil'      → shared_exp = ceil(log2(amax / max_norm))
              'rceil_7_25' → like rceil but divide by 7.25 (FP4 only)
    ``max_scale`` (per group, tunable) multiplies the group amax before the
    exponent is taken — this is how minmax tuning reaches the shared scale.
    ``stochastic_key`` (a PRNG key) switches mantissa rounding to unbiased
    stochastic rounding (reference mxfp.py:49-85).
    """
    fmt = MX_FORMATS[data_type]
    O, I = w.shape
    compute_dtype = jnp.promote_types(w.dtype, jnp.float32)
    wg, pad = to_groups(w.astype(compute_dtype), group_size)
    vg = None
    if v is not None:
        vg, _ = to_groups(v.astype(compute_dtype), group_size)

    amax = jnp.max(jnp.abs(wg), axis=-1, keepdims=True)
    if max_scale is not None:
        amax = amax * jnp.clip(max_scale.reshape(-1, 1).astype(compute_dtype), 0.0, 1.0)
    amax = jnp.maximum(amax, 1e-30)

    if rounding == "floor":
        shared_exp = floor_ste(jnp.log2(amax)) - fmt.emax
    elif rounding == "rceil":
        d = divisor if divisor is not None else fmt.max_norm
        shared_exp = ceil_ste(jnp.log2(amax / d))
    elif rounding == "rceil_7_25":
        shared_exp = ceil_ste(jnp.log2(amax / 7.25))
    else:
        raise ValueError(f"unknown mx rounding {rounding!r}")
    shared_exp = jnp.clip(shared_exp, _E8M0_MIN, _E8M0_MAX)
    scale = jnp.exp2(shared_exp)

    rand = (jax.random.uniform(stochastic_key, wg.shape, compute_dtype)
            if stochastic_key is not None else None)
    q = quant_fp_elements(wg / scale, fmt, vg, rand=rand)
    qdq = q * scale

    qdq = from_groups(qdq, (O, I), pad).astype(w.dtype)
    return QdqResult(qdq, scale.reshape(O, -1), None)


def rtn_mx(w, data_type="mx_fp4", group_size=32, rounding="rceil", **kw):
    """Zero-shot MX RTN (reference default uses the rceil variant for FP4)."""
    return qdq_mx(w, data_type=data_type, group_size=group_size,
                  rounding=rounding, **kw)


def qdq_mx_rceil(w, data_type="mx_fp4", group_size=32, **kw):
    return qdq_mx(w, data_type=data_type, group_size=group_size,
                  rounding="rceil", **kw)


def opt_rtn_mx(w, data_type="mx_fp4", group_size=32,
               imatrix: Optional[jax.Array] = None, **_):
    """Exponent-offset search per group (role of the reference's
    ``quant_mx_opt_rtn``, ``mxfp.py:102-230``: candidate amax multipliers
    spanning a shared-exponent offset in [0.5, 2.0], weighted err pick)."""
    fmt = MX_FORMATS[data_type]
    O, I = w.shape
    f32 = jnp.float32
    wg, pad = to_groups(w.astype(f32), group_size)

    if imatrix is None:
        weight = jnp.ones_like(wg)
    else:
        im = jnp.broadcast_to(imatrix.astype(f32).reshape(1, -1), (O, I))
        weight, _ = to_groups(im, group_size)

    amax = jnp.maximum(jnp.max(jnp.abs(wg), axis=-1, keepdims=True), 1e-30)
    base_exp = jnp.floor(jnp.log2(amax)) - fmt.emax
    cands = jnp.asarray([-1.0, 0.0, 1.0], f32)  # exponent offsets 0.5x..2x

    def err_for(off):
        scale = jnp.exp2(jnp.clip(base_exp + off, _E8M0_MIN, _E8M0_MAX))
        q = quant_fp_elements(wg / scale, fmt) * scale
        return jnp.sum(weight * (wg - q) ** 2, axis=-1)

    errs = jax.vmap(err_for)(cands)
    best = cands[jnp.argmin(errs, axis=0)][:, None]
    scale = jnp.exp2(jnp.clip(base_exp + best, _E8M0_MIN, _E8M0_MAX))
    qdq = quant_fp_elements(wg / scale, fmt) * scale
    qdq = from_groups(qdq, (O, I), pad).astype(w.dtype)
    return QdqResult(qdq, scale.reshape(O, -1), None)
