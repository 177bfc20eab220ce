"""NVFP4 fake-quant: FP4-E2M1 elements, FP8-E4M3 group scales (g=16),
FP32 global scale.

Role of the reference's ``auto_round/data_type/nvfp.py`` (``cast_to_fp4``
``:26-39``, ``calculate_gparam`` ``:56``, ``ref_nvfp4_quant`` ``:67-80``,
static-global-scale act variant ``:101``), implemented from the NVFP4
format definition: a tensor-level FP32 scale positions the per-group
amax/6 values inside E4M3 range; each group of 16 then carries an E4M3
scale; elements are E2M1 (max 6.0).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .grouping import from_groups, to_groups
from .intq import QdqResult
from .mxfp import MX_FORMATS, quant_fp_elements
from .ste import cast_ste

__all__ = ["nvfp4_global_scale", "qdq_nvfp4", "rtn_nvfp4",
           "cast_ue5m3", "qdq_fp4_v2", "ue5m3_global_scale"]

_FP4 = MX_FORMATS["mx_fp4"]
_E4M3_MAX = 448.0
_UE5M3_MAX = 114688.0  # (1 + 6/8) * 2^16


def nvfp4_global_scale(w: jax.Array) -> jax.Array:
    """Per-tensor FP32 global scale: maps the largest group scale
    (tensor_amax / 6) onto the top of E4M3 range."""
    amax = jnp.max(jnp.abs(w)).astype(jnp.float32)
    return (_E4M3_MAX * _FP4.max_norm) / jnp.maximum(amax, 1e-30)


def qdq_nvfp4(
    w: jax.Array,
    group_size: int = 16,
    v: Optional[jax.Array] = None,
    max_scale: Optional[jax.Array] = None,
    global_scale: Optional[jax.Array] = None,
    **_,
) -> QdqResult:
    """NVFP4 qdq.  ``global_scale`` may be precomputed (static activation
    quant / MoE amax alignment); otherwise derived from this tensor."""
    O, I = w.shape
    compute_dtype = jnp.float32
    wg, pad = to_groups(w.astype(compute_dtype), group_size)
    vg = None
    if v is not None:
        vg, _ = to_groups(v.astype(compute_dtype), group_size)

    if global_scale is None:
        global_scale = nvfp4_global_scale(w)

    amax = jnp.max(jnp.abs(wg), axis=-1, keepdims=True)
    if max_scale is not None:
        amax = amax * jnp.clip(max_scale.reshape(-1, 1).astype(compute_dtype), 0.0, 1.0)

    # group decode scale, stored as E4M3: s = fp8(amax/6 * gs) / gs
    s_enc = cast_ste((amax / _FP4.max_norm) * global_scale, jnp.float8_e4m3fn)
    s = jnp.maximum(s_enc, 1e-30) / global_scale

    q = quant_fp_elements(wg / s, _FP4, vg)
    qdq = q * s

    qdq = from_groups(qdq, (O, I), pad).astype(w.dtype)
    return QdqResult(qdq, s.reshape(O, -1), None)


def rtn_nvfp4(w, group_size=16, **kw):
    return qdq_nvfp4(w, group_size=group_size, **kw)


# ---- fp4_v2: E2M1 elements with UNSIGNED E5M3 group scales --------------
# Reference ``data_type/nvfp.py:124-236`` (``float_to_e5m3_frexp`` /
# ``ref_fp4_quant`` / ``fp4_v2[_with_global_scale]``): UE5M3 is an
# unsigned 8-bit float — 5 exponent bits (bias 15, min normal 2^-14),
# 3 mantissa bits, max (1+6/8)*2^16 = 114688 — giving group scales far
# more dynamic range than E4M3 at the same width.


def cast_ue5m3(x: jax.Array) -> jax.Array:
    """Round positive values onto the UE5M3 grid (vectorized jnp.where
    dataflow instead of the reference's boolean-mask scatter)."""
    xf = jnp.maximum(x.astype(jnp.float32), 0.0)
    m, e = jnp.frexp(xf)  # x = m * 2^e, m in [0.5, 1)
    m3 = jnp.clip(jnp.round((m - 0.5) * 16.0), 0.0, 7.0)
    # ldexp, not exp2: XLA lowers exp2 via exp(x*ln2), which misses exact
    # powers of two by an ulp and pushes encodes off the UE5M3 grid
    normal = jnp.ldexp(1.0 + m3 / 8.0, e - 1)
    msub = jnp.clip(jnp.round(xf * (8.0 * 2.0 ** 14)), 1.0, 7.0)
    subnormal = (msub / 8.0) * 2.0 ** -14
    out = jnp.where(xf >= 2.0 ** -14, normal,
                    jnp.where(xf > 0.0, subnormal, 0.0))
    return out.astype(x.dtype)


def cast_ue5m3_ste(x: jax.Array) -> jax.Array:
    return x + jax.lax.stop_gradient(cast_ue5m3(x) - x)


def ue5m3_global_scale(w: jax.Array) -> jax.Array:
    """fp4_v2_with_global_scale: position amax/6 at the top of UE5M3.
    Reciprocal-multiply (not divide) to match the reference's ulp
    behavior at rounding ties."""
    amax = jnp.max(jnp.abs(w)).astype(jnp.float32)
    return _UE5M3_MAX * _FP4.max_norm * (1.0 / jnp.maximum(amax, 1e-30))


def qdq_fp4_v2(
    w: jax.Array,
    group_size: int = 32,
    v: Optional[jax.Array] = None,
    max_scale: Optional[jax.Array] = None,
    global_scale: Optional[jax.Array] = None,
    use_global_scale: bool = False,
    **_,
) -> QdqResult:
    """fp4_v2 qdq: per-group amax/6 scales cast to UE5M3 (optionally
    positioned by a tensor-level global scale), E2M1 elements."""
    assert group_size in (16, 32), group_size
    O, I = w.shape
    wg, pad = to_groups(w.astype(jnp.float32), group_size)
    vg = None
    if v is not None:
        vg, _ = to_groups(v.astype(jnp.float32), group_size)

    if global_scale is None:
        global_scale = (ue5m3_global_scale(w) if use_global_scale
                        else jnp.float32(1.0))

    amax = jnp.max(jnp.abs(wg), axis=-1, keepdims=True)
    if max_scale is not None:
        amax = amax * jnp.clip(
            max_scale.reshape(-1, 1).astype(jnp.float32), 0.0, 1.0)

    s_enc = cast_ue5m3_ste(jnp.clip(
        global_scale * (amax * jnp.float32(1.0 / _FP4.max_norm)),
        0.0, _UE5M3_MAX))
    s = jnp.maximum(s_enc, 1e-30) * (1.0 / global_scale)

    q = quant_fp_elements(wg / s, _FP4, vg)
    qdq = q * s

    qdq = from_groups(qdq, (O, I), pad).astype(w.dtype)
    return QdqResult(qdq, s.reshape(O, -1), None)
