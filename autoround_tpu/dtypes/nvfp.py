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

__all__ = ["nvfp4_global_scale", "qdq_nvfp4", "rtn_nvfp4"]

_FP4 = MX_FORMATS["mx_fp4"]
_E4M3_MAX = 448.0


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
