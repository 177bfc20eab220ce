"""Long-tail dtypes: W4FP8 progressive quant and float-zero-point int.

Role of the reference's ``data_type/w4fp8.py`` (``progressive_quant_fp8_int4``
``:22``: weight → per-channel FP8-E4M3 → group-wise INT4 on the FP8 grid,
for FP8-native serving stacks) and the float-zp q4_1/q5_1 simulators
(``data_type/gguf.py:95-214``: dq = q*d + m with an fp16 min instead of an
integer zero point).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .fp8 import qdq_fp8_sym
from .grouping import from_groups, to_groups
from .intq import QdqResult, qdq_int_sym
from .registry import _reg
from .ste import round_ste

__all__ = ["qdq_w4fp8", "qdq_int_asym_float_zp"]

_EPS = 1e-8


def qdq_w4fp8(w: jax.Array, bits: int = 4, group_size: int = 128,
              v: Optional[jax.Array] = None,
              min_scale: Optional[jax.Array] = None,
              max_scale: Optional[jax.Array] = None, **kw) -> QdqResult:
    """Progressive FP8 → INT4: the weight is first snapped to the
    per-channel FP8-E4M3 grid, then int4-group-quantized on that grid, so
    the packed int4 codes dequantize exactly into FP8-representable values."""
    fp8_stage = qdq_fp8_sym(w, group_size=-1)
    r = qdq_int_sym(fp8_stage.qdq, bits, group_size, v=v,
                    min_scale=min_scale, max_scale=max_scale,
                    clip_lo=kw.get("clip_lo", 0.0),
                    clip_hi=kw.get("clip_hi", 1.0))
    return QdqResult(r.qdq, r.scale, r.zp)


def qdq_int_asym_float_zp(w: jax.Array, bits: int, group_size: int,
                          v: Optional[jax.Array] = None,
                          min_scale: Optional[jax.Array] = None,
                          max_scale: Optional[jax.Array] = None,
                          clip_lo: float = 0.0, clip_hi: float = 1.0,
                          **_) -> QdqResult:
    """q4_1/q5_1-style asym: dq = q * d + m with a float min m (no integer
    zp rounding).  zp slot carries m/d for export symmetry."""
    O, I = w.shape
    f32 = jnp.float32
    wg, pad = to_groups(w.astype(f32), group_size)
    vg = 0.0
    if v is not None:
        vg, _ = to_groups(v.astype(f32), group_size)

    maxq = 2.0 ** bits - 1
    wmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0.0)
    wmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0.0)
    if min_scale is not None:
        wmin = wmin * jnp.clip(min_scale.reshape(-1, 1).astype(f32),
                               clip_lo, clip_hi)
    if max_scale is not None:
        wmax = wmax * jnp.clip(max_scale.reshape(-1, 1).astype(f32),
                               clip_lo, clip_hi)
    d = jnp.maximum((wmax - wmin) / maxq, _EPS)
    m = wmin  # float min, fp16-representable at export
    q = jnp.clip(round_ste((wg - m) / d + vg), 0, maxq)
    qdq = (q * d + m).astype(w.dtype)
    qdq = from_groups(qdq, (O, I), pad)
    return QdqResult(qdq, d.reshape(O, -1), (-m / d).reshape(O, -1))


_reg("w4fp8", lambda w, bits, group_size, **kw: qdq_w4fp8(
    w, bits, group_size, v=kw.get("v"), min_scale=kw.get("min_scale"),
    max_scale=kw.get("max_scale")))
_reg("rtn_w4fp8", lambda w, bits, group_size, **kw: qdq_w4fp8(
    w, bits, group_size))
_reg("int_asym_float_zp", lambda w, bits, group_size, **kw:
     qdq_int_asym_float_zp(w, bits, group_size, v=kw.get("v"),
                           min_scale=kw.get("min_scale"),
                           max_scale=kw.get("max_scale"),
                           clip_lo=kw.get("clip_lo", 0.0),
                           clip_hi=kw.get("clip_hi", 1.0)))
_reg("rtn_int_asym_float_zp", lambda w, bits, group_size, **kw:
     qdq_int_asym_float_zp(w, bits, group_size))
