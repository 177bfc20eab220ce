"""FP8 fake-quant: per-tensor / per-channel / 2-D block-wise E4M3 (+E5M2).

Role of the reference's ``auto_round/data_type/fp8.py`` (per-channel/tensor
``fp8_sym`` ``:82-134``, 2-D (128,128) ``block_fp8_sym`` ``:28-79``).  The
qdq roundtrips through JAX's native float8 dtypes so rounding semantics
match hardware casts; values are pre-clipped to the format max so the cast
saturates instead of producing inf/nan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .intq import QdqResult
from .ste import cast_ste, clip_ste

__all__ = ["qdq_fp8_sym", "qdq_fp8_block", "FP8_MAX"]

FP8_MAX = {"e4m3": 448.0, "e5m2": 57344.0}
_FP8_DTYPE = {"e4m3": jnp.float8_e4m3fn, "e5m2": jnp.float8_e5m2}
# vLLM-compatible minimum scale clip (reference fp8.py:82-134)
_MIN_SCALE = 1.0 / (448.0 * 512.0)


def qdq_fp8_sym(
    w: jax.Array,
    group_size: int = -1,
    fp8_format: str = "e4m3",
    max_scale: Optional[jax.Array] = None,
    scale: Optional[jax.Array] = None,
    **_,
) -> QdqResult:
    """Symmetric FP8 qdq.  group_size -1 → per-output-channel, 0 → per-tensor.
    ``scale`` may be supplied (static activation quantization)."""
    fmax = FP8_MAX[fp8_format]
    fdtype = _FP8_DTYPE[fp8_format]
    compute_dtype = jnp.promote_types(w.dtype, jnp.float32)
    wf = w.astype(compute_dtype)

    if scale is None:
        if group_size == 0:
            amax = jnp.max(jnp.abs(wf))
        else:
            amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
        if max_scale is not None:
            amax = amax * jnp.clip(jnp.asarray(max_scale, compute_dtype), 0.0, 1.0)
        scale = jnp.maximum(amax / fmax, _MIN_SCALE)
    q = cast_ste(clip_ste(wf / scale, -fmax, fmax), fdtype)
    qdq = (q * scale).astype(w.dtype)
    scale_out = jnp.atleast_1d(jnp.asarray(scale))
    if scale_out.ndim > 1:
        scale_out = scale_out.reshape(w.shape[0], -1)
    return QdqResult(qdq, scale_out, None)


def qdq_fp8_block(
    w: jax.Array,
    block: Tuple[int, int] = (128, 128),
    fp8_format: str = "e4m3",
    **_,
) -> QdqResult:
    """2-D block-wise FP8 (DeepSeek-style (128,128) tiles).

    Pads to a multiple of the block in both dims, computes one scale per
    tile.  All reshapes are static; XLA lowers this to a tiled VPU pass.
    """
    fmax = FP8_MAX[fp8_format]
    fdtype = _FP8_DTYPE[fp8_format]
    O, I = w.shape
    br, bc = block
    compute_dtype = jnp.promote_types(w.dtype, jnp.float32)
    pr, pc = (-O) % br, (-I) % bc
    wf = jnp.pad(w.astype(compute_dtype), ((0, pr), (0, pc)))
    nR, nC = wf.shape[0] // br, wf.shape[1] // bc
    tiles = wf.reshape(nR, br, nC, bc).transpose(0, 2, 1, 3)  # (nR, nC, br, bc)
    amax = jnp.max(jnp.abs(tiles), axis=(-1, -2), keepdims=True)
    scale = jnp.maximum(amax / fmax, _MIN_SCALE)
    q = cast_ste(clip_ste(tiles / scale, -fmax, fmax), fdtype)
    dq = (q * scale).transpose(0, 2, 1, 3).reshape(wf.shape)
    qdq = dq[:O, :I].astype(w.dtype)
    return QdqResult(qdq, scale.reshape(nR, nC), None)
