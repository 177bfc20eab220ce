"""Pallas serving kernels beyond W4-sym: asym (zero-point), 2-bit, 8-bit
weight-only, FP8, and MXFP4 fused dequant-matmuls.

Role of the reference's full kernel matrix (triton ``quant_matmul_248``
handles 2/4/8-bit sym+asym, ``auto_round_extension/triton/triton_utils/
kernels.py:123``; backend table ``inference/backend.py:209-650`` routes
FP8/MXFP4 to marlin/ARK equivalents).  All kernels reuse the nibble-plane
schedule from ``ops/qmatmul.py``: a K-tile of ``planes * group_size``
columns packs plane ``j`` (= quantization group ``j``) into bit-field
``j`` of an int32 word tile, so unpacking is one vectorized shift+mask
and each plane's group scale factors out of the MXU dot.

Asym zero-points use the factored identity
``y = sum_g s_g*(x_g @ c_g^T) - sum_g (s_g z_g)*rowsum(x_g)`` — the
zero-point correction is a rank-1 update per group, never a (O, K)
materialization.

MXFP4/NVFP4 expand their 32-wide group scales to lane width inside the
kernel with ``pltpu.repeat`` and ride the SAME plane dot as int4 —
decoded E2M1 values are exact in bf16 (max magnitude 6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qmatmul import PLANES, unpack_w4_planes

__all__ = [
    "pack_w2_planes", "unpack_w2_planes",
    "w4a16_asym_matmul", "w4a16_asym_matmul_ref",
    "w2a16_matmul", "w2a16_matmul_ref",
    "w8a16_matmul", "w8a16_matmul_ref",
    "fp8_matmul", "fp8_matmul_ref",
    "mxfp4_matmul", "mxfp4_matmul_ref",
    "decode_e2m1",
]

PLANES2 = 16  # int2 codes per int32 word


# ------------------------------------------------------------------ W2
def pack_w2_planes(codes: jax.Array, group_size: int = 128) -> jax.Array:
    """(O, K) uint codes < 4 → (O, K//16) int32, 16 bit-plane layout.

    K-tile t (width 16g) stores logical column ``t*16g + j*g + i`` in
    bit-pair ``j`` of word ``t*g + i`` (2-bit analogue of
    ``pack_w4_planes``)."""
    O, K = codes.shape
    TK = PLANES2 * group_size
    assert K % TK == 0, f"K={K} must be a multiple of 16*group_size={TK}"
    c = codes.astype(jnp.uint32).reshape(O, K // TK, PLANES2, group_size)
    shifts = (jnp.arange(PLANES2, dtype=jnp.uint32) * 2)[None, None, :, None]
    words = jnp.sum(c << shifts, axis=2, dtype=jnp.uint32)
    return words.reshape(O, K // PLANES2).astype(jnp.int32)


def unpack_w2_planes(words: jax.Array, group_size: int = 128) -> jax.Array:
    O, Kw = words.shape
    g = group_size
    w = words.astype(jnp.uint32).reshape(O, Kw // g, 1, g)
    shifts = (jnp.arange(PLANES2, dtype=jnp.uint32) * 2)[None, None, :, None]
    codes = (w >> shifts) & 0x3
    return codes.reshape(O, Kw * PLANES2).astype(jnp.int32)


# --------------------------------------------------------- shared utils
def _tile_o(O: int, block_o: int) -> int:
    TO = min(block_o, O)
    while O % TO:
        TO //= 2
    return TO


def _pad_rows(x2: jax.Array, TB: int):
    B = x2.shape[0]
    Bp = -(-B // TB) * TB
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    return x2, Bp


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


# ------------------------------------------------------------ W4 asym
def w4a16_asym_matmul_ref(x, qweight, scales, zps, group_size: int = 128):
    """XLA fallback: dq = (c - zp) * s with per-group float zp."""
    O, Kw = qweight.shape
    K = Kw * PLANES
    codes = unpack_w4_planes(qweight, group_size)
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=1)[:, :K]
    z = jnp.repeat(zps.astype(jnp.float32), group_size, axis=1)[:, :K]
    w = ((codes.astype(jnp.float32) - z) * s).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _asym_kernel(x_ref, w_ref, st_ref, szt_ref, o_ref, acc_ref, *,
                 group_size: int):
    """st: (PLANES, TO) scales; szt: (PLANES, TO) scale*zp products.
    acc += (x_g @ c^T) * s_row - rowsum(x_g) ⊗ (s*z)_row."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]
    acc = acc_ref[:]
    for j in range(PLANES):
        chunk = jax.lax.shift_right_logical(words, 4 * j) & 0xF
        wq = chunk.astype(jnp.bfloat16)                     # codes 0..15 exact
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        xb = xg.astype(jnp.bfloat16)
        partial = jax.lax.dot_general(
            xb, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (B, TO)
        rs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # (B, 1)
        acc = acc + partial * st_ref[j, :][None, :].astype(jnp.float32) \
            - rs * szt_ref[j, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
def w4a16_asym_matmul(x, qweight, scales, zps, group_size: int = 128,
                      block_o: int = 1024):
    """y = x @ ((codes - zp) * s).T — asym int4, bf16 MXU.

    qweight (O, K//8) nibble-plane; scales/zps (O, K//g) f32 (zp may be
    float — the reference's GPTQ-v1 grid keeps it integral, GGUF asym
    keeps it float)."""
    orig = x.shape
    K = orig[-1]
    x2 = x.reshape(-1, K)
    O = qweight.shape[0]
    TK = PLANES * group_size
    usable = (_on_tpu() and group_size >= 128 and K % TK == 0
              and O % 256 == 0)
    if not usable:
        return w4a16_asym_matmul_ref(
            x2, qweight, scales, zps, group_size).reshape(*orig[:-1], O)
    TO = _tile_o(O, block_o)
    TB = min(max(16, -(-x2.shape[0] // 16) * 16), 256)
    nrows = x2.shape[0]
    x2, Bp = _pad_rows(x2, TB)
    st = scales.astype(jnp.float32).T
    szt = (scales.astype(jnp.float32) * zps.astype(jnp.float32)).T
    grid = (Bp // TB, O // TO, K // TK)
    out = pl.pallas_call(
        functools.partial(_asym_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, group_size), lambda b, o, k: (o, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLANES, TO), lambda b, o, k: (k, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLANES, TO), lambda b, o, k: (k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TO), lambda b, o, k: (b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((TB, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * O * K,
            bytes_accessed=O * K // 2 + Bp * K * 2 + Bp * O * 2,
            transcendentals=0),
    )(x2, qweight, st, szt)
    return out[:nrows].reshape(*orig[:-1], O)


# ------------------------------------------------------------------ W2
def w2a16_matmul_ref(x, qweight, scales, group_size: int = 128):
    O, Kw = qweight.shape
    K = Kw * PLANES2
    codes = unpack_w2_planes(qweight, group_size)
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=1)[:, :K]
    w = ((codes - 2).astype(jnp.float32) * s).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _w2_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *, group_size: int):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]
    acc = acc_ref[:]
    for j in range(PLANES2):
        chunk = jax.lax.shift_right_logical(words, 2 * j) & 0x3
        wq = (chunk - 2).astype(jnp.bfloat16)               # exact small ints
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        partial = jax.lax.dot_general(
            xg.astype(jnp.bfloat16), wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + partial * st_ref[j, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
def w2a16_matmul(x, qweight, scales, group_size: int = 128,
                 block_o: int = 1024):
    """y = x @ dequant2(qweight).T — sym full-range int2 (dq=(c-2)*s,
    signed scale), 16-plane packing, 8x smaller weight stream than bf16."""
    orig = x.shape
    K = orig[-1]
    x2 = x.reshape(-1, K)
    O = qweight.shape[0]
    TK = PLANES2 * group_size
    usable = (_on_tpu() and group_size >= 128 and K % TK == 0
              and O % 256 == 0)
    if not usable:
        return w2a16_matmul_ref(x2, qweight, scales, group_size).reshape(
            *orig[:-1], O)
    TO = _tile_o(O, block_o)
    TB = min(max(16, -(-x2.shape[0] // 16) * 16), 256)
    nrows = x2.shape[0]
    x2, Bp = _pad_rows(x2, TB)
    st = scales.astype(jnp.float32).T
    grid = (Bp // TB, O // TO, K // TK)
    out = pl.pallas_call(
        functools.partial(_w2_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, group_size), lambda b, o, k: (o, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLANES2, TO), lambda b, o, k: (k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TO), lambda b, o, k: (b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((TB, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * O * K,
            bytes_accessed=O * K // 4 + Bp * K * 2 + Bp * O * 2,
            transcendentals=0),
    )(x2, qweight, st)
    return out[:nrows].reshape(*orig[:-1], O)


# ------------------------------------------------------------------ W8
def w8a16_matmul_ref(x, wi, scales, group_size: int = 0):
    """XLA fallback: int8 weights + per-group (or per-channel) scales."""
    O, K = wi.shape
    g = group_size if group_size and group_size > 0 else K
    s = jnp.repeat(scales.astype(jnp.float32).reshape(O, -1), g,
                   axis=1)[:, :K]
    w = (wi.astype(jnp.float32) * s).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _w8_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *, group_size: int,
               n_groups: int):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    for j in range(n_groups):
        wq = w_ref[:, pl.ds(j * group_size, group_size)].astype(jnp.bfloat16)
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        partial = jax.lax.dot_general(
            xg.astype(jnp.bfloat16), wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + partial * st_ref[j, :][None, :].astype(jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
def w8a16_matmul(x, wi, scales, group_size: int = 0, block_o: int = 512):
    """y = x @ (wi * s).T — int8 weights (group or per-channel scales),
    bf16 MXU, 2x smaller weight stream; dequant fused into the dot."""
    orig = x.shape
    K = orig[-1]
    x2 = x.reshape(-1, K)
    O, _ = wi.shape
    g = group_size if group_size and group_size > 0 else K
    ng_tile = max(1, min(8, (2048 // g) or 1))
    TK = ng_tile * g
    usable = (_on_tpu() and g % 128 == 0 and K % TK == 0 and O % 256 == 0)
    if not usable:
        return w8a16_matmul_ref(x2, wi, scales, group_size).reshape(
            *orig[:-1], O)
    TO = _tile_o(O, block_o)
    TB = min(max(16, -(-x2.shape[0] // 16) * 16), 256)
    nrows = x2.shape[0]
    x2, Bp = _pad_rows(x2, TB)
    st = scales.astype(jnp.float32).reshape(O, K // g).T    # (K//g, O)
    grid = (Bp // TB, O // TO, K // TK)
    out = pl.pallas_call(
        functools.partial(_w8_kernel, group_size=g, n_groups=ng_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, TK), lambda b, o, k: (o, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_tile, TO), lambda b, o, k: (k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TO), lambda b, o, k: (b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((TB, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * O * K,
            bytes_accessed=O * K + Bp * K * 2 + Bp * O * 2,
            transcendentals=0),
    )(x2, wi, st)
    return out[:nrows].reshape(*orig[:-1], O)


# ----------------------------------------------------------------- FP8
def fp8_matmul_ref(x, wf8, scales):
    """XLA fallback: e4m3 weights + per-channel scales."""
    O = wf8.shape[0]
    w = (wf8.astype(jnp.float32) * scales.astype(jnp.float32)[:, None]
         ).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _fp8_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = w_ref[:].astype(jnp.bfloat16)          # e4m3 -> bf16 exact
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), wq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:]
                    * st_ref[0, :][None, :].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_o", "block_k"))
def fp8_matmul(x, wf8, scales, block_o: int = 512, block_k: int = 2048):
    """y = x @ (wf8 * s_row).T — float8_e4m3 weights, per-out-channel
    scale fused as epilogue (the reference FP8 static schemes serve this
    shape through marlin/torch _scaled_mm)."""
    orig = x.shape
    K = orig[-1]
    x2 = x.reshape(-1, K)
    O = wf8.shape[0]
    TK = min(block_k, K)
    while TK >= 256 and K % TK:
        TK -= 256
    usable = (_on_tpu() and TK >= 256 and K % TK == 0 and O % 256 == 0)
    if not usable:
        return fp8_matmul_ref(x2, wf8, scales).reshape(*orig[:-1], O)
    TO = _tile_o(O, block_o)
    TB = min(max(16, -(-x2.shape[0] // 16) * 16), 256)
    nrows = x2.shape[0]
    x2, Bp = _pad_rows(x2, TB)
    st = jnp.broadcast_to(scales.astype(jnp.float32)[None, :], (8, O))
    grid = (Bp // TB, O // TO, K // TK)
    out = pl.pallas_call(
        _fp8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, TK), lambda b, o, k: (o, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TO), lambda b, o, k: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TO), lambda b, o, k: (b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((TB, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * O * K,
            bytes_accessed=O * K + Bp * K * 2 + Bp * O * 2,
            transcendentals=0),
    )(x2, wf8, st)
    return out[:nrows].reshape(*orig[:-1], O)


# --------------------------------------------------------------- MXFP4
def decode_e2m1(codes: jax.Array) -> jax.Array:
    """int codes 0..15 → E2M1 values, pure arithmetic (no gather).

    sign = bit3; e = bits1-2; m = bit0.
    e == 0 → ±{0, 0.5}; e > 0 → ±(1 + 0.5 m) * 2^(e-1).
    All 16 values are exactly representable in bf16/f32."""
    c = codes.astype(jnp.int32)
    sign = 1.0 - 2.0 * ((c >> 3) & 1).astype(jnp.float32)
    e = ((c >> 1) & 3).astype(jnp.float32)
    m = (c & 1).astype(jnp.float32)
    sub = 0.5 * m                                   # e == 0 branch
    # 2^(e-1) for e in {1,2,3} = {1,2,4}; computed as exp2 via polynomial-
    # free shift: (1 << e) * 0.5 with e as int
    pow2 = jnp.exp2(e - 1.0)
    norm = (1.0 + 0.5 * m) * pow2
    return sign * jnp.where(e == 0.0, sub, norm)


def mxfp4_matmul_ref(x, qweight, scales, group_size: int = 32):
    """XLA fallback: E2M1 codes in nibble-plane layout (PACKING group 128)
    + f32 scales at the MX group width (32)."""
    O, Kw = qweight.shape
    K = Kw * PLANES
    codes = unpack_w4_planes(qweight, 128)
    vals = decode_e2m1(codes)
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=1)[:, :K]
    w = (vals * s).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def mx_scale_cols(K: int, group_size: int) -> int:
    """Lane-padded scale-column count for the MXFP4 kernel layout: the
    (O, K//g) scale matrix is padded up to a multiple of 128 columns so
    its BlockSpec tiles are Mosaic-legal (last dim % 128 == 0)."""
    kg = K // group_size
    return -(-kg // 128) * 128


def mx_group_size_from_shapes(K: int, scale_cols: int) -> int:
    """Recover the MX group size (32 or 16) from packed array shapes —
    scale arrays may be stored padded (``mx_scale_cols``) or exact."""
    for g in (32, 16):
        if scale_cols in (K // g, mx_scale_cols(K, g)):
            return g
    raise ValueError(f"no MX group size matches K={K}, cols={scale_cols}")


def _mxfp4_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *,
                  group_size: int, tiles_per_sblock: int):
    """Plane dot with in-kernel scale interleave-expansion.

    Plane j of K-tile k covers ``128 // group_size`` MX groups; the
    (TO, 128) per-lane scale map ``srep[o, c] = s[o, pos + j*sub + c//g]``
    is materialized as one (TO,128)x(128,128) MXU dot against a one-hot
    selector built from iota compares — Mosaic has no element-interleave
    repeat, and narrow lane slices don't lower.  E2M1 values and their
    scale products stay exact in the bf16 dot for pow2 (E8M0) scales."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sub = 128 // group_size                            # MX groups / plane
    spt = PLANES * sub                                 # scale cols / K-tile
    pos = (k % tiles_per_sblock) * spt
    words = w_ref[:]                                   # (TO, 128) int32
    st = st_ref[:].astype(jnp.float32)                 # (TO, 128)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    acc = acc_ref[:]
    for j in range(PLANES):
        sel = (a_idx == pos + j * sub + c_idx // group_size
               ).astype(jnp.float32)                   # (128, 128) one-hot
        srep = jax.lax.dot_general(
            st, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (TO, 128)
        chunk = jax.lax.shift_right_logical(words, 4 * j) & 0xF
        vals = decode_e2m1(chunk)                      # (TO, 128) f32
        wq = (vals * srep).astype(jnp.bfloat16)
        xg = x_ref[:, pl.ds(j * 128, 128)]
        acc = acc + jax.lax.dot_general(
            xg.astype(jnp.bfloat16), wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
def mxfp4_matmul(x, qweight, scales, group_size: int = 32,
                 block_o: int = 512):
    """y = x @ (e2m1(codes) * s).T — MXFP4/NVFP4 weights (4-bit codes,
    32-wide f32 group scales; NVFP4's global scale is pre-multiplied into
    ``scales`` at pack time)."""
    orig = x.shape
    K = orig[-1]
    x2 = x.reshape(-1, K)
    O = qweight.shape[0]
    TK = PLANES * 128
    sub = 128 // group_size
    kg = K // group_size
    if scales.shape[-1] not in (kg, mx_scale_cols(K, group_size)):
        raise ValueError(
            f"mxfp4 scales must have {kg} or padded "
            f"{mx_scale_cols(K, group_size)} columns, got {scales.shape}")
    usable = (_on_tpu() and group_size in (16, 32) and K % TK == 0
              and O % 256 == 0)
    if not usable:
        return mxfp4_matmul_ref(x2, qweight, scales[:, :kg],
                                group_size).reshape(*orig[:-1], O)
    spt = PLANES * sub                       # scale columns per K-tile
    tpb = 128 // spt                         # K-tiles per 128-col block
    scp = mx_scale_cols(K, group_size)
    if scales.shape[-1] != scp:              # pad to the lane-legal layout
        scales = jnp.pad(scales, ((0, 0), (0, scp - kg)))
    TO = _tile_o(O, block_o)
    TB = min(max(16, -(-x2.shape[0] // 16) * 16), 256)
    nrows = x2.shape[0]
    x2, Bp = _pad_rows(x2, TB)
    grid = (Bp // TB, O // TO, K // TK)
    out = pl.pallas_call(
        functools.partial(_mxfp4_kernel, group_size=group_size,
                          tiles_per_sblock=tpb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, 128), lambda b, o, k: (o, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, 128), lambda b, o, k, t=tpb: (o, k // t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TO), lambda b, o, k: (b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((TB, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * O * K,
            bytes_accessed=O * K // 2 + O * (K // group_size) * 4
            + Bp * K * 2 + Bp * O * 2,
            transcendentals=0),
    )(x2, qweight, scales.astype(jnp.float32))
    return out[:nrows].reshape(*orig[:-1], O)
