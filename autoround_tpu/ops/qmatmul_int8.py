"""Pallas int8-MXU matmuls: W8A8 (and W4A8) quantized-compute path.

Role of the reference's int8 serving kernels (triton fused
dequant-matmuls ``triton_utils/kernels.py:123``; ARK int8 kblock GEMMs
``bestla_gemm_kblock.h``), designed from the measured TPU roofline
(docs/design.md): at decode batches this chip is MXU-pass-bound and int8
gains nothing (measured 0.95x), but at prefill/large-batch shapes the
int8 MXU path is ~1.9x over bf16 through plain XLA ``dot_general`` — the
loss in a naive pipeline is the int32 accumulator materialized to HBM
between matmul and dequant.  The Pallas kernel here fuses the dequant
epilogue (per-row act scale x per-channel weight scale) into the GEMM so
the int32 tile never leaves VMEM.

Activations quantize per-token (dynamic sym int8, amax/127) in one cheap
XLA pass; weights are per-out-channel sym int8 (W8A8) or the W4 nibble-
plane layout with per-group scales (W4A8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qmatmul import PLANES

__all__ = ["quantize_rows", "w8a8_matmul", "w8a8_matmul_ref",
           "pack_w8", "w4a8_matmul", "w4a8_matmul_ref",
           "pack_w4_bytes", "unpack_w4_bytes"]


@jax.jit
def quantize_rows(x: jax.Array):
    """(..., K) float → (int8 codes, (...,) f32 per-row scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-8)
    xi = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xi, s[..., 0]


def pack_w8(w: jax.Array):
    """(O, K) float weight → (int8 codes, (O,) f32 per-channel scale)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    wi = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return wi, s[:, 0]


def w8a8_matmul_ref(x, wi, ws):
    """Pure-XLA path: quantize rows, int8 dot, dequant."""
    orig = x.shape
    xi, xs = quantize_rows(x.reshape(-1, orig[-1]))
    acc = jax.lax.dot_general(
        xi, wi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs[:, None] * ws[None, :]
    return y.astype(x.dtype).reshape(*orig[:-1], wi.shape[0])


def _w8a8_kernel(x_ref, xs_ref, w_ref, ws_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        xs = xs_ref[:].astype(jnp.float32)        # (TB, 128) lane-replicated
        reps = acc.shape[1] // xs.shape[1]
        if reps > 1:
            xs = jnp.concatenate([xs] * reps, axis=1)
        y = acc * xs * ws_ref[0, :][None, :].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "block_o", "block_k"))
def w8a8_matmul(x, wi, ws, block_b: int = 512, block_o: int = 512,
                block_k: int = 4096):
    """y = dequant(q(x) @ wi.T): int8 MXU GEMM with fused epilogue.

    x (..., K) bf16/f32; wi (O, K) int8; ws (O,) f32.

    Default tiles are the measured optimum on v5e at B=2048
    (TB=512/TO=512/TK=4096 → 2063 us for 2048x4096x14336, matching XLA's
    raw-int8 dot at 2012 us while fusing quantize+dequant).
    """
    orig = x.shape
    K = orig[-1]
    O = wi.shape[0]
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    # largest K-tile <= block_k that divides K on a 256 lane multiple
    TK = min(block_k, K)
    while TK >= 256 and K % TK:
        TK -= 256
    usable = (jax.devices()[0].platform == "tpu" and TK >= 256
              and K % TK == 0 and O % 256 == 0 and K % 256 == 0)
    if not usable:
        return w8a8_matmul_ref(x, wi, ws)

    xi, xs = quantize_rows(x2)

    TO = min(block_o, O)
    while O % TO:
        TO //= 2
    TB = min(max(32, -(-B // 32) * 32), block_b)
    Bp = -(-B // TB) * TB
    if Bp != B:
        xi = jnp.pad(xi, ((0, Bp - B), (0, 0)))
        xs = jnp.pad(xs, (0, Bp - B))

    # lane-replicate the row scales so the epilogue is a (TB, 128)-tiled
    # broadcast (1-lane loads don't tile well on TPU)
    xs2 = jnp.broadcast_to(xs[:, None], (Bp, 128))
    ws2 = jnp.broadcast_to(ws[None, :], (8, O)).astype(jnp.float32)

    grid = (Bp // TB, O // TO, K // TK)
    out = pl.pallas_call(
        _w8a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda b, o, k: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, TK), lambda b, o, k: (o, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TO), lambda b, o, k: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TO), lambda b, o, k: (b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((TB, TO), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * O * K,
            bytes_accessed=O * K + Bp * K + Bp * O * 2,
            transcendentals=0,
        ),
    )(xi, xs2, wi, ws2)
    return out[:B].reshape(*orig[:-1], O)


# --------------------------------------------------------------- W4A8
#
# Round-4 design (scripts/kernel_a8.py, measured vs 13 A16/A8 variants):
# int8 "byte-pair" weight layout — byte column c of K-tile t holds group
# 2t's code in the low nibble and group 2t+1's code XOR 8 in the high
# nibble.  The XOR trick makes the signed value of (byte & 0xF0) exactly
# 16*(code-8), so hi-half extraction is ONE int8 AND (no shift, no
# convert, no zero point); the lo half is one AND with the -8 riding an
# integer rowsum correction (Mosaic int8 vector arithmetic is AND-only).
# Weights stream as full contiguous rows (strided int8 blocks DMA at 466
# vs 718 GB/s full-row), both grid dims are parallel, and the dots run
# int8 x int8 on the MXU.  Measured 87-94 us for the 31.2 MB
# 14336x4096 layer vs ~95 us for the A16 plane kernel (DMA floor 41-45).

def pack_w4_bytes(codes: jax.Array) -> jax.Array:
    """(O, K) codes<16 → (O, K//2) int8 byte pairs (see module note).

    K-tile t (width 2*128): byte column c holds group 2t's code (lo
    nibble, plain) and group 2t+1's code XOR 8 (hi nibble)."""
    O, K = codes.shape
    g = 128
    assert K % (2 * g) == 0, f"K={K} must be a multiple of 2*{g}"
    c = codes.astype(jnp.uint8).reshape(O, K // (2 * g), 2, g)
    packed = c[:, :, 0, :] | ((c[:, :, 1, :] ^ 8) << 4)
    return packed.reshape(O, K // 2).astype(jnp.int8)


def unpack_w4_bytes(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_w4_bytes` → (O, K) int32 codes 0..15."""
    O, Kb = packed.shape
    g = 128
    b = packed.astype(jnp.int32) & 0xFF
    lo = b & 0xF
    hi = ((b >> 4) & 0xF) ^ 8
    c = jnp.stack([lo.reshape(O, Kb // g, g),
                   hi.reshape(O, Kb // g, g)], axis=2)
    return c.reshape(O, 2 * Kb)


def w4a8_matmul_ref(x, qweight, scales, group_size: int = 128):
    """XLA reference: int8 act x dequantized int4 weight (f32 math).

    qweight (O, K//2) int8 byte-pair layout."""
    orig = x.shape
    K = orig[-1]
    xi, xs = quantize_rows(x.reshape(-1, K))
    codes = unpack_w4_bytes(qweight)
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=1)[:, :K]
    w = (codes - 8).astype(jnp.float32) * s
    acc = jax.lax.dot_general(
        xi.astype(jnp.float32), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = acc * xs[:, None]
    return y.astype(x.dtype).reshape(*orig[:-1], qweight.shape[0])


def _w4a8_kernel(x_ref, xs_ref, w_ref, st_ref, o_ref, *, group_size: int):
    """x_ref (TB, K) int8; xs_ref (TB, 128) lane-replicated f32 per-token
    act scales; w_ref (TO, K//2) int8 byte pairs (full rows); st_ref
    (nkt2, 4, TO) f32 rows [s_lo, s_hi/16, pad, pad] per 2-group tile."""
    nkt2 = st_ref.shape[0]
    g = group_size
    acc = jnp.zeros((x_ref.shape[0], o_ref.shape[1]), jnp.float32)
    for t in range(nkt2):
        byts = w_ref[:, pl.ds(t * g, g)]               # (TO, g) int8
        for half in range(2):
            xg = x_ref[:, pl.ds((2 * t + half) * g, g)]   # (B, g) i8
            if half == 0:
                wq = byts & jnp.int8(0xF)              # codes 0..15
            else:
                wq = byts & jnp.int8(-16)              # 16*(code-8)
            partial = jax.lax.dot_general(
                xg, wq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)      # (B, TO)
            if half == 0:
                xsum = jnp.sum(xg.astype(jnp.int32), axis=1,
                               keepdims=True)
                partial = partial - 8 * xsum
            acc = acc + partial.astype(jnp.float32) \
                * st_ref[t, half, :][None, :]
    xs = xs_ref[:]                                     # (TB, 128) f32
    reps = acc.shape[1] // xs.shape[1]
    if reps > 1:
        xs = jnp.concatenate([xs] * reps, axis=1)
    o_ref[:] = (acc * xs).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def _w4a8_scale_rows(scales: jax.Array, group_size: int) -> jax.Array:
    """(O, K//g) f32 → (nkt2, 4, O): rows [s_lo, s_hi/16, pad, pad]."""
    st = scales.astype(jnp.float32).T                  # (K//g, O)
    ng, O = st.shape
    st = st.reshape(ng // 2, 2, O)
    folded = jnp.stack([st[:, 0], st[:, 1] / 16.0], axis=1)
    return jnp.concatenate([folded, jnp.zeros_like(folded)], axis=1)


@functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
def w4a8_matmul(x, qweight, scales, group_size: int = 128,
                block_o: int = 2048):
    """y = dequant(q8(x) @ dequant4(qweight).T) — W4 weights, int8 MXU.

    qweight (O, K//2) int8 byte-pair layout (:func:`pack_w4_bytes`);
    scales (O, K//g) f32.  Role of the reference's W4A8 kernels (ARK
    int8 kblock GEMMs, ``bestla_gemm_kblock.h``)."""
    orig = x.shape
    K = orig[-1]
    O, Kb = qweight.shape
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    # The byte-pair layout (pack_w4_bytes) and the kernel's scale folding
    # both pair groups at a hard 128-byte tile; a wider group_size would
    # read mismatched columns, so only g=128 takes the Pallas path.
    usable = (jax.devices()[0].platform == "tpu" and group_size == 128
              and K % (2 * group_size) == 0 and O % 256 == 0)
    if not usable:
        return w4a8_matmul_ref(x, qweight, scales, group_size).reshape(
            *orig[:-1], O)

    xi, xs = quantize_rows(x2)
    st = _w4a8_scale_rows(scales, group_size)

    # full-row weight blocks: cap TO so the (TO, K//2) int8 block plus
    # its pipeline double-buffer stays within ~8 MB of VMEM
    vmem_cap = max(256, ((4 << 20) // Kb) // 256 * 256)
    TO = min(block_o, O, vmem_cap)
    while O % TO:
        TO //= 2
    TB = min(max(32, -(-B // 32) * 32), 256)
    Bp = -(-B // TB) * TB
    if Bp != B:
        xi = jnp.pad(xi, ((0, Bp - B), (0, 0)))
        xs = jnp.pad(xs, (0, Bp - B))
    xs2 = jnp.broadcast_to(xs[:, None], (Bp, 128)).astype(jnp.float32)

    nkt2 = K // (2 * group_size)
    grid = (Bp // TB, O // TO)
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, K), lambda b, o: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda b, o: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, Kb), lambda b, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nkt2, 4, TO), lambda b, o: (0, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TO), lambda b, o: (b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * O * K,
            bytes_accessed=O * K // 2 + Bp * K + Bp * O * 2,
            transcendentals=0,
        ),
    )(xi, xs2, qweight, st)
    return out[:B].reshape(*orig[:-1], O)
