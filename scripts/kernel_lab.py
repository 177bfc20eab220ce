"""W4 dequant-matmul kernel lab (round 4, VERDICT item 1).

The round-3 kernel runs at 335.6 GB/s of a 739.8 GB/s measured read roof
and is VPU-extraction-bound: per plane it does shift + and + convert
(3 VPU ops per weight) plus a 3-op (B, TO) scale/correction epilogue.

Variants measured here attack the op count:

  base : round-3 kernel (ops/qmatmul.py)
  mask : AND-without-shift extraction.  ``w & (0xF << 4j)`` yields
         ``code * 2^(4j)`` — exactly representable in bf16 (4-bit
         mantissa, power-of-two factor) — and the ``2^-4j`` folds into
         the per-plane scale row precomputed on the host.  Plane 7 is a
         single logical shift (no mask needed).  2 VPU ops/weight.
  maskdot : mask + the -8 zero-point correction computed once per
         K-tile as an (B, 8) @ (8, TO) dot of per-plane x-sums against
         the raw scale rows, replacing 8 per-plane (B, TO) outer
         products with one tiny MXU dot.

Timing: slope method from scripts/roofline.py (on-device fori_loop x
scan over R distinct payloads; tunnel dispatch overhead cancels).
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from autoround_tpu.ops.qmatmul import (  # noqa: E402
    PLANES, pack_w4_planes, w4a16_matmul, w4a16_matmul_ref)

R = 8


# ---------------------------------------------------------------- variants

def _mask_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *, group_size: int):
    """st_ref: (2*PLANES, TO) — rows 0..7 folded scales s_j * 2^-4j,
    rows 8..15 raw scales * 8 (for the zero-point correction)."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]                                   # (TO, g) int32
    acc = acc_ref[:]
    for j in range(PLANES):
        if j < PLANES - 1:
            chunk = words & jnp.int32(0xF << (4 * j))  # code * 2^4j >= 0
        else:
            chunk = jax.lax.shift_right_logical(words, 28)
        wq = chunk.astype(jnp.bfloat16)                # exact (4-bit mant)
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        partial = jax.lax.dot_general(
            xg, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (B, TO)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + partial * st_ref[j, :][None, :] \
            - xs * st_ref[PLANES + j, :][None, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _maskdot_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *,
                    group_size: int):
    """mask extraction + correction as one (B, PLANES) @ (PLANES, TO)
    dot per K-tile."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]
    acc = acc_ref[:]
    B = x_ref.shape[0]
    xsums = jnp.sum(
        x_ref[:].astype(jnp.float32).reshape(B, PLANES, group_size), axis=2)
    for j in range(PLANES):
        if j < PLANES - 1:
            chunk = words & jnp.int32(0xF << (4 * j))
        else:
            chunk = jax.lax.shift_right_logical(words, 28)
        wq = chunk.astype(jnp.bfloat16)
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        partial = jax.lax.dot_general(
            xg, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + partial * st_ref[j, :][None, :]
    corr = jax.lax.dot_general(
        xsums, st_ref[PLANES:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (B, TO)
    acc_ref[:] = acc - corr

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _folded_scales(scales, group_size):
    """(O, K//g) f32 → (K//g // PLANES tiles stacked, 2*PLANES, O):
    per K-tile rows 0..7 = s_j * 2^-4j, rows 8..15 = 8 * s_j."""
    st = scales.astype(jnp.float32).T                  # (K//g, O)
    ng, O = st.shape
    st = st.reshape(ng // PLANES, PLANES, O)
    fold = (2.0 ** (-4.0 * np.arange(PLANES))).astype(np.float32)
    fold[-1] = 1.0                                     # plane 7 is shifted
    folded = st * fold[None, :, None]
    corr = st * 8.0
    return jnp.concatenate([folded, corr], axis=1)     # (ntile, 16, O)


def make_variant(kernel_fn, name):
    @functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
    def matmul(x, qweight, scales_folded, group_size=128, block_o=2048):
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        B = x2.shape[0]
        O = qweight.shape[0]
        TK = PLANES * group_size
        TO = min(block_o, O)
        while O % TO:
            TO //= 2
        TB = min(max(16, -(-B // 16) * 16), 256)
        Bp = -(-B // TB) * TB
        if Bp != B:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
        grid = (Bp // TB, O // TO, K // TK)
        out = pl.pallas_call(
            functools.partial(kernel_fn, group_size=group_size),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, group_size), lambda b, o, k: (o, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * PLANES, TO), lambda b, o, k: (k, 0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, TO), lambda b, o, k: (b, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
            scratch_shapes=[pltpu.VMEM((TB, TO), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * O * K,
                bytes_accessed=O * K // 2 + Bp * K * 2 + Bp * O * 2,
                transcendentals=0,
            ),
        )(x2, qweight, scales_folded)
        return out[:B]
    matmul.__name__ = name
    return matmul


# st blocks index a (ntile, 16, O) folded-scale array; the kernel sees
# (1, 16, TO) — the view squeezes the leading dim so kernel bodies can
# index st_ref[j, :].

class _STView:
    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            return self._ref[(0,) + idx]
        return self._ref[0, idx]


def _adapt(kernel_fn):
    def k(x_ref, w_ref, st_ref, o_ref, acc_ref, *, group_size):
        return kernel_fn(x_ref, w_ref, _STView(st_ref), o_ref, acc_ref,
                         group_size=group_size)
    return k


# -------------------------------------------------------- probe kernels
# Diagnostics to localize the bottleneck (same (TO, g) tiling as base):
#   p4   : only planes 0..3 — half VPU extraction, half MXU dots, same
#          DMA.  time ~halves => compute-bound; time ~same => DMA-bound.
#   noxs : all 8 planes, no x-sum correction, scale folded — removes all
#          cross-lane reductions and halves the (B, TO) epilogue.
#   dmaonly : touches one element of each block — pure DMA rate at this
#          tiling (blocks are fetched by BlockSpec regardless of use).

def _p4_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *, group_size: int):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    words = w_ref[:]
    acc = acc_ref[:]
    for j in range(4):
        chunk = words & jnp.int32(0xF << (4 * j))
        wq = chunk.astype(jnp.bfloat16)
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        partial = jax.lax.dot_general(
            xg, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + partial * st_ref[0, j, :][None, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _noxs_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *, group_size: int):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    words = w_ref[:]
    acc = acc_ref[:]
    for j in range(PLANES):
        if j < PLANES - 1:
            chunk = words & jnp.int32(0xF << (4 * j))
        else:
            chunk = jax.lax.shift_right_logical(words, 28)
        wq = chunk.astype(jnp.bfloat16)
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        partial = jax.lax.dot_general(
            xg, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + partial * st_ref[0, j, :][None, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _dmaonly_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *,
                    group_size: int):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[0:8, 0:128] = (acc_ref[0:8, 0:128]
                           + w_ref[0:8, 0:128].astype(jnp.float32)
                           + x_ref[0:8, 0:128].astype(jnp.float32)
                           + st_ref[0, 0:8, 0:128])

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _fullk_kernel(x_ref, w_ref, st_ref, o_ref, *, group_size: int):
    """Whole-K weight block: w_ref (TO, Kw) int32 — every row is one
    fully contiguous HBM read (the (TO, g) tiles of the k-grid variants
    read 512-byte strided chunks instead).  K-tile loop runs inside the
    kernel; st_ref (nkt, 2*PLANES, TO)."""
    nkt = st_ref.shape[0]
    acc = jnp.zeros((x_ref.shape[0], w_ref.shape[0]), jnp.float32)
    for t in range(nkt):
        words = w_ref[:, pl.ds(t * group_size, group_size)]
        for j in range(PLANES):
            if j < PLANES - 1:
                chunk = words & jnp.int32(0xF << (4 * j))
            else:
                chunk = jax.lax.shift_right_logical(words, 28)
            wq = chunk.astype(jnp.bfloat16)
            xg = x_ref[:, pl.ds((t * PLANES + j) * group_size, group_size)]
            partial = jax.lax.dot_general(
                xg, wq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc + partial * st_ref[t, j, :][None, :] \
                - xs * st_ref[t, PLANES + j, :][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def make_fullk(name):
    @functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
    def matmul(x, qweight, scales_folded, group_size=128, block_o=2048):
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        B = x2.shape[0]
        O, Kw = qweight.shape
        TO = min(block_o, O)
        while O % TO:
            TO //= 2
        TB = min(max(16, -(-B // 16) * 16), 256)
        Bp = -(-B // TB) * TB
        if Bp != B:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
        nkt = K // (PLANES * group_size)
        grid = (Bp // TB, O // TO)
        out = pl.pallas_call(
            functools.partial(_fullk_kernel, group_size=group_size),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, K), lambda b, o: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, Kw), lambda b, o: (o, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nkt, 2 * PLANES, TO), lambda b, o: (0, 0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, TO), lambda b, o: (b, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * O * K,
                bytes_accessed=O * K // 2 + Bp * K * 2 + Bp * O * 2,
                transcendentals=0,
            ),
        )(x2, qweight, scales_folded)
        return out[:B]
    matmul.__name__ = name
    return matmul


def _dbuf_kernel(x_ref, w_any, st_ref, o_ref, *, group_size: int,
                 to_sub: int):
    """Manual double-buffered DMA: weight rows stream as contiguous
    (to_sub, Kw) slabs (full rows => one linear HBM burst per slab)
    while the previous slab's extraction+dots run — explicit
    compute/DMA overlap the automatic grid pipeline is not achieving
    (measured: base time = DMA time + compute time, additive)."""
    TO = o_ref.shape[1]
    Kw = w_any.shape[1]
    nkt = st_ref.shape[0]
    o_base = pl.program_id(1) * TO
    nsub = TO // to_sub

    def body(scratch, sem):
        def get_dma(slot, i):
            return pltpu.make_async_copy(
                w_any.at[pl.ds(o_base + i * to_sub, to_sub), :],
                scratch.at[slot], sem.at[slot])

        get_dma(0, 0).start()
        for i in range(nsub):
            if i + 1 < nsub:
                get_dma((i + 1) % 2, i + 1).start()
            get_dma(i % 2, i).wait()
            acc = jnp.zeros((x_ref.shape[0], to_sub), jnp.float32)
            for t in range(nkt):
                words = scratch[i % 2, :, pl.ds(t * group_size, group_size)]
                for j in range(PLANES):
                    if j < PLANES - 1:
                        chunk = words & jnp.int32(0xF << (4 * j))
                    else:
                        chunk = jax.lax.shift_right_logical(words, 28)
                    wq = chunk.astype(jnp.bfloat16)
                    xg = x_ref[:, pl.ds((t * PLANES + j) * group_size,
                                        group_size)]
                    partial = jax.lax.dot_general(
                        xg, wq, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    xs = jnp.sum(xg.astype(jnp.float32), axis=1,
                                 keepdims=True)
                    acc = acc + partial * st_ref[
                        t, j, pl.ds(i * to_sub, to_sub)][None, :] \
                        - xs * st_ref[t, PLANES + j,
                                      pl.ds(i * to_sub, to_sub)][None, :]
            o_ref[:, pl.ds(i * to_sub, to_sub)] = acc.astype(o_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((2, to_sub, Kw), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
    )


def make_dbuf(name, to_sub=256):
    @functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
    def matmul(x, qweight, scales_folded, group_size=128, block_o=2048):
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        B = x2.shape[0]
        O, Kw = qweight.shape
        TO = min(block_o, O)
        while O % TO:
            TO //= 2
        TB = min(max(16, -(-B // 16) * 16), 256)
        Bp = -(-B // TB) * TB
        if Bp != B:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
        nkt = K // (PLANES * group_size)
        grid = (Bp // TB, O // TO)
        out = pl.pallas_call(
            functools.partial(_dbuf_kernel, group_size=group_size,
                              to_sub=to_sub),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, K), lambda b, o: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((nkt, 2 * PLANES, TO), lambda b, o: (0, 0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, TO), lambda b, o: (b, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * O * K,
                bytes_accessed=O * K // 2 + Bp * K * 2 + Bp * O * 2,
                transcendentals=0,
            ),
        )(x2, qweight, scales_folded)
        return out[:B]
    matmul.__name__ = name
    return matmul


def pack_w4_bytes(codes: jax.Array) -> jax.Array:
    """(O, K) codes<16 → (O, K//2) uint8.  K-tile t (width 2g): byte
    column c holds group 2t's code (lo nibble) and group 2t+1's code
    (hi nibble) at position c — extraction is ``b & 0xF`` / ``b >> 4``
    over uint8 vectors (4x the VPU element density of int32 words)."""
    O, K = codes.shape
    g = 128
    c = codes.astype(jnp.uint8).reshape(O, K // (2 * g), 2, g)
    # hi nibble stored as code^8: two's-complement nibble value is then
    # exactly code-8, so (byte & 0xF0) as signed int8 = 16*(code-8) —
    # no shift, no zero-point correction for hi halves.
    packed = c[:, :, 0, :] | ((c[:, :, 1, :] ^ 8) << 4)
    return packed.reshape(O, K // 2).astype(jnp.int8)


def _bytes_kernel(x_ref, w_ref, st_ref, o_ref, *, group_size: int):
    """Full-row uint8 pair layout.  st_ref (nkt2, 4, TO): rows
    [s_lo, s_hi, 8*s_lo, 8*s_hi] per 2-group K-tile."""
    nkt2 = st_ref.shape[0]
    acc = jnp.zeros((x_ref.shape[0], o_ref.shape[1]), jnp.float32)
    for t in range(nkt2):
        byts = w_ref[:, pl.ds(t * group_size, group_size)]   # (TO, g) i8
        for half in range(2):
            xg = x_ref[:, pl.ds((2 * t + half) * group_size, group_size)]
            if half == 0:
                wq = (byts & jnp.int8(0xF)).astype(jnp.bfloat16)
            else:
                # signed (b & 0xF0) = 16*(code-8); 1/16 folded in scale
                wq = (byts & jnp.int8(-16)).astype(jnp.bfloat16)
            partial = jax.lax.dot_general(
                xg, wq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if half == 0:
                xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                acc = acc + partial * st_ref[t, 0, :][None, :] \
                    - xs * st_ref[t, 2, :][None, :]
            else:
                acc = acc + partial * st_ref[t, 1, :][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def pack_w4_bytes2(codes: jax.Array) -> jax.Array:
    """Both nibbles stored code^8: lo extracts as (b << 4) = 16*(lo-8)
    signed (one op, no mask), hi as (b & 0xF0) = 16*(hi-8).  No
    zero-point corrections at all; 1/16 folds into both scales."""
    O, K = codes.shape
    g = 128
    c = (codes.astype(jnp.uint8) ^ 8).reshape(O, K // (2 * g), 2, g)
    packed = c[:, :, 0, :] | (c[:, :, 1, :] << 4)
    return packed.reshape(O, K // 2).astype(jnp.int8)


def _bytes2_kernel(x_ref, w_ref, st_ref, o_ref, *, group_size: int):
    """st_ref (nkt2, 2, TO): [s_lo/16, s_hi/16]."""
    nkt2 = st_ref.shape[0]
    acc = jnp.zeros((x_ref.shape[0], o_ref.shape[1]), jnp.float32)
    for t in range(nkt2):
        byts = w_ref[:, pl.ds(t * group_size, group_size)]   # (TO, g) i8
        for half in range(2):
            xg = x_ref[:, pl.ds((2 * t + half) * group_size, group_size)]
            if half == 0:
                # wrapping int8 mul == shl 4: yields 16*(lo-8) signed
                wq = (byts * jnp.int8(16)).astype(jnp.bfloat16)
            else:
                wq = (byts & jnp.int8(-16)).astype(jnp.bfloat16)
            partial = jax.lax.dot_general(
                xg, wq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + partial * st_ref[t, half, :][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def _byte2_scales(scales):
    st = scales.astype(jnp.float32).T
    ng, O = st.shape
    return (st / 16.0).reshape(ng // 2, 2, O)


def _bytes_dmaonly_kernel(x_ref, w_ref, st_ref, o_ref, *,
                          group_size: int):
    o_ref[:] = (x_ref[:, :o_ref.shape[1]]
                + w_ref[:o_ref.shape[0], :o_ref.shape[1]].astype(
                    jnp.bfloat16)
                + st_ref[0, 0, :][None, :].astype(jnp.bfloat16))


def make_bytes_like(kernel_fn, name, st_rows=4):
    @functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
    def matmul(x, qweight, scales_b, group_size=128, block_o=2048):
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        B = x2.shape[0]
        O, Kb = qweight.shape
        TO = min(block_o, O)
        while O % TO:
            TO //= 2
        TB = min(max(16, -(-B // 16) * 16), 256)
        Bp = -(-B // TB) * TB
        if Bp != B:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
        nkt2 = K // (2 * group_size)
        grid = (Bp // TB, O // TO)
        out = pl.pallas_call(
            functools.partial(kernel_fn, group_size=group_size),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, K), lambda b, o: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, Kb), lambda b, o: (o, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nkt2, st_rows, TO), lambda b, o: (0, 0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, TO), lambda b, o: (b, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * O * K,
                bytes_accessed=O * K // 2 + Bp * K * 2 + Bp * O * 2,
                transcendentals=0,
            ),
        )(x2, qweight, scales_b)
        return out[:B]
    matmul.__name__ = name
    return matmul


def _byte_scales(scales):
    """(O, K//g) → (nkt2, 4, O): [s_lo, s_hi/16, 8 s_lo, unused]."""
    st = scales.astype(jnp.float32).T            # (K//g, O)
    ng, O = st.shape
    st = st.reshape(ng // 2, 2, O)
    folded = jnp.stack([st[:, 0], st[:, 1] / 16.0], axis=1)
    return jnp.concatenate([folded, st * 8.0], axis=1)


def make_bytes(name):
    @functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
    def matmul(x, qweight, scales_b, group_size=128, block_o=2048):
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        B = x2.shape[0]
        O, Kb = qweight.shape
        TO = min(block_o, O)
        while O % TO:
            TO //= 2
        TB = min(max(16, -(-B // 16) * 16), 256)
        Bp = -(-B // TB) * TB
        if Bp != B:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
        nkt2 = K // (2 * group_size)
        grid = (Bp // TB, O // TO)
        out = pl.pallas_call(
            functools.partial(_bytes_kernel, group_size=group_size),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, K), lambda b, o: (b, 0),
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
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * O * K,
                bytes_accessed=O * K // 2 + Bp * K * 2 + Bp * O * 2,
                transcendentals=0,
            ),
        )(x2, qweight, scales_b)
        return out[:B]
    matmul.__name__ = name
    return matmul


# ---------------------------------------------------------------- timing

def _run(f, *args, iters=4):
    _ = float(f(*args))
    best = 1e9
    for _i in range(iters):
        t0 = time.perf_counter()
        s = f(*args)
        _ = float(s)
        best = min(best, time.perf_counter() - t0)
    return best


def _slope(make, *args, T=64):
    t1 = _run(make(T), *args)
    t2 = _run(make(2 * T), *args)
    return (t2 - t1) / (T * R)


def time_variant(fn, x, qws, scs, g, block_o, nbytes):
    def make(T):
        @jax.jit
        def f(x, qws, scs):
            def outer(i, c):
                def body(c, qs):
                    qw, sc = qs
                    xx = (x + c * jnp.float32(1e-24)).astype(jnp.bfloat16)
                    y = fn(xx, qw, sc, g, block_o)
                    return c + jnp.sum(y) * jnp.float32(1e-12), None
                c, _ = lax.scan(body, c, (qws, scs))
                return c
            return lax.fori_loop(0, T, outer, jnp.float32(0))
        return f
    per = _slope(make, x, qws, scs)
    return nbytes / per / 1e9, per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--O", type=int, default=14336)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--g", type=int, default=128)
    args = ap.parse_args()
    O, K, B, g = args.O, args.K, args.B, args.g

    key = jax.random.PRNGKey(0)
    codes = [jax.random.randint(jax.random.fold_in(key, i), (O, K), 0, 16,
                                jnp.int32) for i in range(R)]
    qws = jnp.stack([pack_w4_planes(c, g) for c in codes])
    scs_raw = jax.random.uniform(jax.random.PRNGKey(7), (R, O, K // g),
                                 jnp.float32, 0.005, 0.02)
    x = jax.random.normal(key, (B, K), jnp.bfloat16)
    nbytes = O * K // 2 + O * (K // g) * 4

    # correctness vs the XLA reference
    ref = w4a16_matmul_ref(x, qws[0], scs_raw[0], g)
    scf = jnp.stack([_folded_scales(scs_raw[i], g) for i in range(R)])

    results = {}

    def report(name, rate, per, rel=None):
        results[name] = {"gbs": round(rate, 1), "us": round(per * 1e6, 1)}
        msg = f"{name:18s}: {rate:7.1f} GB/s  {per*1e6:7.1f} us"
        if rel is not None:
            results[name]["max_rel_err"] = round(rel, 6)
            msg += f"  rel_err {rel:.2e}"
        print(msg, flush=True)

    base_fn = lambda xx, qw, sc, gg, bo: w4a16_matmul(xx, qw, sc, gg, bo)
    rate, per = time_variant(base_fn, x, qws, scs_raw, g, 2048, nbytes)
    report("base", rate, per)

    # --- candidates
    variants = {
        "mask": make_variant(_adapt(_mask_kernel), "mask"),
        "fullk": make_fullk("fullk"),
    }
    for name, fn in variants.items():
        y = fn(x, qws[0], scf[0], g, 2048)
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
        for block_o in (2048, 4096, 7168):
            rate, per = time_variant(fn, x, qws, scf, g, block_o, nbytes)
            report(f"{name}_to{block_o}", rate, per, rel)

    # --- int8-pair layout
    qbs = jnp.stack([pack_w4_bytes(c) for c in codes])
    scb = jnp.stack([_byte_scales(scs_raw[i]) for i in range(R)])
    bfn = make_bytes("bytes")
    y = bfn(x, qbs[0], scb[0], g, 2048)
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
    for block_o in (1024, 2048):
        rate, per = time_variant(bfn, x, qbs, scb, g, block_o, nbytes)
        report(f"bytes_to{block_o}", rate, per, rel)

    # --- both-nibbles-signed variant (no corrections at all)
    qb2 = jnp.stack([pack_w4_bytes2(c) for c in codes])
    sc2 = jnp.stack([_byte2_scales(scs_raw[i]) for i in range(R)])
    b2fn = make_bytes_like(_bytes2_kernel, "bytes2", st_rows=2)
    y = b2fn(x, qb2[0], sc2[0], g, 2048)
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    rel2 = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
    for block_o in (1024, 2048):
        rate, per = time_variant(b2fn, x, qb2, sc2, g, block_o, nbytes)
        report(f"bytes2_to{block_o}", rate, per, rel2)

    # --- batch sweep on the winner
    for Bs in (8, 16, 64):
        xb = jax.random.normal(key, (Bs, K), jnp.bfloat16)
        rate, per = time_variant(b2fn, xb, qb2, sc2, g, 2048, nbytes)
        report(f"bytes2_b{Bs}", rate, per)

    # --- DMA floor for the byte layout
    dfn = make_bytes_like(_bytes_dmaonly_kernel, "bytes_dma", st_rows=2)
    rate, per = time_variant(dfn, x, qb2, sc2, g, 2048, nbytes)
    report("bytes_dmaonly", rate, per)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
