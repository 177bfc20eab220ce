"""Pallas fused dequant(int4, group scales)+matmul — the serving hot path.

Role of the reference's inference kernels (triton ``quant_matmul_248``
``auto_round_extension/triton/triton_utils/kernels.py:123``; ARK
``woqgemm`` C++), designed TPU-first rather than translated: packed int4
weights stay HBM-resident and stream through VMEM tiles; decode is
HBM-bandwidth-bound, so the win is the 4x smaller weight stream and the
dequant rides free under the DMA.

TPU-native weight layout — "nibble-plane" packing: a K-tile of width
``TK = 8 * group_size`` is stored as ``group_size`` int32 words per row;
nibble plane ``j`` of the word tile holds quantization group ``j`` of that
K-tile.  Unpacking a group is then a single vectorized ``(w >> 4j) & 0xF``
over the whole (TO, group_size) word tile — no element interleave, no
shape casts Mosaic can't lower — and each plane's scale is a (TO, 1)
broadcast.  Each plane feeds the MXU as a (B, g) @ (g, TO) partial dot
with g = 128 = the MXU's native contraction.

Codes are sym full-range: dq = (code - 8) * scale, scale sign carries the
full-range flip (dtypes/intq.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_w4_planes", "unpack_w4_planes", "w4a16_matmul",
           "w4a16_matmul_ref", "w4a16_matmul_grouped",
           "w4a16_matmul_grouped_ref", "PLANES"]

PLANES = 8  # int4 codes per int32 word


def pack_w4_planes(codes: jax.Array, group_size: int = 128) -> jax.Array:
    """(O, K) uint codes < 16 → (O, K//8) int32 in nibble-plane layout.

    K-tile t (width 8g) stores logical column ``t*8g + j*g + i`` in nibble
    ``j`` of word ``t*g + i``.
    """
    O, K = codes.shape
    TK = PLANES * group_size
    assert K % TK == 0, f"K={K} must be a multiple of 8*group_size={TK}"
    c = codes.astype(jnp.uint32).reshape(O, K // TK, PLANES, group_size)
    shifts = (jnp.arange(PLANES, dtype=jnp.uint32) * 4)[None, None, :, None]
    words = jnp.sum(c << shifts, axis=2, dtype=jnp.uint32)  # (O, K//TK, g)
    return words.reshape(O, K // PLANES).astype(jnp.int32)


def unpack_w4_planes(words: jax.Array, group_size: int = 128) -> jax.Array:
    """Inverse of :func:`pack_w4_planes` → (O, K) int32 codes."""
    O, Kw = words.shape
    g = group_size
    w = words.astype(jnp.uint32).reshape(O, Kw // g, 1, g)
    shifts = (jnp.arange(PLANES, dtype=jnp.uint32) * 4)[None, None, :, None]
    codes = (w >> shifts) & 0xF
    return codes.reshape(O, Kw * PLANES).astype(jnp.int32)


def w4a16_matmul_ref(x, qweight, scales, group_size: int = 128):
    """Pure-XLA fallback (CPU tests / shapes the kernel doesn't cover)."""
    O, Kw = qweight.shape
    K = Kw * PLANES
    codes = unpack_w4_planes(qweight, group_size)
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=1)[:, :K]
    w = ((codes - 8).astype(jnp.float32) * s).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *, group_size: int):
    """st_ref: transposed scales block (PLANES, TO) — plane j's scale row.

    The group scale is constant along the contraction, so it factors out
    of the dot: acc += (x_g @ codes^T - 8*sum(x_g)) * s_row.  This keeps
    the MXU inputs exact small ints in bf16 (no pre-scaled rounding) and
    turns the scale into one (B, TO) row broadcast instead of a (TO, g)
    multiply.  The -8 zero point rides a row-sum correction instead of a
    per-element subtract — dropping one VPU op per weight measured ~10%
    end-to-end on the VPU-bound dequant chain (the kernel is extraction-
    bound, not DMA- or MXU-bound, at decode batch sizes).

    Grid is (batch tiles, O tiles, K tiles) — batch tiling keeps prefill
    calls (B = prompts x seq rows) within VMEM.
    """
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]                                  # (TO, g) int32
    acc = acc_ref[:]
    for j in range(PLANES):
        chunk = jax.lax.shift_right_logical(words, 4 * j) & 0xF
        wq = chunk.astype(jnp.bfloat16)               # codes 0..15 exact
        xg = x_ref[:, pl.ds(j * group_size, group_size)].astype(
            jnp.bfloat16)                                           # (B, g)
        partial = jax.lax.dot_general(
            xg, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # (B, TO)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # (B, 1)
        acc = acc + (partial - 8.0 * xs) * st_ref[j, :][None, :].astype(
            jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
def w4a16_matmul(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    group_size: int = 128,
    block_o: int = 2048,
) -> jax.Array:
    """y = x @ dequant(qweight).T.

    x (..., K) bf16; qweight (O, K//8) int32 nibble-plane layout;
    scales (O, K//g).  Requires g >= 128 (lane tiling) — smaller groups
    fall back to the XLA path.
    """
    orig_shape = x.shape
    K = orig_shape[-1]
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    O = qweight.shape[0]
    assert qweight.shape[1] * PLANES == K, (qweight.shape, K)

    TK = PLANES * group_size
    usable = (jax.devices()[0].platform == "tpu" and group_size >= 128
              and K % TK == 0 and O % 256 == 0)
    if not usable:
        return w4a16_matmul_ref(x2, qweight, scales, group_size).reshape(
            *orig_shape[:-1], O)

    TO = min(block_o, O)
    while O % TO:
        TO //= 2

    # batch tiling: decode batches fit one tile; prefill (B = prompts x
    # seq) CHUNKS at the JAX level (lax.map over 512-row tiles) instead
    # of a batch grid dim: the chipless AOT compile helper promotes
    # whole custom-call operands <= 16 MB into scoped VMEM, and a
    # (2048, K) prefill operand plus the kernel's buffers blows its
    # 16 MB stack limit (measured); per-chunk operands stay a few MB.
    # TB=256: kernel buffers (~7.6 MB double-buffered) + the helper's
    # staged per-chunk operand must fit the 16 MB scoped-vmem limit
    # (TB=512's ~12 MB of buffers + 4 MB operand measured 16.58 MB)
    TB = min(max(16, -(-B // 16) * 16), 256)
    Bp = -(-B // TB) * TB
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))

    # scales transposed to (K//g, O): plane-row layout for the kernel
    scales_t = scales.astype(jnp.float32).T

    def one_tile(xt):
        return pl.pallas_call(
            functools.partial(_kernel, group_size=group_size),
            grid=(1, O // TO, K // TK),
            in_specs=[
                pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, group_size), lambda b, o, k: (o, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PLANES, TO), lambda b, o, k: (k, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, TO), lambda b, o, k: (b, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TB, O), x.dtype),
            scratch_shapes=[pltpu.VMEM((TB, TO), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * TB * O * K,
                bytes_accessed=O * K // 2 + TB * K * 2 + TB * O * 2,
                transcendentals=0,
            ),
        )(xt, qweight, scales_t)

    if Bp == TB:
        out = one_tile(x2)
    else:
        # Python-unrolled chunk loop: lax.map's stacked operand is the
        # full (Bp, K) activation again, which the AOT helper promotes
        # into scoped VMEM (same 16 MB failure); per-slice operands
        # are 4 MB and promote safely
        outs = [one_tile(jax.lax.dynamic_slice_in_dim(x2, i * TB, TB, 0))
                for i in range(Bp // TB)]
        out = jnp.concatenate(outs, axis=0)
    return out[:B].reshape(*orig_shape[:-1], O)


def w4a16_matmul_grouped_ref(x, qweight, scales, group_size: int = 128):
    """Pure-XLA grouped fallback: x (E, C, K), qweight (E, O, K//8),
    scales (E, O, K//g) → (E, C, O)."""
    return jax.vmap(
        lambda xe, qe, se: w4a16_matmul_ref(xe, qe, se, group_size)
    )(x, qweight, scales)


def _grouped_kernel(x_ref, w_ref, st_ref, o_ref, acc_ref, *,
                    group_size: int):
    """Per-expert tile of the nibble-plane dequant-matmul (leading grid
    dim selects the expert; body identical to :func:`_kernel`)."""
    k = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[0]                                  # (TO, g) int32
    acc = acc_ref[:]
    for j in range(PLANES):
        chunk = jax.lax.shift_right_logical(words, 4 * j) & 0xF
        wq = chunk.astype(jnp.bfloat16)               # codes 0..15 exact
        xg = x_ref[0, :, pl.ds(j * group_size, group_size)].astype(
            jnp.bfloat16)
        partial = jax.lax.dot_general(
            xg, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (partial - 8.0 * xs) * st_ref[0, j, :][None, :].astype(
            jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
def w4a16_matmul_grouped(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    group_size: int = 128,
    block_o: int = 2048,
) -> jax.Array:
    """Grouped (MoE) fused dequant-matmul: y[e] = x[e] @ dq(qweight[e]).T.

    x (E, C, K) bf16 token slabs (capacity dispatch), qweight
    (E, O, K//8) int32 nibble-plane, scales (E, O, K//g) → (E, C, O).
    Role of the reference's MoE grouped GEMMs (ARK SYCL MoE,
    ``auto_round_extension/ark`` feature matrix): every expert's packed
    weights stream once per step regardless of routing, and the C-token
    slabs ride the same MXU tiles — one kernel call for all E experts
    instead of E launches.
    """
    E, C, K = x.shape
    O = qweight.shape[1]
    TK = PLANES * group_size
    usable = (jax.devices()[0].platform == "tpu" and group_size >= 128
              and group_size % 128 == 0 and K % TK == 0 and O % 256 == 0)
    if not usable:
        return w4a16_matmul_grouped_ref(x, qweight, scales, group_size)

    TO = min(block_o, O)
    while O % TO:
        TO //= 2
    TB = max(16, -(-C // 16) * 16)
    xp = jnp.pad(x, ((0, 0), (0, TB - C), (0, 0))) if TB != C else x
    # (E, K//g, O) plane-row scales
    scales_t = scales.astype(jnp.float32).transpose(0, 2, 1)

    grid = (E, 1, O // TO, K // TK)
    out = pl.pallas_call(
        functools.partial(_grouped_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TB, TK), lambda e, b, o, k: (e, b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO, group_size), lambda e, b, o, k: (e, o, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PLANES, TO), lambda e, b, o, k: (e, k, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TB, TO), lambda e, b, o, k: (e, b, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, TB, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((TB, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * TB * O * K,
            bytes_accessed=E * (O * K // 2 + TB * K * 2 + TB * O * 2),
            transcendentals=0,
        ),
    )(xp, qweight, scales_t)
    return out[:, :C]
