"""Split the W4 kernel's 96 us into DMA / MXU-dots / VPU-extraction.

dotsonly: same grid + same weight DMA + same 8 (B,g)@(g,TO) dots per
k-tile, but against a constant bf16 tile (no extraction).
base:     the real kernel.
dma:      handled by scripts/dma_floor.py (41-45 us).

dots cost ~= dotsonly - dma_floor; extraction+epilogue ~= base - dotsonly.
"""

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

from autoround_tpu.ops.qmatmul import pack_w4_planes, w4a16_matmul  # noqa

R = 8
T = 96
PLANES = 8


def _dots_kernel(x_ref, w_ref, wc_ref, st_ref, o_ref, acc_ref, *,
                 group_size: int):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    _ = w_ref[0:8, 0:128]  # weight DMA still arrives (BlockSpec fetch)
    wq = wc_ref[:]                                     # (TO, g) bf16 const
    acc = acc_ref[:]
    for j in range(PLANES):
        xg = x_ref[:, pl.ds(j * group_size, group_size)]
        partial = jax.lax.dot_general(
            xg, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (partial - 8.0 * xs) * st_ref[j, :][None, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_o"))
def dots_matmul(x, qweight, wconst, scales_t, group_size=128, block_o=2048):
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    O = qweight.shape[0]
    TK = PLANES * group_size
    TO = block_o
    TB = min(max(16, -(-B // 16) * 16), 256)
    Bp = -(-B // TB) * TB
    grid = (Bp // TB, O // TO, K // TK)
    out = pl.pallas_call(
        functools.partial(_dots_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda b, o, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, group_size), lambda b, o, k: (o, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, group_size), lambda b, o, k: (0, 0),
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
    )(x2, qweight, wconst, scales_t)
    return out[:B]


def main():
    O, K, B, g = 14336, 4096, 32, 128
    key = jax.random.PRNGKey(0)
    qws = jnp.stack([pack_w4_planes(
        jax.random.randint(jax.random.fold_in(key, i), (O, K), 0, 16,
                           jnp.int32), g) for i in range(R)])
    x = jax.random.normal(key, (B, K), jnp.bfloat16)
    scs = jax.random.uniform(jax.random.PRNGKey(7), (R, O, K // g),
                             jnp.float32, 0.005, 0.02)
    scs_t = jnp.stack([s.T for s in scs])
    wconst = jax.random.normal(jax.random.PRNGKey(3), (2048, g),
                               jnp.bfloat16)
    nbytes = O * K // 2 + O * (K // g) * 4

    def make_loop(fn, Tn):
        @jax.jit
        def f(x, *ws):
            def outer(i, c):
                def body(c, ws_i):
                    xx = (x + c * jnp.float32(1e-24)).astype(jnp.bfloat16)
                    y = fn(xx, *ws_i)
                    return c + jnp.sum(y) * jnp.float32(1e-12), None
                c, _ = lax.scan(body, c, ws)
                return c
            return lax.fori_loop(0, Tn, outer, jnp.float32(0))
        return f

    base_fn = lambda xx, qw, sc: w4a16_matmul(xx, qw, sc, g, 2048)
    dots_fn = lambda xx, qw, st: dots_matmul(xx, qw, wconst, st, g, 2048)
    cases = {
        "base": (make_loop(base_fn, T), make_loop(base_fn, 2 * T),
                 (x, qws, scs)),
        "dotsonly": (make_loop(dots_fn, T), make_loop(dots_fn, 2 * T),
                     (x, qws, scs_t)),
    }
    times = {n: {0: [], 1: []} for n in cases}
    for n, (fT, f2T, d) in cases.items():
        _ = float(fT(*d)); _ = float(f2T(*d))
    for rep in range(5):
        for n, (fT, f2T, d) in cases.items():
            for i, f in enumerate((fT, f2T)):
                t0 = time.perf_counter()
                _ = float(f(*d))
                times[n][i].append(time.perf_counter() - t0)
    out = {}
    for n in cases:
        t1 = float(np.median(times[n][0]))
        t2 = float(np.median(times[n][1]))
        per = (t2 - t1) / (T * R)
        out[n] = {"gbs": round(nbytes / per / 1e9, 1),
                  "us": round(per * 1e6, 1)}
        print(f"{n:10s}: {out[n]['gbs']:7.1f} GB/s  {out[n]['us']:7.1f} us",
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
