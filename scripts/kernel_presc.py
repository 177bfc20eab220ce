"""Prescaled-scratch W4 kernel candidate (round 4).

DMA floor measured 41-45 us for the 28.7 MB weight stream; the serving
kernel takes ~96 us → ~50 us of compute rides on top.  The per-plane
schedule issues 224 (B,128)@(128,2048) dots per layer (poor MXU
occupancy at B=32) plus 3 VPU ops on (B, TO) per plane for scales and
zero-point.  This candidate extracts nibbles, applies the group scale
DURING extraction (bf16, matching w4a16_matmul_ref's rounding), stores
into a (TO, K) bf16 scratch, then issues ONE (B, K)@(K, TO) dot — no
scale epilogue, 8x fewer/bigger dots.

Layout: int8 byte pairs (lo plain nibble, hi nibble XOR 8 so signed
(b & 0xF0) = 16*(hi-8) — see kernel_lab.pack_w4_bytes).
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

from autoround_tpu.ops.qmatmul import (  # noqa: E402
    pack_w4_planes, w4a16_matmul, w4a16_matmul_ref)
from scripts.kernel_lab import pack_w4_bytes  # noqa: E402

R = 8
T = 96


def _presc_kernel(x_ref, w_ref, sl_ref, sh_ref, o_ref, wsc_ref, *,
                  group_size: int):
    """w_ref (TO, K/2) int8 full rows; sl_ref/sh_ref (TO, nkt2) f32:
    lo scales and hi scales/16 per 2-group tile; scratch (TO, K) bf16."""
    g = group_size
    nkt2 = sl_ref.shape[1]
    for t in range(nkt2):
        byts = w_ref[:, pl.ds(t * g, g)]                  # (TO, g) i8
        s_lo = sl_ref[:, t][:, None].astype(jnp.bfloat16)  # (TO, 1)
        s_hi = sh_ref[:, t][:, None].astype(jnp.bfloat16)
        lo = (byts & jnp.int8(0xF)).astype(jnp.bfloat16)   # 0..15
        hi = (byts & jnp.int8(-16)).astype(jnp.bfloat16)   # 16*(code-8)
        wsc_ref[:, pl.ds((2 * t) * g, g)] = (lo - 8.0) * s_lo
        wsc_ref[:, pl.ds((2 * t + 1) * g, g)] = hi * s_hi
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], wsc_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make_presc(name, block_o=512):
    @functools.partial(jax.jit, static_argnames=("group_size", "bo"))
    def matmul(x, qweight, sl, sh, group_size=128, bo=block_o):
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        B = x2.shape[0]
        O, Kb = qweight.shape
        TO = min(bo, O)
        while O % TO:
            TO //= 2
        TB = min(max(16, -(-B // 16) * 16), 256)
        Bp = -(-B // TB) * TB
        if Bp != B:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
        nkt2 = K // (2 * group_size)
        grid = (Bp // TB, O // TO)
        out = pl.pallas_call(
            functools.partial(_presc_kernel, group_size=group_size),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, K), lambda b, o: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, Kb), lambda b, o: (o, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, nkt2), lambda b, o: (o, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, nkt2), lambda b, o: (o, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, TO), lambda b, o: (b, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, O), x.dtype),
            scratch_shapes=[pltpu.VMEM((TO, K), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * O * K,
                bytes_accessed=O * K // 2 + Bp * K * 2 + Bp * O * 2,
                transcendentals=0,
            ),
        )(x2, qweight, sl, sh)
        return out[:B]
    matmul.__name__ = name
    return matmul


def _split_scales(scales):
    """(O, K//g) → lo scales (O, nkt2), hi scales/16 (O, nkt2)."""
    s = scales.astype(jnp.float32)
    O, ng = s.shape
    s = s.reshape(O, ng // 2, 2)
    return s[:, :, 0], s[:, :, 1] / 16.0


def main():
    O, K, B, g = 14336, 4096, 32, 128
    key = jax.random.PRNGKey(0)
    codes = [jax.random.randint(jax.random.fold_in(key, i), (O, K), 0, 16,
                                jnp.int32) for i in range(R)]
    x = jax.random.normal(key, (B, K), jnp.bfloat16)
    scs_raw = jax.random.uniform(jax.random.PRNGKey(7), (R, O, K // g),
                                 jnp.float32, 0.005, 0.02)
    nbytes = O * K // 2 + O * (K // g) * 4

    qws = jnp.stack([pack_w4_planes(c, g) for c in codes])
    qbs = jnp.stack([pack_w4_bytes(c) for c in codes])
    sls, shs = zip(*[_split_scales(s) for s in scs_raw])
    sls, shs = jnp.stack(sls), jnp.stack(shs)

    ref = w4a16_matmul_ref(x, qws[0], scs_raw[0], g)

    def time_case(loop_fns):
        # loop_fns: {name: (f_T, f_2T, data)}
        times = {n: {0: [], 1: []} for n in loop_fns}
        for n, (fT, f2T, d) in loop_fns.items():
            _ = float(fT(*d)); _ = float(f2T(*d))
        for rep in range(5):
            for n, (fT, f2T, d) in loop_fns.items():
                for i, f in enumerate((fT, f2T)):
                    t0 = time.perf_counter()
                    _ = float(f(*d))
                    times[n][i].append(time.perf_counter() - t0)
        out = {}
        for n in loop_fns:
            t1 = float(np.median(times[n][0]))
            t2 = float(np.median(times[n][1]))
            per = (t2 - t1) / (T * R)
            out[n] = per
        return out

    def make_loop(fn, Tn, nargs):
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

    cases = {}
    base_fn = lambda xx, qw, sc: w4a16_matmul(xx, qw, sc, g, 2048)
    cases["base"] = (make_loop(base_fn, T, 2), make_loop(base_fn, 2 * T, 2),
                     (x, qws, scs_raw))
    for bo in (256, 512, 1024):
        fn = make_presc(f"presc{bo}", bo)
        pf = lambda xx, qb, sl, sh, fn=fn: fn(xx, qb, sl, sh, g)
        y = pf(x, qbs[0], sls[0], shs[0])
        rel = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                    - ref.astype(jnp.float32)))) / float(
            jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"presc{bo} rel_err {rel:.2e}", flush=True)
        cases[f"presc{bo}"] = (make_loop(pf, T, 3), make_loop(pf, 2 * T, 3),
                               (x, qbs, sls, shs))

    pers = time_case(cases)
    out = {}
    for n, per in pers.items():
        out[n] = {"gbs": round(nbytes / per / 1e9, 1),
                  "us": round(per * 1e6, 1)}
        print(f"{n:10s}: {out[n]['gbs']:7.1f} GB/s  {out[n]['us']:7.1f} us",
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
