"""DMA-floor probes for the W4 weight stream (round 4).

Measures pure-DMA rates (kernel touches one VREG per block; BlockSpec
still fetches every block) for the candidate weight layouts, plus the
XLA 2-D read roof, with the interleaved median-slope harness.  This
pins how much of the W4 kernel's 96 us (31.2 MB) is DMA floor vs
compute contention.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

R = 8
T = 96
O, K = 14336, 4096


def touch_kernel(w_ref, o_ref):
    o_ref[:] = o_ref[:] * 0 + w_ref[0:8, 0:128].astype(jnp.float32)


def make_probe(shape, dtype, block, grid_of, name):
    nblk = tuple(s // b for s, b in zip(shape, block))

    def index_map(*ids):
        return ids

    probe = pl.pallas_call(
        touch_kernel,
        grid=nblk,
        in_specs=[pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda *ids: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(nblk)),
    )
    probe.__name__ = name
    return probe


def main():
    key = jax.random.PRNGKey(0)
    cases = {}

    # (a) int32 nibble-plane layout, (TO, g) strided blocks
    w32 = jax.random.randint(key, (R, O, K // 8), -2**30, 2**30, jnp.int32)
    cases["i32_strided"] = (w32, (O, K // 8), jnp.int32, (2048, 128))
    # (b) int32, full-row blocks
    cases["i32_fullrow"] = (w32, (O, K // 8), jnp.int32, (2048, K // 8))
    # (c) int8 pair layout, full-row blocks
    w8 = jax.random.randint(key, (R, O, K // 2), -127, 127, jnp.int8)
    cases["i8_fullrow"] = (w8, (O, K // 2), jnp.int8, (2048, K // 2))
    # (d) int8, strided (TO, g)
    cases["i8_strided"] = (w8, (O, K // 2), jnp.int8, (2048, 128))

    nbytes = O * K // 2          # all layouts carry the same 28.7 MB

    loops = {}
    for name, (data, shape, dtype, block) in cases.items():
        probe = make_probe(shape, dtype, block, None, name)

        def make(Tn, probe=probe):
            @jax.jit
            def f(ws):
                def outer(i, c):
                    def body(c, w):
                        y = probe(w)
                        return c + y[0, 0] * jnp.float32(1e-12), None
                    c, _ = lax.scan(body, c, ws)
                    return c
                return lax.fori_loop(0, Tn, outer, jnp.float32(0))
            return f
        loops[name] = {Tn: (make(Tn), data) for Tn in (T, 2 * T)}
        for Tn in (T, 2 * T):
            f, d = loops[name][Tn]
            _ = float(f(d))

    times = {name: {T: [], 2 * T: []} for name in cases}
    for rep in range(5):
        for name in cases:
            for Tn in (T, 2 * T):
                f, d = loops[name][Tn]
                t0 = time.perf_counter()
                _ = float(f(d))
                times[name][Tn].append(time.perf_counter() - t0)

    out = {}
    for name in cases:
        t1 = float(np.median(times[name][T]))
        t2 = float(np.median(times[name][2 * T]))
        per = (t2 - t1) / (T * R)
        out[name] = {"gbs": round(nbytes / per / 1e9, 1),
                     "us": round(per * 1e6, 1)}
        print(f"{name:12s}: {out[name]['gbs']:7.1f} GB/s  "
              f"{out[name]['us']:7.1f} us", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
