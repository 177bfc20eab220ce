"""Robust A/B timing for W4 kernel candidates (round 4).

The single-slope method in kernel_lab.py shows ~1.5x inter-run variance
(chip clock-state shifts between the T and 2T measurements corrupt the
slope).  Here: for each variant, measure f(T) and f(2T) with
median-of-N timings, INTERLEAVED across variants within each repeat so
clock drift hits all variants equally; report median slope across
repeats.
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

from autoround_tpu.ops.qmatmul import (  # noqa: E402
    pack_w4_planes, w4a16_matmul, w4a16_matmul_ref)
from scripts.kernel_lab import (  # noqa: E402
    pack_w4_bytes, _byte_scales, make_bytes)

R = 8
T = 96


def make_loop(fn, Tn, g, block_o):
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
        return lax.fori_loop(0, Tn, outer, jnp.float32(0))
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--O", type=int, default=14336)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()
    O, K, B, g = args.O, args.K, args.B, 128

    key = jax.random.PRNGKey(0)
    codes = [jax.random.randint(jax.random.fold_in(key, i), (O, K), 0, 16,
                                jnp.int32) for i in range(R)]
    x = jax.random.normal(key, (B, K), jnp.bfloat16)
    scs_raw = jax.random.uniform(jax.random.PRNGKey(7), (R, O, K // g),
                                 jnp.float32, 0.005, 0.02)
    nbytes = O * K // 2 + O * (K // g) * 4

    qws = jnp.stack([pack_w4_planes(c, g) for c in codes])
    qbs = jnp.stack([pack_w4_bytes(c) for c in codes])
    scb = jnp.stack([_byte_scales(s) for s in scs_raw])

    base_fn = lambda xx, qw, sc, gg, bo: w4a16_matmul(xx, qw, sc, gg, bo)
    bytes_fn = make_bytes("bytes")

    # correctness
    ref = w4a16_matmul_ref(x, qws[0], scs_raw[0], g)
    yb = bytes_fn(x, qbs[0], scb[0], g, 2048)
    rel = float(jnp.max(jnp.abs(yb.astype(jnp.float32) - ref.astype(
        jnp.float32)))) / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"bytes rel_err vs ref: {rel:.2e}", flush=True)

    cases = {
        "base": (base_fn, (x, qws, scs_raw), 2048),
        "bytes_to1024": (bytes_fn, (x, qbs, scb), 1024),
        "bytes_to2048": (bytes_fn, (x, qbs, scb), 2048),
    }
    loops = {}
    for name, (fn, data, bo) in cases.items():
        loops[name] = {Tn: (make_loop(fn, Tn, g, bo), data)
                       for Tn in (T, 2 * T)}
        for Tn in (T, 2 * T):
            f, d = loops[name][Tn]
            _ = float(f(*d))  # compile

    # interleaved repeats
    times = {name: {T: [], 2 * T: []} for name in cases}
    for rep in range(args.repeats):
        for name in cases:
            for Tn in (T, 2 * T):
                f, d = loops[name][Tn]
                t0 = time.perf_counter()
                s = f(*d)
                _ = float(s)
                times[name][Tn].append(time.perf_counter() - t0)

    out = {}
    for name in cases:
        t1 = float(np.median(times[name][T]))
        t2 = float(np.median(times[name][2 * T]))
        per = (t2 - t1) / (T * R)
        rate = nbytes / per / 1e9
        out[name] = {"gbs": round(rate, 1), "us": round(per * 1e6, 1)}
        print(f"{name:14s}: {rate:7.1f} GB/s  {per*1e6:7.1f} us  "
              f"(t1 spread {min(times[name][T])*1e3:.1f}-"
              f"{max(times[name][T])*1e3:.1f} ms)", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
