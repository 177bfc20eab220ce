"""Shard-shape W4 kernel measurements for the TP scaling model
(VERDICT r4 item 6: the model divided the measured single-chip step by
tp — per-shard matmuls at K/tp, O/tp are smaller tiles that need not
hold the single-chip HBM utilization).

For tp in {1, 2, 4, 8}, times the PRODUCTION ``w4a16_matmul`` at the
per-shard shapes of every Llama-3-8B projection exactly as the TP
engine shards them (column-parallel q/k/v/gate/up: O/tp; row-parallel
o/down: K/tp; vocab-sharded head: V/tp), decode batch 32.  Shards the
kernel gate rejects (O % 256 != 0 — the engine's documented dense
fallback) are timed through the dense bf16 path instead, and flagged.

Slope-based on-device timing with R weight replicas (same methodology
as scripts/kernel_lab.py — the scan over replicas defeats HBM caching).

Writes docs/kernel_shard.json; scripts/scaling_model.py consumes it in
place of the /tp assumption.

Run on the real chip:  python scripts/kernel_shard.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from autoround_tpu.ops.qmatmul import pack_w4_planes, w4a16_matmul  # noqa: E402

R = 4          # weight replicas per measurement (defeats HBM caching)
G = 128

# llama3-8b projection shapes (O, K)
SHAPES = {
    "q_proj": (4096, 4096, "col"),
    "k_proj": (1024, 4096, "col"),
    "v_proj": (1024, 4096, "col"),
    "o_proj": (4096, 4096, "row"),
    "gate_proj": (14336, 4096, "col"),
    "up_proj": (14336, 4096, "col"),
    "down_proj": (4096, 14336, "row"),
}
HEAD = (128256, 4096)   # vocab-sharded lm_head (col)


def _run(f, *args, iters=4):
    _ = float(f(*args))
    best = 1e9
    for _i in range(iters):
        t0 = time.perf_counter()
        s = f(*args)
        _ = float(s)
        best = min(best, time.perf_counter() - t0)
    return best


def _slope(make, *args, T=32):
    t1 = _run(make(T), *args)
    t2 = _run(make(2 * T), *args)
    return (t2 - t1) / (T * R)


def _slope_for(nbytes):
    """Scale the loop count so every measurement spans >= ~80 ms of
    device time — the small shards (k/v at 0.5-2 MB) were pure noise at
    T=32 (one came out NEGATIVE)."""
    target_s = 0.08
    per_iter_est = max(nbytes / 400e9, 2e-6) * R   # ~400 GB/s guess
    T = max(32, int(target_s / per_iter_est / 2) or 32)
    return min(T, 4096)


def time_packed(O, K, B=32, T=32):
    """Per-call seconds of w4a16_matmul at (B, K) x (O, K) g128."""
    key = jax.random.PRNGKey(O * 131 + K)
    codes = [jax.random.randint(jax.random.fold_in(key, i), (O, K), 0, 16,
                                jnp.int32) for i in range(R)]
    qws = jnp.stack([pack_w4_planes(c, G) for c in codes])
    scs = jax.random.uniform(jax.random.PRNGKey(7), (R, O, K // G),
                             jnp.float32, 0.005, 0.02)
    x = jax.random.normal(key, (B, K), jnp.bfloat16)

    def make(T):
        @jax.jit
        def f(x, qws, scs):
            def outer(i, c):
                def body(c, qs):
                    qw, sc = qs
                    xx = (x + c * jnp.float32(1e-24)).astype(jnp.bfloat16)
                    y = w4a16_matmul(xx, qw, sc, G)
                    return c + jnp.sum(y) * jnp.float32(1e-12), None
                c, _ = lax.scan(body, c, (qws, scs))
                return c
            return lax.fori_loop(0, T, outer, jnp.float32(0))
        return f
    return _slope(make, x, qws, scs, T=T)


def time_dense(O, K, B=32, T=32):
    """Dense bf16 fallback path (what sub-tile shards actually serve)."""
    key = jax.random.PRNGKey(O * 177 + K)
    ws = jax.random.normal(key, (R, O, K), jnp.bfloat16) * 0.02
    x = jax.random.normal(key, (B, K), jnp.bfloat16)

    def make(T):
        @jax.jit
        def f(x, ws):
            def outer(i, c):
                def body(c, w):
                    xx = (x + c * jnp.float32(1e-24)).astype(jnp.bfloat16)
                    y = jnp.einsum("bk,ok->bo", xx, w)
                    return c + jnp.sum(y) * jnp.float32(1e-12), None
                c, _ = lax.scan(body, c, ws)
                return c
            return lax.fori_loop(0, T, outer, jnp.float32(0))
        return f
    return _slope(make, x, ws, T=T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/kernel_shard.json")
    ap.add_argument("--bs", type=int, default=32)
    args = ap.parse_args()

    out = {"bs": args.bs, "group_size": G, "replicas": R,
           "per_tp": {}}
    for tp in (1, 2, 4, 8):
        entry = {"matmuls_us": {}, "dense_fallback": []}
        total = 0.0
        for name, (O, K, par) in SHAPES.items():
            Os = O // tp if par == "col" else O
            Ks = K // tp if par == "row" else K
            # mirror the ENGINE's actual policy (serve/tp_engine.py
            # _reshard_row_layers): row shards PAD K up to the 8*g tile
            # and run the kernel on the padded shard; column shards
            # below the O tile serve dense
            Ks_pad = -(-Ks // (8 * G)) * (8 * G) if par == "row" else Ks
            kernel_ok = (Os % 256 == 0 and Ks_pad % (8 * G) == 0)
            if kernel_ok:
                t = time_packed(Os, Ks_pad, args.bs,
                                T=_slope_for(Os * Ks_pad // 2))
                tag = ("kernel" if Ks_pad == Ks
                       else f"kernel K->{Ks_pad}")
                if Ks_pad != Ks:
                    entry.setdefault("padded", []).append(
                        f"{name}: K {Ks}->{Ks_pad}")
            else:
                t = time_dense(Os, Ks, args.bs,
                               T=_slope_for(Os * Ks * 2))
                tag = "DENSE"
                entry["dense_fallback"].append(
                    f"{name} ({Os}x{Ks}): O%256={Os % 256}")
            entry["matmuls_us"][name] = round(t * 1e6, 2)
            total += t
            print(f"tp={tp} {name}: ({Os},{Ks}) {tag} "
                  f"{t*1e6:.1f} us", flush=True)
        Vh, Kh = HEAD
        Vs = Vh // tp
        # vocab shards stay 256-aligned for every tp here (128256/8 =
        # 16032 = 62*256 + 160 -> NOT aligned at tp=8; engine pads)
        Vs_pad = -(-Vs // 256) * 256
        th = time_packed(Vs_pad, Kh, args.bs)
        entry["head_us"] = round(th * 1e6, 2)
        entry["head_shape"] = [Vs_pad, Kh]
        entry["block_sum_us"] = round(total * 1e6, 2)
        out["per_tp"][str(tp)] = entry
        t1 = out["per_tp"].get("1")
        if t1 and tp > 1:
            ideal = t1["block_sum_us"] / tp
            entry["vs_ideal_div_tp"] = round(
                entry["block_sum_us"] / ideal, 3)
        print(f"tp={tp}: block matmuls {total*1e6:.1f} us, "
              f"head {th*1e6:.1f} us", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
