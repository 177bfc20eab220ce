"""Prefill / time-to-first-token benchmark for the flagship W4A16 engine.

Measures prompt-processing throughput (prefill tok/s) and TTFT (prefill
latency + one decode step) for the Llama-3-8B-class packed engine on a
bs x seq grid, against the BF16 baseline extrapolated affinely in layer
count (the full BF16 8B does not fit the 16 GB chip — same method as
bench.py / scripts/e2e_flagship.py).

Prefill is MXU-bound (decode is HBM-bound), so the W4-vs-BF16 story is
different from decode: dequant adds VPU work per tile but the weight
stream is 4x smaller.  Both effects are measured, not argued.

Usage:
  python scripts/bench_prefill.py [--preset llama3-8b] \
      [--grid 1x2048,8x512] [--out docs/prefill_r03.json]

Writes one JSON document with per-point prefill_tok_s / ttft_ms and the
BF16 comparison.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_prefill(engine, ids, reps=3):
    """Median prefill latency; one decode step gives TTFT. Warm first."""
    import jax.numpy as jnp

    logits, cache = engine.prefill(ids)           # compile prefill
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    d_logits, _ = engine.decode_step(tok, cache)  # compile decode
    _ = float(np.asarray(d_logits[0, 0]))         # force completion
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        logits, cache = engine.prefill(ids)
        _ = float(np.asarray(logits[0, 0]))
        ts.append(time.perf_counter() - t0)
    t_pre = sorted(ts)[len(ts) // 2]
    t0 = time.perf_counter()
    logits, cache = engine.prefill(ids)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    d_logits, _ = engine.decode_step(tok, cache)
    _ = float(np.asarray(d_logits[0, 0]))
    t_ttft = time.perf_counter() - t0
    return t_pre, t_ttft


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3-8b")
    ap.add_argument("--grid", default="1x2048,8x512")
    ap.add_argument("--bf16-layers", default="16,4",
                    help="layer counts for the affine BF16 extrapolation; "
                         "empty to skip the baseline")
    ap.add_argument("--prefill-a8", action="store_true",
                    help="opt-in int8-MXU prompt mode (engine.prefill_a8)")
    ap.add_argument("--out", default="docs/prefill_r03.json")
    args = ap.parse_args()

    import jax

    from bench import make_bf16_engine, make_packed_engine
    from autoround_tpu.models import llama

    cfg = llama.CONFIG_PRESETS[args.preset]
    grid = []
    for part in args.grid.split(","):
        bs, seq = part.lower().split("x")
        grid.append((int(bs), int(seq)))
    max_seq = max(s for _, s in grid) + 8

    out = {"preset": args.preset, "grid": args.grid, "points": []}
    key = jax.random.PRNGKey(0)

    eng = make_packed_engine(cfg, max_seq, key)
    if args.prefill_a8:
        eng.prefill_a8 = True
        out["prefill_a8"] = True
    for bs, seq in grid:
        ids = jax.device_put(np.random.default_rng(3).integers(
            0, cfg.vocab_size, (bs, seq)).astype(np.int32))
        t_pre, t_ttft = time_prefill(eng, ids)
        out["points"].append({
            "bs": bs, "seq": seq,
            "w4_prefill_ms": round(t_pre * 1e3, 2),
            "w4_prefill_tok_s": round(bs * seq / t_pre, 1),
            "w4_ttft_ms": round(t_ttft * 1e3, 2),
        })
        print(json.dumps(out["points"][-1]), flush=True)
    del eng

    if args.bf16_layers:
        layer_counts = [int(x) for x in args.bf16_layers.split(",")]
        for bs, seq in grid:
            ids = jax.device_put(np.random.default_rng(3).integers(
                0, cfg.vocab_size, (bs, seq)).astype(np.int32))
            ts = {}
            for L in layer_counts:
                cfgL = dataclasses.replace(cfg, num_layers=L)
                engL = make_bf16_engine(cfgL, max_seq, key)
                ts[L], _ = time_prefill(engL, ids, reps=3)
                del engL
            L0, L1 = layer_counts[0], layer_counts[-1]
            slope = (ts[L0] - ts[L1]) / (L0 - L1)
            t_bf16 = ts[L0] + slope * (cfg.num_layers - L0)
            for p in out["points"]:
                if p["bs"] == bs and p["seq"] == seq:
                    p["bf16_prefill_ms_extrapolated"] = round(t_bf16 * 1e3, 2)
                    p["bf16_layer_points_ms"] = {
                        str(L): round(t * 1e3, 2) for L, t in ts.items()}
                    p["w4_vs_bf16_prefill"] = round(
                        t_bf16 * 1e3 / p["w4_prefill_ms"], 3)
                    print(json.dumps(p), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
