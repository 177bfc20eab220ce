"""Flagship end-to-end run on the real chip: quantize a Llama-3-8B-class
model (W4A16 g128, default recipe) with host-offloaded FP weights, build
the packed serving engine, and measure model-level decode tok/s vs a BF16
baseline.

The BF16 32-layer model does not fit the 16 GB chip, so the baseline is
measured at 16 and 4 layers and extrapolated linearly in layer count
(t(L) = a + b*L — decode cost is affine in blocks; embed/head/dispatch is
the intercept).

Usage:
  python scripts/e2e_flagship.py --preset llama3-8b --iters 200 \
      --nsamples 128 --seqlen 2048 [--skip-quant]

Writes a JSON summary to --out (default /tmp/e2e_flagship.json).
"""

import argparse
import dataclasses
import gc
import json
import os
import sys
import time

import numpy as np

# repo root on sys.path regardless of invocation directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_init_params(cfg, seed=0):
    """Random-init the parameter pytree as HOST numpy bf16 (init_params
    would allocate on the TPU — 16 GB for 8B — before offload kicks in)."""
    import ml_dtypes
    rng = np.random.default_rng(seed)
    bf16 = ml_dtypes.bfloat16
    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    shapes = {
        "q_proj": (qd, H), "k_proj": (kvd, H), "v_proj": (kvd, H),
        "o_proj": (H, qd),
        "gate_proj": (cfg.intermediate_size, H),
        "up_proj": (cfg.intermediate_size, H),
        "down_proj": (H, cfg.intermediate_size),
    }
    blocks = []
    for _ in range(cfg.num_layers):
        b = {n: (rng.standard_normal(s, np.float32) * 0.02).astype(bf16)
             for n, s in shapes.items()}
        b["input_layernorm"] = np.ones((H,), bf16)
        b["post_attention_layernorm"] = np.ones((H,), bf16)
        blocks.append(b)
    params = {
        "embed_tokens": (rng.standard_normal((cfg.vocab_size, H), np.float32)
                         * 0.02).astype(bf16),
        "norm": np.ones((H,), bf16),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = (rng.standard_normal((cfg.vocab_size, H),
                                                 np.float32) * 0.02
                             ).astype(bf16)
    return params


def time_decode(engine, ids, steps=24, reps=3):
    """Median per-step decode latency via generate_scan (on-device loop).

    Both scan lengths are compiled AND executed once before timing —
    generate_scan specializes on max_new_tokens, so an unwarmed length
    would put a 10-40 s remote compile inside the timed region.  The
    long/short difference is taken as median-of-reps: a single tunnel
    hiccup on either leg once produced a NEGATIVE step time."""
    for n in (2, 2 + steps):  # warm both executables
        toks = engine.generate_scan(ids, max_new_tokens=n)
        _ = int(np.asarray(toks[0, -1]))  # force completion (axon quirk)

    def run(n):
        t0 = time.perf_counter()
        toks = engine.generate_scan(ids, max_new_tokens=n)
        _ = int(np.asarray(toks[0, -1]))
        return time.perf_counter() - t0

    long_t = sorted(run(2 + steps) for _ in range(reps))[reps // 2]
    short_t = sorted(run(2) for _ in range(reps))[reps // 2]
    return (long_t - short_t) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3-8b")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--nsamples", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the tuning forward (the "
                         "low_gpu_mem_usage equivalent; needed to fit "
                         "8B-shape blocks at seqlen 2048 in 16 GB)")
    ap.add_argument("--decode-bs", type=int, default=32)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--out", default="/tmp/e2e_flagship.json")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--skip-quant", action="store_true")
    ap.add_argument("--profile", action="store_true",
                    help="per-phase wall-clock attribution "
                         "(AR_PROFILE_PHASES; adds phase-boundary syncs)")
    args = ap.parse_args()
    if args.profile:
        os.environ["AR_PROFILE_PHASES"] = "1"

    import jax
    import jax.numpy as jnp
    from autoround_tpu import AutoRound
    from autoround_tpu.models import llama
    from autoround_tpu.serve import QuantizedLlama

    from autoround_tpu.utils.memory import MemoryMonitor

    summary = {"preset": args.preset, "iters": args.iters,
               "nsamples": args.nsamples, "seqlen": args.seqlen,
               "tune_bs": args.bs, "grad_accum": args.grad_accum,
               "remat": bool(args.remat)}
    cfg = llama.CONFIG_PRESETS[args.preset]
    monitor = MemoryMonitor()
    print(f"== init {args.preset} on host ==", flush=True)
    t0 = time.perf_counter()
    params = host_init_params(cfg)
    print(f"host init: {time.perf_counter()-t0:.1f}s", flush=True)

    if not args.skip_quant:
        ids = np.random.default_rng(1).integers(
            0, cfg.vocab_size,
            (args.nsamples, args.seqlen)).astype(np.int32)

        print("== quantize (offload, default recipe) ==", flush=True)
        t0 = time.perf_counter()
        ar = AutoRound((params, cfg), scheme="W4A16", iters=args.iters,
                       batch_size=args.bs,
                       gradient_accumulate_steps=args.grad_accum,
                       use_remat=args.remat, offload_params=True)
        res = ar.quantize(ids)
        tq = time.perf_counter() - t0
        monitor.update()
        summary["quant_wall_s"] = round(tq, 1)
        summary["quant_peak_rss_gb"] = round(monitor.peak_rss_gb, 2)
        summary["quant_peak_hbm_gb"] = round(monitor.peak_device_gb, 2)
        if res.profile:
            summary["phase_profile_s"] = {
                k: round(v, 1) for k, v in sorted(
                    res.profile.items(), key=lambda kv: -kv[1])}
            summary["phase_profile_other_s"] = round(
                tq - sum(res.profile.values()), 1)
        print(f"quantize wall-clock: {tq/60:.1f} min "
              f"(peak RSS {monitor.peak_rss_gb:.1f} GB, "
              f"peak HBM {monitor.peak_device_gb:.1f} GB)", flush=True)

        # free calibration leftovers before serving
        gc.collect()

        print("== build packed engine ==", flush=True)
        t0 = time.perf_counter()
        eng = QuantizedLlama.from_quantize_result(
            res, cfg, max_seq=args.max_seq, kv_quant="int8")
        del res
        gc.collect()
        summary["pack_wall_s"] = round(time.perf_counter() - t0, 1)
    else:
        print("== synthesize packed engine (--skip-quant) ==", flush=True)
        import jax as _jax
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import make_packed_engine
        eng = make_packed_engine(cfg, args.max_seq, _jax.random.PRNGKey(0))

    prompt = np.random.default_rng(2).integers(
        0, cfg.vocab_size, (args.decode_bs, 128)).astype(np.int32)
    print("== decode timing (W4A16 packed) ==", flush=True)
    t_w4 = time_decode(eng, prompt)
    toks_w4 = args.decode_bs / t_w4
    summary["w4_decode_step_ms"] = round(t_w4 * 1e3, 2)
    summary["w4_decode_tok_s"] = round(toks_w4, 1)
    print(f"W4A16 decode: {t_w4*1e3:.1f} ms/step -> {toks_w4:.0f} tok/s "
          f"@bs{args.decode_bs}", flush=True)
    del eng
    gc.collect()

    if not args.skip_baseline:
        print("== BF16 baseline (16L + 4L affine extrapolation) ==",
              flush=True)
        ts = {}
        for L in (16, 4):
            cfgL = dataclasses.replace(cfg, num_layers=L)
            pL = {k: v for k, v in params.items() if k != "blocks"}
            pL["blocks"] = params["blocks"][:L]
            pL = jax.tree.map(jnp.asarray, pL)
            engL = QuantizedLlama(cfg=cfgL, params=pL, packed={},
                                  max_seq=args.max_seq, kv_quant="int8")
            ts[L] = time_decode(engL, prompt)
            print(f"bf16 {L}L: {ts[L]*1e3:.1f} ms/step", flush=True)
            del engL, pL
            gc.collect()
        slope = (ts[16] - ts[4]) / 12.0
        t_bf16 = ts[16] + slope * (cfg.num_layers - 16)
        summary["bf16_decode_step_ms_extrap"] = round(t_bf16 * 1e3, 2)
        summary["bf16_16L_ms"] = round(ts[16] * 1e3, 2)
        summary["bf16_4L_ms"] = round(ts[4] * 1e3, 2)
        summary["w4_vs_bf16"] = round(t_bf16 / t_w4, 3)
        print(f"BF16 extrapolated {cfg.num_layers}L: {t_bf16*1e3:.1f} "
              f"ms/step -> W4 speedup {t_bf16/t_w4:.2f}x", flush=True)

    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
