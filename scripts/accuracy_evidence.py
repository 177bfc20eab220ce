"""Model-level accuracy evidence at 1B scale.

No real pretrained checkpoints exist in this container (zero egress);
on a fabricated (random-init) checkpoint, held-out perplexity sits at
the uniform floor regardless of quantization, so ppl deltas are noise.
The MEASURABLE model-scale claims are therefore:

* per-block tuned loss recovery — the exact quantity SignRound
  optimizes (MSE of the quantized block output against the FP chain),
  reported as the mean iter0/best ratio over all 16 blocks of a
  1B-class model; and
* tuning wall-clock on one chip.

ppl values are still recorded as a sanity diagnostic (they must stay
at the uniform floor, confirming the quantized model is not broken).

Usage:
  python scripts/accuracy_evidence.py [--preset llama3.2-1b] \
      [--iters 60] [--scheme W2A16G64] [--out /tmp/accuracy_evidence.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3.2-1b")
    ap.add_argument("--scheme", default="W2A16G64")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--nsamples", type=int, default=32)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--out", default="/tmp/accuracy_evidence.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from autoround_tpu import AutoRound
    from autoround_tpu.eval import perplexity
    from autoround_tpu.models import llama

    cfg = llama.CONFIG_PRESETS[args.preset]
    # host-side init + one device_put: on-device init_params issues ~100
    # tiny RNG executables — minutes of remote compiles over the tunnel
    from e2e_flagship import host_init_params
    t0 = time.time()
    host = host_init_params(cfg)
    params = jax.device_put(host)
    jax.block_until_ready(params["embed_tokens"])
    print(f"[stage] init+upload {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(7)
    calib = rng.integers(0, cfg.vocab_size,
                         (args.nsamples, args.seqlen)).astype(np.int32)
    heldout = rng.integers(0, cfg.vocab_size, (8, args.seqlen)).astype(
        np.int32)

    report = {"preset": args.preset, "scheme": args.scheme,
              "iters": args.iters, "nsamples": args.nsamples,
              "seqlen": args.seqlen}

    t0 = time.time()
    report["ppl_fp"] = float(perplexity(params, cfg, heldout))
    print(f"[stage] ppl_fp {report['ppl_fp']:.1f} "
          f"({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    rtn = AutoRound((params, cfg), scheme=args.scheme,
                    iters=0).quantize(calib)
    report["ppl_rtn"] = float(perplexity(rtn.params, cfg, heldout))
    report["rtn_wall_s"] = round(time.time() - t0, 1)
    print(f"[stage] rtn done {report['rtn_wall_s']}s "
          f"ppl {report['ppl_rtn']:.1f}", flush=True)
    del rtn

    t0 = time.time()
    tuned = AutoRound((params, cfg), scheme=args.scheme, iters=args.iters,
                      batch_size=8, donate_params=False).quantize(calib)
    report["ppl_tuned"] = float(perplexity(tuned.params, cfg, heldout))
    report["tuned_wall_s"] = round(time.time() - t0, 1)

    # the headline: per-block loss recovery (iter0 -> best) at 1B scale
    ratios = []
    for bi, trace in sorted(tuned.loss_traces.items()):
        tr = np.asarray(trace, np.float64)
        if tr.size and tr[0] > 0:
            ratios.append(float(tr[0] / max(tr.min(), 1e-12)))
    report["blocks_tuned"] = len(ratios)
    report["block_loss_recovery_x_mean"] = round(
        float(np.mean(ratios)), 3) if ratios else None
    report["block_loss_recovery_x_min"] = round(
        float(np.min(ratios)), 3) if ratios else None

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
