"""Model-level accuracy evidence: tuned quantization must close the RTN
damage gap at full-model scale, measured as held-out perplexity
(round-1 review: 'accuracy evidence is tiny-random-model only').

No real pretrained checkpoints exist in this container (zero egress), so
the model is a fabricated 1B-class checkpoint — the MEASURABLE claim is
relative: ppl(FP) vs ppl(RTN-W2) vs ppl(tuned-W2) on held-out tokens,
i.e. how much of the RTN ppl damage SignRound recovers at model scale.

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

    dmg_rtn = report["ppl_rtn"] - report["ppl_fp"]
    dmg_tuned = report["ppl_tuned"] - report["ppl_fp"]
    report["rtn_ppl_damage"] = round(dmg_rtn, 4)
    report["tuned_ppl_damage"] = round(dmg_tuned, 4)
    report["damage_recovered_pct"] = round(
        100.0 * (1.0 - dmg_tuned / dmg_rtn), 1) if dmg_rtn > 0 else None

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
