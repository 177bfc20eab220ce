"""End-to-end MMDiT diffusion quantization: denoise-LOOP calibration →
quantize → quantized re-generation → trajectory fidelity + CLIP-score
wiring, as one runnable script.

Role of the reference's diffusion pipeline
(``compressors/diffusion_mixin.py:32`` calib at ``:195``, save at
``:486``; datasets ``diffusion/dataset.py:57-136``; eval
``diffusion/eval.py:30-66``): calibration samples are CAPTURED from a
real sampler run — every denoise step's transformer inputs across
multiple timesteps — not i.i.d. noise; eval scores generated images.

Zero egress means no SD3/Flux weights and no real CLIP checkpoint, so
the model is a synthetic MMDiT and the scorer a synthetic JAX CLIP —
but every *mechanism* is the real one: multi-timestep capture, the
block-chain quantizer on joint-attention blocks, a quantized sampler
pass, and the clip_score code path.

Usage: python scripts/e2e_mmdit.py [--steps 8] [--iters 30] \
           [--scheme W4A16G32] [--out /tmp/mmdit_e2e.json]
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
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--scheme", default="W4A16G32")
    ap.add_argument("--nprompts", type=int, default=4)
    ap.add_argument("--out", default="/tmp/mmdit_e2e.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from autoround_tpu import AutoRound
    from autoround_tpu.models import mmdit
    from autoround_tpu.models.mmdit import CONFIG_PRESETS, euler_sample

    cfg = CONFIG_PRESETS["tiny-mmdit"]
    params = mmdit.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B = args.nprompts
    enc = jnp.asarray(rng.standard_normal(
        (B, cfg.text_len, cfg.text_dim)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal(
        (B, cfg.pooled_dim)).astype(np.float32))

    # 1. denoise-loop capture: run the FP sampler, collecting every
    #    step's transformer inputs (steps x B samples)
    captured = []
    t0 = time.time()
    fp_latents = euler_sample(params, cfg, enc, pooled,
                              jax.random.PRNGKey(1), steps=args.steps,
                              capture=lambda d: captured.append(
                                  jax.tree.map(np.asarray, d)))
    calib = {k: np.concatenate([c[k] for c in captured], axis=0)
             for k in captured[0]}
    n_calib = calib["pixel_values"].shape[0]
    print(f"[capture] {args.steps} steps x {B} prompts -> {n_calib} "
          f"denoise-step samples ({time.time()-t0:.1f}s)", flush=True)

    # 2. quantize on the captured multi-timestep distribution
    t0 = time.time()
    res = AutoRound((params, cfg), scheme=args.scheme, iters=args.iters,
                    batch_size=8, donate_params=False).quantize(calib)
    quant_s = time.time() - t0
    print(f"[quantize] {len(res.layers)} layers in {quant_s:.1f}s",
          flush=True)

    # 3. regenerate with quantized weights from the SAME noise/prompts
    q_latents = euler_sample(res.params, cfg, enc, pooled,
                             jax.random.PRNGKey(1), steps=args.steps)
    fp_np, q_np = np.asarray(fp_latents), np.asarray(q_latents)
    rel_err = float(np.linalg.norm(q_np - fp_np)
                    / max(np.linalg.norm(fp_np), 1e-9))
    # RTN baseline for context
    rtn = AutoRound((params, cfg), scheme=args.scheme, iters=0,
                    donate_params=False).quantize(calib)
    r_latents = euler_sample(rtn.params, cfg, enc, pooled,
                             jax.random.PRNGKey(1), steps=args.steps)
    rtn_err = float(np.linalg.norm(np.asarray(r_latents) - fp_np)
                    / max(np.linalg.norm(fp_np), 1e-9))

    # 4. CLIP-score wiring: decode latents to pseudo-images (3-channel
    #    slice, normalized) and score against the prompts through the
    #    real clip_score path (synthetic CLIP weights)
    from autoround_tpu.eval.clip_score import (ClipConfig, clip_score,
                                               init_clip_params)
    ccfg = ClipConfig(image_size=cfg.image_size, patch_size=cfg.patch_size,
                      v_hidden=32, v_layers=2, v_heads=2,
                      t_vocab=256, t_hidden=32, t_layers=2, t_heads=2,
                      t_max_len=16, projection_dim=32, eot_token_id=255)
    cparams = init_clip_params(ccfg, jax.random.PRNGKey(5))

    def to_img(lat):
        img = np.asarray(lat)[..., :3]
        lo, hi = img.min(), img.max()
        return (img - lo) / max(hi - lo, 1e-9)

    ids = rng.integers(1, 256, (B, 16)).astype(np.int32)
    s_fp = float(np.mean(np.asarray(clip_score(
        cparams, jnp.asarray(to_img(fp_np)), jnp.asarray(ids), ccfg))))
    s_q = float(np.mean(np.asarray(clip_score(
        cparams, jnp.asarray(to_img(q_np)), jnp.asarray(ids), ccfg))))

    report = {
        "model": "tiny-mmdit (joint text-image attention, adaLN-zero)",
        "scheme": args.scheme, "iters": args.iters,
        "denoise_steps": args.steps, "calib_samples": n_calib,
        "quant_wall_s": round(quant_s, 1),
        "latent_rel_err_tuned": round(rel_err, 4),
        "latent_rel_err_rtn": round(rtn_err, 4),
        "clip_score_fp": round(s_fp, 4), "clip_score_tuned": round(s_q, 4),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    sys.exit(main())
