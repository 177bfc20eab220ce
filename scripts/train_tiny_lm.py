"""Train a small REAL llama-family LM in-container (TPU) for the
accuracy-evidence pipeline.

The model is a standard 6-layer / hidden-1024 llama (83M params, GQA,
tied embeddings) from `autoround_tpu.models.llama` — the same decoder
the quantizer tunes — trained with optax AdamW on the local code+docs
corpus built by `scripts/tinylm_corpus.py`.  Dims are chosen so every
projection is packed-servable (K % 1024 == 0 at group 128): the W4
engine path in `scripts/accuracy_evidence_real.py` runs the real packed
kernels, not the dense fallback.

Mixed precision: fp32 master params in the optimizer, bf16 cast for the
forward/backward (MXU rate).  One jitted train step; data is a seeded
random-window sampler over the uint16 token stream.

Checkpoint: float16 safetensors + config + final val ppl, under
--outdir (default /root/repo/.cache/tinylm/ckpt).  Not committed (tens
of MB); `scripts/accuracy_evidence_real.py` consumes it and commits
only the evidence JSON.  Reference counterpart: the accuracy tables in
`docs/step_by_step.md:322-341` are measured on externally-trained
checkpoints; zero egress makes in-container training the honest
equivalent.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_lm_config(dtype=None):
    import jax.numpy as jnp
    from autoround_tpu.models.llama import LlamaConfig
    return LlamaConfig(
        vocab_size=8192, hidden_size=1024, intermediate_size=3072,
        num_layers=6, num_heads=8, num_kv_heads=4, head_dim=128,
        rope_theta=10000.0, rms_eps=1e-5, tie_embeddings=True,
        dtype=dtype or jnp.bfloat16)


def save_checkpoint(params, outdir, extra=None):
    import jax
    from safetensors.numpy import save_file
    os.makedirs(outdir, exist_ok=True)
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(f"{prefix}.{i}", v)
        elif node is not None:
            flat[prefix] = np.asarray(jax.device_get(node), np.float16)

    rec("", params)
    save_file(flat, os.path.join(outdir, "model.safetensors"))
    with open(os.path.join(outdir, "train_meta.json"), "w") as f:
        json.dump(extra or {}, f, indent=2)


def load_checkpoint(outdir, dtype=None):
    """→ (params pytree, cfg) from a train_tiny_lm.py checkpoint dir."""
    import jax.numpy as jnp
    from safetensors.numpy import load_file
    cfg = tiny_lm_config(dtype)
    flat = load_file(os.path.join(outdir, "model.safetensors"))
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}."
        blocks.append({k[len(pre):]: jnp.asarray(v, cfg.dtype)
                       for k, v in flat.items() if k.startswith(pre)})
    params = {"embed_tokens": jnp.asarray(flat["embed_tokens"], cfg.dtype),
              "norm": jnp.asarray(flat["norm"], cfg.dtype),
              "blocks": blocks}
    return params, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/repo/.cache/tinylm")
    ap.add_argument("--outdir", default="/root/repo/.cache/tinylm/ckpt")
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--weight-decay", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from autoround_tpu.models import llama

    cfg = tiny_lm_config()
    train = np.memmap(os.path.join(args.workdir, "train.bin"),
                      np.uint16, "r")
    val = np.memmap(os.path.join(args.workdir, "val.bin"), np.uint16, "r")
    print(f"train {train.size/1e6:.1f}M tokens, val {val.size/1e6:.1f}M, "
          f"devices {jax.devices()}", flush=True)

    rng = np.random.default_rng(args.seed)

    def sample_batch(data, bs):
        off = rng.integers(0, data.size - args.seq - 1, bs)
        ids = np.stack([data[o:o + args.seq + 1] for o in off])
        return ids.astype(np.int32)

    # fixed val batches (seeded once) for a stable eval metric
    vrng = np.random.default_rng(99)
    voff = vrng.integers(0, val.size - args.seq - 1, 64)
    val_ids = np.stack([val[o:o + args.seq + 1] for o in voff]).astype(
        np.int32)

    # fp32 master params, host-side init (device init_params would issue
    # dozens of tiny RNG executables — slow compiles over the tunnel)
    hrng = np.random.default_rng(args.seed)
    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    shapes = {"q_proj": (qd, H), "k_proj": (kvd, H), "v_proj": (kvd, H),
              "o_proj": (H, qd), "gate_proj": (cfg.intermediate_size, H),
              "up_proj": (cfg.intermediate_size, H),
              "down_proj": (H, cfg.intermediate_size)}
    blocks = []
    for _ in range(cfg.num_layers):
        b = {n: hrng.standard_normal(s).astype(np.float32)
             * (0.02 if n != "down_proj"
                else 0.02 / np.sqrt(2 * cfg.num_layers))
             for n, s in shapes.items()}
        b["input_layernorm"] = np.ones((H,), np.float32)
        b["post_attention_layernorm"] = np.ones((H,), np.float32)
        blocks.append(b)
    params = jax.device_put({
        "embed_tokens": hrng.standard_normal(
            (cfg.vocab_size, H)).astype(np.float32) * 0.02,
        "norm": np.ones((H,), np.float32),
        "blocks": blocks})

    warmup = min(args.warmup, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps + warmup,
        end_value=args.lr * 0.05)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.95,
                    weight_decay=args.weight_decay))
    opt_state = opt.init(params)

    def loss_fn(p32, batch):
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p32)
        logits = llama.model_fwd(p, batch[:, :-1], cfg)
        logits = logits.astype(jnp.float32)
        tgt = batch[:, 1:]
        ll = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(ll, tgt[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @jax.jit
    def train_step(p, s, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return p, s, loss

    @jax.jit
    def eval_nll(p, batch):
        return loss_fn(p, batch)

    t0 = time.time()
    best_val = float("inf")
    for step in range(1, args.steps + 1):
        batch = jnp.asarray(sample_batch(train, args.batch))
        params, opt_state, loss = train_step(params, opt_state, batch)
        if step % args.log_every == 0:
            l = float(loss)
            tps = args.batch * args.seq * args.log_every / max(
                time.time() - t0, 1e-9) if step > args.log_every else 0
            print(f"step {step} loss {l:.3f} ppl {np.exp(l):.1f} "
                  f"({tps/1e3:.0f}k tok/s)", flush=True)
            t0 = time.time()
        if step % args.eval_every == 0 or step == args.steps:
            nlls = [float(eval_nll(params, jnp.asarray(val_ids[i:i + 16])))
                    for i in range(0, len(val_ids), 16)]
            vppl = float(np.exp(np.mean(nlls)))
            print(f"step {step} VAL ppl {vppl:.2f}", flush=True)
            if vppl < best_val:
                best_val = vppl
                save_checkpoint(
                    params, args.outdir,
                    {"step": step, "val_ppl": vppl, "seed": args.seed,
                     "batch": args.batch, "seq": args.seq,
                     "steps": args.steps, "lr": args.lr,
                     "uniform_ppl_floor": cfg.vocab_size})
    print(f"done: best val ppl {best_val:.2f} → {args.outdir}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
