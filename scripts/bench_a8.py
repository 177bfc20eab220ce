"""8B decode step with the W4A8 byte-layout engine (round 4).

Same device-synthesized methodology as bench.py, but every projection
(and the lm_head) packs in the int8 byte-pair layout and serves through
``w4a8_matmul`` (int8 MXU).  Prints per-step ms + tok/s next to the
W4A16 engine measured in the same process.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_packed_engine, time_decode, decode_bytes  # noqa: E402


def make_a8_engine(cfg, max_seq, key, g=128):
    from autoround_tpu.serve import QuantizedLlama
    from autoround_tpu.serve.engine import _fuse_packed

    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    shapes = {
        "q_proj": (qd, H), "k_proj": (kvd, H), "v_proj": (kvd, H),
        "o_proj": (H, qd),
        "gate_proj": (cfg.intermediate_size, H),
        "up_proj": (cfg.intermediate_size, H),
        "down_proj": (H, cfg.intermediate_size),
    }
    packed, kinds = {}, {}
    keys = jax.random.split(key, 2 * len(shapes))
    kit = iter(keys)
    per_layer = {}
    for n, (O, K) in shapes.items():
        qw = jax.random.randint(next(kit), (O, K // 2), -128, 128,
                                jnp.int32).astype(jnp.int8)
        sc = jax.random.uniform(next(kit), (O, K // g), jnp.float32,
                                0.008, 0.012)
        per_layer[n] = (qw, sc)
    for i in range(cfg.num_layers):
        for n in shapes:
            packed[f"blocks.{i}.{n}"] = per_layer[n]
            kinds[f"blocks.{i}.{n}"] = "w4a8"
    kE = jax.random.split(key, 3)
    blocks = [{**{n: None for n in shapes},
               "input_layernorm": jnp.ones((H,), jnp.bfloat16),
               "post_attention_layernorm": jnp.ones((H,), jnp.bfloat16)}
              for _ in range(cfg.num_layers)]
    params = {
        "embed_tokens": (jax.random.normal(kE[0], (cfg.vocab_size, H),
                                           jnp.bfloat16) * 0.02),
        "norm": jnp.ones((H,), jnp.bfloat16),
        "blocks": blocks,
    }
    qw_h = jax.random.randint(kE[1], (cfg.vocab_size, H // 2), -128, 128,
                              jnp.int32).astype(jnp.int8)
    sc_h = jax.random.uniform(kE[2], (cfg.vocab_size, H // g), jnp.float32,
                              0.008, 0.012)
    packed["lm_head"] = (qw_h, sc_h)
    kinds["lm_head"] = "w4a8"
    fused, splits, kinds = _fuse_packed(packed, cfg, kinds)
    return QuantizedLlama(cfg=cfg, params=params, packed=fused,
                          max_seq=max_seq, kv_quant="int8",
                          fused_splits=splits, packed_kinds=kinds)


def main():
    from autoround_tpu.models import llama
    cfg = llama.CONFIG_PRESETS["llama3-8b"]
    BS, MAX_SEQ, PROMPT = 32, 512, 128
    key = jax.random.PRNGKey(0)
    prompt = jax.device_put(np.random.default_rng(2).integers(
        0, cfg.vocab_size, (BS, PROMPT)).astype(np.int32))

    eng8 = make_a8_engine(cfg, MAX_SEQ, key)
    t_a8 = time_decode(eng8, prompt)[0]
    del eng8
    eng = make_packed_engine(cfg, MAX_SEQ, key)
    t_w4 = time_decode(eng, prompt)[0]
    del eng

    step_gb = decode_bytes(cfg, BS, MAX_SEQ) / 1e9
    out = {
        "w4a16_step_ms": round(t_w4 * 1e3, 2),
        "w4a16_tok_s": round(BS / t_w4, 1),
        "w4a8_step_ms": round(t_a8 * 1e3, 2),
        "w4a8_tok_s": round(BS / t_a8, 1),
        "a8_speedup": round(t_w4 / t_a8, 3),
        "hbm_gb_per_step": round(step_gb, 3),
        "w4a8_effective_gbs": round(step_gb / t_a8, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
