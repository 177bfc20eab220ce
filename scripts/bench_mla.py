"""DeepSeek-class MLA + MoE serving benchmark (one real TPU chip).

A DeepSeek-V2-Lite-CLASS model (MLA r=512/dr=64, 16 heads, 27 layers,
64 routed experts top-6 + 2 shared, expert width 1024 so the grouped W4
kernel applies) decodes through the full engine: packed W4A16 weights
(incl. lm_head and stacked experts), int8 latent KV cache, absorbed
latent attention, capacity-dispatched grouped expert GEMMs.

Packed weights are synthesized directly on device (bit-identical
layout/compute to a real quantized model).  Prints one JSON line:
tok/s/chip + the MLA cache footprint vs the equivalent GQA cache.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AR_MOE_CAPACITY_FACTOR", "1.5")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from autoround_tpu.models.deepseek import DeepseekConfig
    from autoround_tpu.serve import QuantizedLlama

    cfg = DeepseekConfig(
        vocab_size=102400, hidden_size=2048, intermediate_size=11264,
        num_layers=27, num_heads=16, num_kv_heads=16, rope_theta=10000.0,
        rms_eps=1e-6, q_lora_rank=0, kv_lora_rank=512,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        n_routed_experts=64, num_experts_per_tok=6,
        moe_intermediate_size=1024, n_shared_experts=2, first_k_dense=1,
        scoring_func="softmax", norm_topk_prob=False)
    BS, MAX_SEQ, PROMPT, g = 32, 512, 128, 128
    H, nh = cfg.hidden_size, cfg.num_heads
    dn, dr, dv, r = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                     cfg.v_head_dim, cfg.kv_lora_rank)
    E, mi = cfg.n_routed_experts, cfg.moe_intermediate_size
    key = jax.random.PRNGKey(0)

    def _keys():
        k = key
        while True:
            k, sub = jax.random.split(k)
            yield sub

    kit = _keys()

    def qw_sc(O, K):
        qw = jax.random.randint(next(kit), (O, K // 8),
                                jnp.iinfo(jnp.int32).min,
                                jnp.iinfo(jnp.int32).max, jnp.int32)
        sc = jax.random.uniform(next(kit), (O, K // g), jnp.float32,
                                0.008, 0.012)
        return qw, sc

    def gqw_sc(O, K):  # one expert payload broadcast E-wide (same bytes)
        qw, sc = qw_sc(O, K)
        return (jnp.broadcast_to(qw, (E, *qw.shape)).copy(),
                jnp.broadcast_to(sc, (E, *sc.shape)).copy())

    # shared per-name payloads, replicated across layers (identical
    # compute/bytes to distinct weights; 27x less generation)
    attn = {"q_proj": qw_sc(nh * (dn + dr), H),
            "o_proj": qw_sc(H, nh * dv)}
    stack = {w: gqw_sc(mi if w != "down_proj" else H,
                       H if w != "down_proj" else mi)
             for w in ("gate_proj", "up_proj", "down_proj")}
    shared = {"gate_proj": qw_sc(mi * 2, H), "up_proj": qw_sc(mi * 2, H),
              "down_proj": qw_sc(H, mi * 2)}
    dense_mlp = {"gate_proj": qw_sc(cfg.intermediate_size, H),
                 "up_proj": qw_sc(cfg.intermediate_size, H),
                 "down_proj": qw_sc(H, cfg.intermediate_size)}

    bf = lambda *s: (jax.random.normal(next(kit), s, jnp.bfloat16) * 0.02)
    packed = {"lm_head": qw_sc(cfg.vocab_size, H)}
    blocks = []
    for i in range(cfg.num_layers):
        for nm, pay in attn.items():
            packed[f"blocks.{i}.{nm}"] = pay
        b = {
            "q_proj": None, "o_proj": None,
            "kv_a_proj_with_mqa": bf(r + dr, H),
            "kv_a_layernorm": jnp.ones((r,), jnp.bfloat16),
            "kv_b_proj": bf(nh * (dn + dv), r),
            "input_layernorm": jnp.ones((H,), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((H,), jnp.bfloat16),
        }
        if cfg.layer_is_moe(i):
            for w, pay in stack.items():
                packed[f"blocks.{i}.experts_stack.{w}"] = pay
            for w, pay in shared.items():
                packed[f"blocks.{i}.shared_experts.{w}"] = pay
            b["gate"] = bf(E, H)
            b["experts"] = [
                {w: None for w in ("gate_proj", "up_proj", "down_proj")}
                for _ in range(E)]
            b["shared_experts"] = {
                w: None for w in ("gate_proj", "up_proj", "down_proj")}
        else:
            for w, pay in dense_mlp.items():
                packed[f"blocks.{i}.{w}"] = pay
            b.update({w: None
                      for w in ("gate_proj", "up_proj", "down_proj")})
        blocks.append(b)
    params = {"embed_tokens": bf(cfg.vocab_size, H),
              "norm": jnp.ones((H,), jnp.bfloat16), "blocks": blocks}

    eng = QuantizedLlama(cfg=cfg, params=params, packed=packed,
                         max_seq=MAX_SEQ, kv_quant="int8",
                         fused_splits=None, packed_kinds=None)

    prompt = jax.device_put(np.random.default_rng(2).integers(
        0, cfg.vocab_size, (BS, PROMPT)).astype(np.int32))

    def time_decode(steps=24):
        for n in (2, 2 + steps):
            toks = eng.generate_scan(prompt, max_new_tokens=n)
            _ = int(np.asarray(toks[0, -1]))
        t0 = time.perf_counter()
        toks = eng.generate_scan(prompt, max_new_tokens=2 + steps)
        _ = int(np.asarray(toks[0, -1]))
        t1 = time.perf_counter()
        t0b = time.perf_counter()
        toks = eng.generate_scan(prompt, max_new_tokens=2)
        _ = int(np.asarray(toks[0, -1]))
        t1b = time.perf_counter()
        return ((t1 - t0) - (t1b - t0b)) / steps

    t = time_decode()
    mla_bytes_tok = (r + dr) * cfg.num_layers          # int8 latents
    gqa_bytes_tok = 2 * nh * (dn + dr) * cfg.num_layers * 2  # bf16 GQA
    print(json.dumps({
        "metric": "deepseek_v2lite_class_mla_moe_decode_tok_s",
        "value": round(BS / t, 1),
        "unit": f"tok/s/chip (27L MLA r={r} + 64-expert MoE, bs{BS}, "
                "int8 latent cache, grouped W4 experts)",
        "detail": {
            "step_ms": round(t * 1e3, 2),
            "mla_cache_bytes_per_token": mla_bytes_tok,
            "equiv_gqa_cache_bytes_per_token": gqa_bytes_tok,
            "kv_compression_x": round(gqa_bytes_tok / mla_bytes_tok, 1),
            "capacity_factor": float(os.environ["AR_MOE_CAPACITY_FACTOR"]),
        },
    }))


if __name__ == "__main__":
    main()
