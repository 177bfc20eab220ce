"""Pure-JAX Mixtral-family MoE decoder (sparse top-k routed experts).

Role of the reference's MoE modeling (``auto_round/modeling/fused_moe/``:
fused 3-D expert tensors are replaced with per-expert linears so each
expert quantizes independently — here experts are naturally separate
(O, I) leaves addressed as ``experts.<e>.<w1|w2|w3>``).

Calibration-time expert compute is dense-then-mask: every expert runs on
every token and the router's top-k weights gate the sum.  That is exact
(not an approximation), XLA-friendly (no ragged gather), and gives every
expert calibration signal; the serving engine can switch to grouped
matmuls later.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig, rms_norm

__all__ = ["MixtralConfig", "init_params", "block_fwd", "model_fwd",
           "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class MixtralConfig(LlamaConfig):
    num_experts: int = 8
    top_k: int = 2
    # Qwen2-MoE / DeepSeek-style always-on shared expert (0 = none);
    # ``intermediate_size`` is the routed experts' width
    shared_expert_intermediate: int = 0
    # sigmoid gate on the shared expert output (Qwen2-MoE)
    shared_expert_gate: bool = False
    # renormalize top-k router probs (Mixtral yes; Qwen2-MoE
    # norm_topk_prob=False)
    norm_topk_prob: bool = True


CONFIG_PRESETS: Dict[str, MixtralConfig] = {
    "tiny-moe": MixtralConfig(vocab_size=256, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2, num_experts=4,
                              top_k=2, rope_theta=10000.0, dtype=jnp.float32),
    "mixtral-8x7b": MixtralConfig(vocab_size=32000, hidden_size=4096,
                                  intermediate_size=14336, num_layers=32,
                                  num_heads=32, num_kv_heads=8,
                                  num_experts=8, top_k=2,
                                  rope_theta=1000000.0),
}


def block_linear_names(cfg: MixtralConfig) -> Tuple[str, ...]:
    attn = ("q_proj", "k_proj", "v_proj", "o_proj")
    experts = tuple(
        f"experts.{e}.{w}" for e in range(cfg.num_experts)
        for w in ("w1", "w2", "w3"))
    shared = (tuple(f"shared_expert.{w}" for w in ("w1", "w2", "w3"))
              if cfg.shared_expert_intermediate else ())
    return attn + experts + shared


def init_params(cfg: MixtralConfig, key: jax.Array) -> Dict[str, Any]:
    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 5 + cfg.num_experts)
        b = {
            "q_proj": jax.random.normal(bk[0], (qd, H), cfg.dtype) * 0.02,
            "k_proj": jax.random.normal(bk[1], (kvd, H), cfg.dtype) * 0.02,
            "v_proj": jax.random.normal(bk[2], (kvd, H), cfg.dtype) * 0.02,
            "o_proj": jax.random.normal(bk[3], (H, qd), cfg.dtype) * 0.02,
            "router": jax.random.normal(bk[4], (cfg.num_experts, H),
                                        cfg.dtype) * 0.02,
            "input_layernorm": jnp.ones((H,), cfg.dtype),
            "post_attention_layernorm": jnp.ones((H,), cfg.dtype),
            **({"q_norm": jnp.ones((hd,), cfg.dtype),
                "k_norm": jnp.ones((hd,), cfg.dtype)} if cfg.qk_norm
               else {}),
            "experts": [
                {
                    "w1": jax.random.normal(bk[5 + e], (cfg.intermediate_size,
                                                        H), cfg.dtype) * 0.02,
                    "w2": jax.random.normal(
                        jax.random.fold_in(bk[5 + e], 1),
                        (H, cfg.intermediate_size), cfg.dtype) * 0.02
                        / np.sqrt(2 * cfg.num_layers),
                    "w3": jax.random.normal(
                        jax.random.fold_in(bk[5 + e], 2),
                        (cfg.intermediate_size, H), cfg.dtype) * 0.02,
                }
                for e in range(cfg.num_experts)
            ],
        }
        if cfg.shared_expert_intermediate:
            si = cfg.shared_expert_intermediate
            sk = jax.random.fold_in(keys[li], 99)
            b["shared_expert"] = {
                "w1": jax.random.normal(sk, (si, H), cfg.dtype) * 0.02,
                "w2": jax.random.normal(jax.random.fold_in(sk, 1), (H, si),
                                        cfg.dtype) * 0.02
                      / np.sqrt(2 * cfg.num_layers),
                "w3": jax.random.normal(jax.random.fold_in(sk, 2), (si, H),
                                        cfg.dtype) * 0.02,
            }
            if cfg.shared_expert_gate:
                b["shared_expert_gate"] = jax.random.normal(
                    jax.random.fold_in(sk, 3), (1, H), cfg.dtype) * 0.02
        blocks.append(b)
    params = {
        "embed_tokens": jax.random.normal(keys[-2], (cfg.vocab_size, H),
                                          cfg.dtype) * 0.02,
        "norm": jnp.ones((H,), cfg.dtype),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(keys[-1], (cfg.vocab_size, H),
                                              cfg.dtype) * 0.02
    return params


def capacity_dispatch(h, topi, topv, E: int, capacity_factor: float,
                      apply_expert, grouped_apply=None,
                      expert_offset=0, n_global_experts: int = 0,
                      scale_input: bool = False):
    """Capacity-based MoE dispatch (role of the reference's fused-MoE
    grouped GEMM, ``modeling/fused_moe``): tokens gather into fixed
    (E, C, H) slabs, each expert's kernels run on C tokens instead of
    all N (C = ceil(N·k/E · factor)); tokens beyond an expert's capacity
    drop (the standard MoE capacity approximation).

    ``apply_expert(e, xb) -> yb`` runs expert ``e`` on its (C, H) slab;
    router semantics stay with the caller (Mixtral softmax / DeepSeek
    sigmoid+bias both dispatch through here).  ``grouped_apply(buf
    (E, C, H)) -> (E, C, H)``, when given, runs ALL experts in one
    grouped kernel call (``w4a16_matmul_grouped``) instead of an E-long
    launch loop.

    Under expert parallelism (``expert_offset``/``n_global_experts``)
    each shard owns E local experts: global routing ids map to local
    rows, foreign slots drop into the spill row, and the caller psums
    the partial routed output across shards (the combine).

    ``scale_input=True`` applies the routing weight to the expert INPUT
    instead of the output (Llama4 router semantics — the expert is
    nonlinear, so the two are not equivalent); the combine then sums
    kept contributions unweighted.
    """
    B, S, H = h.shape
    k = topi.shape[-1]
    N = B * S
    Eg = n_global_experts or E
    C = max(1, int(np.ceil(N * k / Eg * capacity_factor)))
    hf = h.reshape(N, H)
    e_idx = topi.reshape(N * k) - expert_offset    # local expert per slot
    local = (e_idx >= 0) & (e_idx < E)
    e_idx = jnp.clip(e_idx, 0, E - 1)
    w_slot = (topv.reshape(N * k).astype(jnp.float32)
              * local.astype(jnp.float32))
    n_idx = jnp.repeat(jnp.arange(N), k)
    # rank of each slot within its expert (first-come order)
    oh = (jax.nn.one_hot(e_idx, E, dtype=jnp.int32)
          * local.astype(jnp.int32)[:, None])          # (N*k, E)
    pos_e = jnp.sum(jnp.cumsum(oh, axis=0) * oh, axis=1) - 1
    keep = local & (pos_e < C)
    pos_c = jnp.where(keep, pos_e, C)             # drops land in a
    buf = jnp.zeros((E, C + 1, H), h.dtype)       # spill row
    vals = hf[n_idx]
    if scale_input:
        vals = (vals.astype(jnp.float32)
                * w_slot[:, None]).astype(h.dtype)
    buf = buf.at[e_idx, pos_c].set(vals)
    if grouped_apply is not None:
        ys = grouped_apply(buf[:, :C]).astype(jnp.float32)
    else:
        ys = jnp.stack([apply_expert(e, buf[e, :C])
                        for e in range(E)]).astype(jnp.float32)
    w_comb = (keep.astype(jnp.float32) if scale_input
              else w_slot * keep.astype(jnp.float32))
    contrib = ys[e_idx, pos_c.clip(0, C - 1)] * w_comb[:, None]
    out = jnp.zeros((N, H), jnp.float32).at[n_idx].add(contrib)
    return out.reshape(B, S, H)


def _moe_mlp(weights, h, cfg: MixtralConfig, lf,
             capacity_factor: float = 0.0):
    """Top-k routed SwiGLU experts.

    capacity_factor == 0 → dense-then-mask (exact; every expert sees
    every token — the calibration default, XLA-friendly, full gradient
    signal).  capacity_factor > 0 → capacity-based dispatch (role of the
    reference's fused-MoE grouped GEMM, ``modeling/fused_moe``): tokens
    gather into fixed (E, C, H) slabs, each expert's kernels run on C
    tokens instead of all N (C = ceil(N·k/E · factor)) — the serving
    path's FLOP reduction; tokens beyond an expert's capacity drop (the
    standard MoE capacity approximation).
    """
    B, S, H = h.shape
    router_logits = lf("router", h, weights["router"])  # (B,S,E)
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.top_k)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    E, k = cfg.num_experts, cfg.top_k

    gnames = getattr(lf, "grouped_names", frozenset())
    use_grouped = {"w1", "w2", "w3"} <= set(gnames)
    # expert parallelism (tp engine): this shard owns El experts starting
    # at `off`; the routed output psums across shards (expert_combine)
    off = getattr(lf, "expert_offset", 0)
    El = getattr(lf, "local_experts", E)
    combine = getattr(lf, "expert_combine", None)

    def grouped_swiglu(buf):  # (El, C, H) → (El, C, H)
        mid = jax.nn.silu(lf.grouped("w1", buf)) * lf.grouped("w3", buf)
        return lf.grouped("w2", mid)

    if capacity_factor and capacity_factor > 0:
        def apply_expert(e, xb):
            ew = weights["experts"][e]
            gate = jax.nn.silu(lf(f"experts.{e}.w1", xb, ew["w1"]))
            up = lf(f"experts.{e}.w3", xb, ew["w3"])
            return lf(f"experts.{e}.w2", gate * up, ew["w2"])

        # EP offsets only apply to the stacked grouped payload; the
        # per-expert fallback indexes the GLOBAL weights["experts"] list
        out = capacity_dispatch(
            h, topi, topv, El if use_grouped else E, capacity_factor,
            apply_expert,
            grouped_apply=grouped_swiglu if use_grouped else None,
            expert_offset=off if use_grouped else 0, n_global_experts=E)
        if combine is not None and use_grouped:
            out = combine(out)
    elif use_grouped:
        # dense-then-mask through the grouped kernel: every expert runs
        # the full token slab (exact; calibration/prefill semantics)
        N = B * S
        buf = jnp.broadcast_to(h.reshape(1, N, H), (El, N, H))
        ys = grouped_swiglu(buf).astype(jnp.float32)       # (El, N, H)
        flat_i = topi.reshape(-1) - off
        valid = ((flat_i >= 0) & (flat_i < El)).astype(jnp.float32)
        w_tok = jnp.zeros((N, El), jnp.float32).at[
            jnp.repeat(jnp.arange(N), k),
            jnp.clip(flat_i, 0, El - 1)].add(
            topv.reshape(-1).astype(jnp.float32) * valid)
        out = jnp.einsum("enh,ne->nh", ys, w_tok).reshape(B, S, H)
        if combine is not None:
            out = combine(out)
    else:
        out = jnp.zeros_like(h, dtype=jnp.float32)
        for e, ew in enumerate(weights["experts"]):
            gate = jax.nn.silu(lf(f"experts.{e}.w1", h, ew["w1"]))
            up = lf(f"experts.{e}.w3", h, ew["w3"])
            y = lf(f"experts.{e}.w2", gate * up, ew["w2"]).astype(
                jnp.float32)
            # weight of expert e per token (0 when not in top-k)
            w_e = jnp.sum(jnp.where(topi == e, topv, 0.0), axis=-1)
            out = out + y * w_e[..., None]
    if "shared_expert" in weights:
        # Qwen2-MoE/DeepSeek always-on shared expert, optionally gated by
        # a sigmoid scalar per token
        sw = weights["shared_expert"]
        gate = jax.nn.silu(lf("shared_expert.w1", h, sw["w1"]))
        up = lf("shared_expert.w3", h, sw["w3"])
        y = lf("shared_expert.w2", gate * up, sw["w2"]).astype(jnp.float32)
        if "shared_expert_gate" in weights:
            g = jax.nn.sigmoid(
                lf("shared_expert_gate", h, weights["shared_expert_gate"])
                .astype(jnp.float32))
            y = y * g
        out = out + y
    return out.astype(h.dtype)


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: MixtralConfig, mask=None, linear_fn=None) -> jax.Array:
    lf = linear_fn or llama._plain_linear
    B, S, H = x.shape
    hd = cfg.hd
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    q = lf("q_proj", h, weights["q_proj"], weights.get("q_bias")
           ).reshape(B, S, cfg.num_heads, hd)
    k = lf("k_proj", h, weights["k_proj"], weights.get("k_bias")
           ).reshape(B, S, cfg.num_kv_heads, hd)
    v = lf("v_proj", h, weights["v_proj"], weights.get("v_bias")
           ).reshape(B, S, cfg.num_kv_heads, hd)
    if cfg.qk_norm:  # Qwen3-MoE: per-head RMSNorm on q/k
        q = rms_norm(q, weights["q_norm"], cfg.rms_eps)
        k = rms_norm(k, weights["k_norm"], cfg.rms_eps)
    q = llama.apply_rope(q, cos, sin)
    k = llama.apply_rope(k, cos, sin)
    attn = llama.attention(q, k, v, mask, cfg).reshape(B, S, -1)
    x = x + lf("o_proj", attn, weights["o_proj"])

    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    x = x + _moe_mlp(weights, h, cfg, lf)
    return x


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: MixtralConfig) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = llama.rope_tables(cfg, input_ids.shape[1])
    for b in params["blocks"]:
        x = block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
