"""Pure-JAX Llama-4 text decoder: interleaved rope/NoPE layers, chunked
attention, L2 q/k norm, temperature-tuned NoPE queries, input-scaled MoE.

Role of the reference's Llama-4 support (``auto_round/modeling/fused_moe``
llama4 spec).  Arch quirks, all config-driven:

* **NoPE layers**: every layer where ``no_rope_layers[i] == 0`` skips
  rope entirely; with ``attn_temperature_tuning`` its queries scale by
  ``log1p(floor((pos+1)/floor_scale))·attn_scale + 1`` (position-aware
  temperature, HF ``Llama4TextAttention``).
* **Chunked attention**: rope layers attend block-diagonally within
  ``attention_chunk_size`` chunks (causal inside a chunk) — NOT a
  sliding window.
* **L2 q/k norm** (weightless) after rope, rope layers only.
* **Input-scaled MoE**: the router takes top-k logits, squashes them
  with sigmoid, and scales each expert's INPUT tokens (not its output)
  — ``y = Σ_e expert_e(x · s_e)``; non-selected experts see zeros.  A
  dense shared expert always adds.  HF stores experts as fused
  ``gate_up_proj (E, H, 2I)`` (gate/up CHUNKED halves) + ``down_proj
  (E, I, H)``; the loader splits them into per-expert (O, I) leaves.
* Rope is the complex-pair form — score-equivalent to the interleaved
  permutation (L2 norm is permutation-invariant, so applying it in the
  permuted basis is exact).

Numerics match ``transformers`` ``Llama4ForCausalLM`` (eager); locked by
logit parity in ``tests/test_llama4.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig, rms_norm

__all__ = ["Llama4Config", "init_params", "block_fwd", "model_fwd",
           "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Llama4Config(LlamaConfig):
    num_experts: int = 16
    top_k: int = 1
    # dense layers (and nothing else) use intermediate_size_mlp;
    # intermediate_size is the routed/shared expert width
    intermediate_size_mlp: int = 16384
    moe_layers: Tuple[int, ...] = ()
    # 1 = rope layer, 0 = NoPE (HF no_rope_layers).  Rope layers attend
    # chunked; the chunk size rides on the shared sliding_window field
    # with chunked_attention=True, so the generic sliding machinery
    # (tuning masks, per-layer selection) covers Llama4 unchanged.
    no_rope_layers: Tuple[int, ...] = ()
    chunked_attention: bool = True
    use_qk_norm: bool = True            # weightless L2 norm on rope layers
    attn_temperature_tuning: bool = True
    floor_scale: float = 8192.0
    temp_attn_scale: float = 0.1


def _mk_layers(n, nope_every=4, moe_step=1):
    no_rope = tuple(0 if (i + 1) % nope_every == 0 else 1 for i in range(n))
    moe = tuple(i for i in range(n) if (i + 1) % moe_step == 0)
    return no_rope, moe


CONFIG_PRESETS: Dict[str, Llama4Config] = {
    "tiny-llama4": Llama4Config(
        vocab_size=256, hidden_size=64, intermediate_size=64,
        intermediate_size_mlp=128, num_layers=4, num_heads=4,
        num_kv_heads=2, head_dim=16, rope_theta=10000.0, rms_eps=1e-5,
        num_experts=4, top_k=2, moe_layers=(0, 2),
        no_rope_layers=(1, 1, 1, 0), sliding_window=8,
        layer_types=("sliding_attention", "sliding_attention",
                     "sliding_attention", "full_attention"),
        dtype=jnp.float32),
    "llama4-scout-16e": Llama4Config(
        vocab_size=202048, hidden_size=5120, intermediate_size=8192,
        intermediate_size_mlp=16384, num_layers=48, num_heads=40,
        num_kv_heads=8, head_dim=128, rope_theta=500000.0, rms_eps=1e-5,
        num_experts=16, top_k=1,
        moe_layers=tuple(range(48)),
        no_rope_layers=_mk_layers(48)[0], sliding_window=8192,
        layer_types=tuple(
            "sliding_attention" if r else "full_attention"
            for r in _mk_layers(48)[0])),
}

_MLP = ("gate_proj", "up_proj", "down_proj")


def block_linear_names(cfg: Llama4Config) -> Tuple[str, ...]:
    names = ("q_proj", "k_proj", "v_proj", "o_proj") + _MLP
    if cfg.moe_layers:
        names += tuple(f"experts.{e}.{w}"
                       for e in range(cfg.num_experts) for w in _MLP)
        names += tuple(f"shared_expert.{w}" for w in _MLP)
    return names


def init_params(cfg: Llama4Config, key: jax.Array) -> Dict[str, Any]:
    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    keys = jax.random.split(key, cfg.num_layers + 2)

    def mlp(k, I):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "gate_proj": jax.random.normal(k1, (I, H), cfg.dtype) * 0.02,
            "up_proj": jax.random.normal(k2, (I, H), cfg.dtype) * 0.02,
            "down_proj": jax.random.normal(k3, (H, I), cfg.dtype) * 0.02
                         / np.sqrt(2 * cfg.num_layers),
        }

    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 7)
        b: Dict[str, Any] = {
            "q_proj": jax.random.normal(bk[0], (qd, H), cfg.dtype) * 0.02,
            "k_proj": jax.random.normal(bk[1], (kvd, H), cfg.dtype) * 0.02,
            "v_proj": jax.random.normal(bk[2], (kvd, H), cfg.dtype) * 0.02,
            "o_proj": jax.random.normal(bk[3], (H, qd), cfg.dtype) * 0.02
                      / np.sqrt(2 * cfg.num_layers),
            "input_layernorm": jnp.ones((H,), cfg.dtype),
            "post_attention_layernorm": jnp.ones((H,), cfg.dtype),
        }
        if li in cfg.moe_layers:
            b["router"] = jax.random.normal(bk[4], (cfg.num_experts, H),
                                            cfg.dtype) * 0.02
            b["experts"] = [mlp(jax.random.fold_in(bk[5], e),
                                cfg.intermediate_size)
                            for e in range(cfg.num_experts)]
            b["shared_expert"] = mlp(bk[6], cfg.intermediate_size)
        else:
            b.update(mlp(bk[4], cfg.intermediate_size_mlp))
        blocks.append(b)
    params: Dict[str, Any] = {
        "embed_tokens": jax.random.normal(keys[-2], (cfg.vocab_size, H),
                                          cfg.dtype) * 0.02,
        "norm": jnp.ones((H,), cfg.dtype),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(keys[-1], (cfg.vocab_size, H),
                                              cfg.dtype) * 0.02
    return params


def _interleave(x):
    """Even/odd element pairs → halves (complex rope basis; both q and k
    share the permutation, so attention scores are exact)."""
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


def _l2_norm(x, eps):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)).astype(x.dtype)


def _moe_mlp(weights, h, cfg: Llama4Config, lf,
             capacity_factor: float = 0.0):
    """Llama4 router: sigmoid(top-k logits) scales each expert's INPUT
    (non-selected experts see zeros → contribute zero exactly).

    Serving fast paths mirror ``mixtral._moe_mlp``: stacked experts run
    through ``lf.grouped`` (one grouped Pallas GEMM per projection), and
    ``capacity_factor > 0`` switches to capacity dispatch with
    ``scale_input=True`` (the routing weight multiplies the expert input,
    matching the dense semantics above)."""
    act = llama._act(cfg.hidden_act)
    logits = jnp.einsum("...h,eh->...e", h.astype(jnp.float32),
                        weights["router"].astype(jnp.float32))
    topv, topi = jax.lax.top_k(logits, cfg.top_k)
    thresh = topv[..., -1:]                      # smallest selected logit
    selected = logits >= thresh
    scores = jnp.where(selected, jax.nn.sigmoid(logits), 0.0)  # (..., E)

    gnames = getattr(lf, "grouped_names", frozenset())
    use_grouped = {"gate_proj", "up_proj", "down_proj"} <= set(gnames)

    def grouped_swiglu(buf):  # (E, C, H) → (E, C, H)
        mid = act(lf.grouped("gate_proj", buf)) * lf.grouped("up_proj",
                                                             buf)
        return lf.grouped("down_proj", mid)

    # expert parallelism (tp engine): this shard owns El experts at `off`
    E = cfg.num_experts
    off = getattr(lf, "expert_offset", 0)
    El = getattr(lf, "local_experts", E)
    combine = getattr(lf, "expert_combine", None)

    if capacity_factor and capacity_factor > 0:
        from .mixtral import capacity_dispatch

        def apply_expert(e, xb):
            ew = weights["experts"][e]
            gate = act(lf(f"experts.{e}.gate_proj", xb, ew["gate_proj"]))
            up = lf(f"experts.{e}.up_proj", xb, ew["up_proj"])
            return lf(f"experts.{e}.down_proj", gate * up,
                      ew["down_proj"])

        out = capacity_dispatch(
            h, topi, jax.nn.sigmoid(topv), El if use_grouped else E,
            capacity_factor, apply_expert,
            grouped_apply=grouped_swiglu if use_grouped else None,
            expert_offset=off if use_grouped else 0, n_global_experts=E,
            scale_input=True)
        if combine is not None and use_grouped:
            out = combine(out)
        out = out.astype(jnp.float32)
    elif use_grouped:
        # dense path through the grouped kernel: expert e's slab is
        # score_e · h (zero rows for unselected → exact zero output,
        # SwiGLU has no bias), so the combine is a plain sum over the
        # local experts (+ psum across shards under EP)
        B, S, H = h.shape
        sc_loc = jax.lax.dynamic_slice_in_dim(
            scores.reshape(B * S, E), off, El, 1)
        buf = (h.astype(jnp.float32).reshape(1, B * S, H)
               * sc_loc.T[:, :, None]).astype(h.dtype)
        out = jnp.sum(grouped_swiglu(buf).astype(jnp.float32),
                      axis=0).reshape(B, S, H)
        if combine is not None:
            out = combine(out)
    else:
        out = jnp.zeros_like(h, dtype=jnp.float32)
        for e, ew in enumerate(weights["experts"]):
            xe = (h.astype(jnp.float32)
                  * scores[..., e:e + 1]).astype(h.dtype)
            gate = act(lf(f"experts.{e}.gate_proj", xe, ew["gate_proj"]))
            up = lf(f"experts.{e}.up_proj", xe, ew["up_proj"])
            y = lf(f"experts.{e}.down_proj", gate * up, ew["down_proj"])
            out = out + y.astype(jnp.float32)
    sw = weights["shared_expert"]
    gate = act(lf("shared_expert.gate_proj", h, sw["gate_proj"]))
    up = lf("shared_expert.up_proj", h, sw["up_proj"])
    out = out + lf("shared_expert.down_proj", gate * up,
                   sw["down_proj"]).astype(jnp.float32)
    return out.astype(h.dtype)


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: Llama4Config, mask=None, linear_fn=None,
              use_rope: bool = True,
              positions: Optional[jax.Array] = None) -> jax.Array:
    """``use_rope`` is the STATIC layer kind (rope+chunked vs NoPE+
    temperature) — the registry's ``block_fwd_for`` binds it per layer so
    the orchestrator's generic chain stays layer-agnostic."""
    lf = linear_fn or llama._plain_linear
    B, S, H = x.shape
    hd = cfg.hd
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    q = lf("q_proj", h, weights["q_proj"]).reshape(B, S, cfg.num_heads, hd)
    k = lf("k_proj", h, weights["k_proj"]).reshape(B, S, cfg.num_kv_heads,
                                                   hd)
    v = lf("v_proj", h, weights["v_proj"]).reshape(B, S, cfg.num_kv_heads,
                                                   hd)
    if use_rope:
        q = llama.apply_rope(_interleave(q), cos, sin)
        k = llama.apply_rope(_interleave(k), cos, sin)
        if cfg.use_qk_norm:
            q = _l2_norm(q, cfg.rms_eps)
            k = _l2_norm(k, cfg.rms_eps)
    elif cfg.attn_temperature_tuning:
        pos = (positions if positions is not None
               else jnp.arange(S))                  # (S,) or (B, S)
        ts = (jnp.log1p(jnp.floor((pos.astype(jnp.float32) + 1.0)
                                  / cfg.floor_scale))
              * cfg.temp_attn_scale + 1.0)
        ts = ts[..., None, None]                    # (S,1,1) / (B,S,1,1)
        if ts.ndim == 3:
            ts = ts[None]
        q = (q.astype(jnp.float32) * ts).astype(q.dtype)
    attn = llama.attention(q, k, v, mask, cfg)
    x = x + lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    if "experts" in weights:
        x = x + _moe_mlp(weights, h, cfg, lf)
    else:
        act = llama._act(cfg.hidden_act)
        gate = act(lf("gate_proj", h, weights["gate_proj"]))
        up = lf("up_proj", h, weights["up_proj"])
        x = x + lf("down_proj", gate * up, weights["down_proj"])
    return x


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: Llama4Config) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    S = input_ids.shape[1]
    cos, sin = llama.rope_tables(cfg, S)
    cmask = (llama.sliding_mask(cfg, S)
             if cfg.sliding_window is not None
             and S > cfg.sliding_window else None)
    for li, b in enumerate(params["blocks"]):
        use_rope = layer_uses_rope(cfg, li)
        # rope layers chunk; NoPE layers attend globally (causal)
        mask = (cmask if cmask is not None
                and llama.layer_is_sliding(cfg, li) else None)
        x = block_fwd(b, x, cos, sin, cfg, mask=mask, use_rope=use_rope)
    return llama.final_fwd(params, x, cfg)


def layer_uses_rope(cfg: Llama4Config, li: int) -> bool:
    return cfg.no_rope_layers[li] != 0 if cfg.no_rope_layers else True


import functools as _ft


@_ft.lru_cache(maxsize=8)
def _variant_fn(use_rope: bool):
    def fn(w, x, cos, sin, cfg, mask=None, linear_fn=None):
        return block_fwd(w, x, cos, sin, cfg, mask=mask,
                         linear_fn=linear_fn, use_rope=use_rope)
    return fn


def block_fwd_for(cfg: Llama4Config, li: int):
    """Per-layer forward variant (STABLE per kind — at most two callable
    identities, so the orchestrator's compile caches stay small)."""
    return _variant_fn(layer_uses_rope(cfg, li))
