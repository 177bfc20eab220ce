"""Pure-JAX Qwen3-Next decoder: hybrid GatedDeltaNet linear attention +
gated full attention + Qwen-MoE.

Role of the reference's qwen3-next support (``auto_round/modeling/
unfused_moe/qwen3_next.py``).  Layer kinds by ``layer_types``:

* **linear_attention** (3 of every 4 layers): Gated DeltaNet — fused
  qkvz/ba input projections, depthwise causal conv (k=4) + SiLU over the
  concatenated q/k/v stream, L2-normed q/k, and the gated delta rule
  ``S_t = α_t S_{t-1} + β_t k_t (v_t − k_tᵀ S_{t-1})`` computed in
  TPU-friendly 64-token chunks: the per-chunk UT transform is one
  triangular solve (``(I − A)⁻¹`` via ``solve_triangular`` instead of
  the reference torch row-recurrence) and the cross-chunk state is a
  ``lax.scan``.  Output goes through a gated RMSNorm (``norm(x)·silu(z)``)
  and ``out_proj``.
* **full_attention** (every 4th): q_proj emits query AND an output gate
  (per-head chunked halves); per-head q/k RMSNorm, partial rotary,
  standard GQA attention, then ``attn · sigmoid(gate)`` before o_proj.
* **MoE** (every layer by default): Qwen2-MoE semantics — reuses
  :func:`..models.mixtral._moe_mlp` (softmax router + norm_topk +
  sigmoid-gated shared expert) with w1/w3/w2 expert leaves.

All projections (in_proj_qkvz/ba, out_proj, attention, experts) are
plain (O, I) leaves, so the standard tuning interceptor quantizes the
whole hybrid stack.  Numerics match ``transformers``
``Qwen3NextForCausalLM`` (eager); locked by logit parity in
``tests/test_qwen3next.py``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama, mixtral
from .llama import rms_norm
from .mixtral import MixtralConfig

__all__ = ["Qwen3NextConfig", "Qwen35MoeConfig", "init_params", "block_fwd", "model_fwd",
           "block_linear_names", "block_fwd_for", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Qwen3NextConfig(MixtralConfig):
    # layer_types: "linear_attention" / "full_attention" per layer
    linear_num_key_heads: int = 16
    linear_num_value_heads: int = 32
    linear_key_head_dim: int = 128
    linear_value_head_dim: int = 128
    linear_conv_kernel_dim: int = 4
    # MoE fields ride on MixtralConfig (num_experts, top_k,
    # shared_expert_intermediate, shared_expert_gate, norm_topk_prob);
    # mlp_only_layers use a dense MLP at intermediate_size
    moe_intermediate_size: int = 0
    mlp_only_layers: Tuple[int, ...] = ()
    delta_chunk: int = 64


@dataclass(frozen=True)
class Qwen35MoeConfig(Qwen3NextConfig):
    """Qwen3.5-MoE (HF ``Qwen3_5MoeForCausalLM``): the Qwen3-Next
    hybrid (gated DeltaNet linear-attention layers + full-attention
    layers, sigmoid-gated shared expert) with FUSED per-expert
    checkpoint stacks and an ``mtp.*`` draft namespace.  Role of the
    reference's spec (``modeling/fused_moe/qwen3_5_moe.py`` —
    ``SequentialQwen3_5MoeExperts`` splits ``gate_up_proj``/``down_proj``
    (E, ·, ·) stacks into per-expert linears, exactly what
    ``utils/hf_loader.py`` does on load; shared expert + sigmoid
    ``shared_expert_gate`` as in the replacement's forward).  Text-only
    positions collapse the interleaved MRoPE to standard rope, so the
    Qwen3-Next tables apply; MTP draft layers are skipped on load (the
    reference's GGUF converter treats them as an optional side file)."""


CONFIG_PRESETS: Dict[str, Qwen3NextConfig] = {
    "tiny-qwen35moe": Qwen35MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=64, num_layers=3, num_heads=4,
        num_kv_heads=2, head_dim=16, partial_rotary_factor=0.25,
        rope_theta=10000.0, rms_eps=1e-6, qk_norm=True, norm_offset=1.0,
        layer_types=("linear_attention", "full_attention",
                     "linear_attention"),
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        num_experts=4, top_k=2, shared_expert_intermediate=64,
        shared_expert_gate=True, norm_topk_prob=True, delta_chunk=8,
        dtype=jnp.float32),
    "tiny-qwen3next": Qwen3NextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=64, num_layers=4, num_heads=4,
        num_kv_heads=2, head_dim=16, partial_rotary_factor=0.25,
        rope_theta=10000.0, rms_eps=1e-6, qk_norm=True, norm_offset=1.0,
        layer_types=("linear_attention", "linear_attention",
                     "linear_attention", "full_attention"),
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        num_experts=4, top_k=2, shared_expert_intermediate=64,
        shared_expert_gate=True, norm_topk_prob=True, delta_chunk=8,
        dtype=jnp.float32),
}

_MLP = ("w1", "w2", "w3")


def _is_linear_layer(cfg: Qwen3NextConfig, li: int) -> bool:
    return (cfg.layer_types or ())[li] == "linear_attention"


def _is_moe_layer(cfg: Qwen3NextConfig, li: int) -> bool:
    return cfg.num_experts > 0 and li not in cfg.mlp_only_layers


def block_linear_names(cfg: Qwen3NextConfig) -> Tuple[str, ...]:
    # in_proj_ba stays FP like the router: it parametrizes the delta-rule
    # gates (beta / decay) — negligible size (2·nv rows), outsized damage
    names = ("q_proj", "k_proj", "v_proj", "o_proj",
             "in_proj_qkvz", "out_proj",
             "gate_proj", "up_proj", "down_proj")
    if cfg.num_experts:
        names += tuple(f"experts.{e}.{w}"
                       for e in range(cfg.num_experts) for w in _MLP)
        if cfg.shared_expert_intermediate:
            names += tuple(f"shared_expert.{w}" for w in _MLP)
    return names


def init_params(cfg: Qwen3NextConfig, key: jax.Array) -> Dict[str, Any]:
    H, hd = cfg.hidden_size, cfg.hd
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    Kd, Vd = nk * dk, nv * dv
    conv_dim = 2 * Kd + Vd
    keys = jax.random.split(key, cfg.num_layers + 2)

    def mlp(k, I):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"w1": jax.random.normal(k1, (I, H), cfg.dtype) * 0.02,
                "w3": jax.random.normal(k2, (I, H), cfg.dtype) * 0.02,
                "w2": jax.random.normal(k3, (H, I), cfg.dtype) * 0.02
                      / np.sqrt(2 * cfg.num_layers)}

    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 9)
        b: Dict[str, Any] = {
            "input_layernorm": jnp.ones((H,), cfg.dtype),
            "post_attention_layernorm": jnp.ones((H,), cfg.dtype),
        }
        if _is_linear_layer(cfg, li):
            b["in_proj_qkvz"] = jax.random.normal(
                bk[0], (2 * Kd + 2 * Vd, H), cfg.dtype) * 0.02
            b["in_proj_ba"] = jax.random.normal(
                bk[1], (2 * nv, H), cfg.dtype) * 0.02
            b["conv1d"] = jax.random.normal(
                bk[2], (conv_dim, cfg.linear_conv_kernel_dim),
                cfg.dtype) * 0.1
            b["dt_bias"] = jnp.ones((nv,), jnp.float32)
            b["A_log"] = jnp.log(jax.random.uniform(
                bk[3], (nv,), jnp.float32, 1e-3, 16.0))
            b["linear_norm"] = jnp.ones((dv,), cfg.dtype)
            b["out_proj"] = jax.random.normal(bk[4], (H, Vd),
                                              cfg.dtype) * 0.02
        else:
            qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
            b["q_proj"] = jax.random.normal(bk[0], (2 * qd, H),
                                            cfg.dtype) * 0.02
            b["k_proj"] = jax.random.normal(bk[1], (kvd, H),
                                            cfg.dtype) * 0.02
            b["v_proj"] = jax.random.normal(bk[2], (kvd, H),
                                            cfg.dtype) * 0.02
            b["o_proj"] = jax.random.normal(bk[3], (H, qd),
                                            cfg.dtype) * 0.02
            b["q_norm"] = jnp.ones((hd,), cfg.dtype)
            b["k_norm"] = jnp.ones((hd,), cfg.dtype)
        if _is_moe_layer(cfg, li):
            mi = cfg.moe_intermediate_size
            b["router"] = jax.random.normal(bk[5], (cfg.num_experts, H),
                                            cfg.dtype) * 0.02
            b["experts"] = [mlp(jax.random.fold_in(bk[6], e), mi)
                            for e in range(cfg.num_experts)]
            if cfg.shared_expert_intermediate:
                b["shared_expert"] = mlp(bk[7],
                                         cfg.shared_expert_intermediate)
                if cfg.shared_expert_gate:
                    b["shared_expert_gate"] = jax.random.normal(
                        bk[8], (1, H), cfg.dtype) * 0.02
        else:
            b.update({
                {"w1": "gate_proj", "w3": "up_proj",
                 "w2": "down_proj"}[k]: v
                for k, v in mlp(bk[5], cfg.intermediate_size).items()})
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


def _l2norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)
                              + eps)


def chunk_gated_delta_rule(q, k, v, g, beta, chunk: int = 64,
                           return_state: bool = False):
    """Chunked gated delta rule (HF ``torch_chunk_gated_delta_rule``,
    numerics-equivalent): q/k/v (B, S, H, d*), g/beta (B, S, H) →
    (B, S, H, dv).  The intra-chunk UT transform ``(I − A)⁻¹`` is one
    batched unit-lower triangular solve (MXU-friendly) and the
    cross-chunk recurrence is a ``lax.scan`` over the state (dk, dv)."""
    f32 = jnp.float32
    q = _l2norm(q)
    k = _l2norm(k)
    B, S, H, dk = q.shape
    dv = v.shape[-1]
    # (B, H, S, d)
    q, k, v = (x.transpose(0, 2, 1, 3).astype(f32) for x in (q, k, v))
    g = g.transpose(0, 2, 1).astype(f32)
    beta = beta.transpose(0, 2, 1).astype(f32)
    pad = (-S) % chunk
    if pad:
        q, k, v = (jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                   for x in (q, k, v))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad)))
        beta = jnp.pad(beta, ((0, 0), (0, 0), (0, pad)))
    St = S + pad
    N, C = St // chunk, chunk
    q = q * (dk ** -0.5)
    v_beta = v * beta[..., None]
    k_beta = k * beta[..., None]
    # chunked views (B, H, N, C, d)
    q, k, v, k_beta, v_beta = (
        x.reshape(B, H, N, C, -1) for x in (q, k, v, k_beta, v_beta))
    g = jnp.cumsum(g.reshape(B, H, N, C), axis=-1)
    tril = jnp.tril(jnp.ones((C, C), bool))
    strict = jnp.tril(jnp.ones((C, C), bool), k=-1)
    decay = jnp.where(tril, jnp.exp(jnp.where(
        tril, g[..., :, None] - g[..., None, :], 0.0)), 0.0)
    A = jnp.where(strict, -(jnp.einsum("bhncd,bhnkd->bhnck",
                                       k_beta, k) * decay), 0.0)
    # UT transform: T = (I − A)⁻¹, A strictly lower → unit-lower solve
    eye = jnp.eye(C, dtype=f32)
    T = jax.scipy.linalg.solve_triangular(
        eye - A, jnp.broadcast_to(eye, A.shape), lower=True,
        unit_diagonal=True)
    v_t = jnp.einsum("bhnck,bhnkd->bhncd", T, v_beta)
    k_cumdecay = jnp.einsum("bhnck,bhnkd->bhncd", T,
                            k_beta * jnp.exp(g)[..., None])

    def step(state, xs):
        q_i, k_i, v_i, kcd_i, g_i, dmask_i = xs
        attn = jnp.where(strict | jnp.eye(C, dtype=bool),
                         jnp.einsum("bhcd,bhkd->bhck", q_i, k_i)
                         * dmask_i, 0.0)
        v_prime = jnp.einsum("bhcd,bhdv->bhcv", kcd_i, state)
        v_new = v_i - v_prime
        inter = jnp.einsum("bhcd,bhdv->bhcv",
                           q_i * jnp.exp(g_i)[..., None], state)
        out_i = inter + jnp.einsum("bhck,bhkv->bhcv", attn, v_new)
        g_last = g_i[..., -1:]
        state = (state * jnp.exp(g_last)[..., None]
                 + jnp.einsum("bhcd,bhcv->bhdv",
                              k_i * jnp.exp(g_last - g_i)[..., None],
                              v_new))
        return state, out_i

    xs = (q.transpose(2, 0, 1, 3, 4), k.transpose(2, 0, 1, 3, 4),
          v_t.transpose(2, 0, 1, 3, 4),
          k_cumdecay.transpose(2, 0, 1, 3, 4),
          g.transpose(2, 0, 1, 3),
          decay.transpose(2, 0, 1, 3, 4))
    state0 = jnp.zeros((B, H, dk, dv), f32)
    final_state, outs = jax.lax.scan(step, state0, xs)  # (N, B, H, C, dv)
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, St, dv)
    out = out[:, :, :S].transpose(0, 2, 1, 3)       # (B, S, H, dv)
    if return_state:
        # NOTE: with padding the last chunk's tail is zeros — zeros have
        # k=0 so they do not perturb the state, but the decay g pads as 0
        # (exp(0)=1), which is also a no-op.  Exact.
        return out, final_state
    return out


def _gated_delta_net(weights, h, cfg: Qwen3NextConfig, lf,
                     return_cache: bool = False):
    """GatedDeltaNet token mixer (full-sequence form — tuning/eval).
    ``return_cache`` also returns (conv_tail (B, K-1, conv_dim) raw
    pre-conv inputs, recurrent state (B, nv, dk, dv)) for decode."""
    B, S, _ = h.shape
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    r = nv // nk
    qkvz = lf("in_proj_qkvz", h, weights["in_proj_qkvz"])
    ba = lf("in_proj_ba", h, weights["in_proj_ba"])
    # per-k-head interleaved layout (HF fix_query_key_value_ordering)
    qkvz = qkvz.reshape(B, S, nk, 2 * dk + 2 * r * dv)
    qh = qkvz[..., :dk]
    kh = qkvz[..., dk:2 * dk]
    vh = qkvz[..., 2 * dk:2 * dk + r * dv].reshape(B, S, nv, dv)
    z = qkvz[..., 2 * dk + r * dv:].reshape(B, S, nv, dv)
    ba = ba.reshape(B, S, nk, 2 * r)
    b = ba[..., :r].reshape(B, S, nv)
    a = ba[..., r:].reshape(B, S, nv)
    # depthwise causal conv over the concatenated q/k/v stream + SiLU
    mixed_raw = jnp.concatenate([qh.reshape(B, S, -1),
                                 kh.reshape(B, S, -1),
                                 vh.reshape(B, S, -1)], axis=-1)
    w = weights["conv1d"].astype(jnp.float32)      # (conv_dim, K)
    K = w.shape[1]
    xpad = jnp.pad(mixed_raw.astype(jnp.float32),
                   ((0, 0), (K - 1, 0), (0, 0)))
    conv = sum(xpad[:, i:i + S, :] * w[:, i][None, None, :]
               for i in range(K))
    mixed = jax.nn.silu(conv)
    Kd = nk * dk
    q = mixed[..., :Kd].reshape(B, S, nk, dk)
    k = mixed[..., Kd:2 * Kd].reshape(B, S, nk, dk)
    v = mixed[..., 2 * Kd:].reshape(B, S, nv, dv)
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = (-jnp.exp(weights["A_log"].astype(jnp.float32))
         * jax.nn.softplus(a.astype(jnp.float32)
                           + weights["dt_bias"].astype(jnp.float32)))
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    if return_cache:
        core, state = chunk_gated_delta_rule(q, k, v, g, beta,
                                             cfg.delta_chunk,
                                             return_state=True)
    else:
        core = chunk_gated_delta_rule(q, k, v, g, beta, cfg.delta_chunk)
    # gated RMSNorm: norm(x) * silu(z), per value head
    xn = rms_norm(core.astype(cfg.dtype), weights["linear_norm"],
                  cfg.rms_eps).astype(jnp.float32)
    out = (xn * jax.nn.silu(z.astype(jnp.float32))).astype(h.dtype)
    y = lf("out_proj", out.reshape(B, S, nv * dv), weights["out_proj"])
    if return_cache:
        Kc = weights["conv1d"].shape[1]
        # raw pre-conv inputs of the last K-1 tokens (left-pad for S<K-1)
        tail = jnp.pad(mixed_raw, ((0, 0), (Kc - 1, 0), (0, 0)))[
            :, S:S + Kc - 1, :]
        return y, tail, state
    return y


def _full_attention(weights, h, cos, sin, cfg: Qwen3NextConfig, lf):
    """Gated full attention: q_proj emits per-head (query, gate) halves;
    attn output multiplies sigmoid(gate) before o_proj.  All
    Qwen3NextRMSNorms are zero-centered (1 + w) — norm_offset=1."""
    B, S, _ = h.shape
    hd = cfg.hd
    qg = lf("q_proj", h, weights["q_proj"]).reshape(
        B, S, cfg.num_heads, 2 * hd)
    q, gate = qg[..., :hd], qg[..., hd:]
    k = lf("k_proj", h, weights["k_proj"]).reshape(
        B, S, cfg.num_kv_heads, hd)
    v = lf("v_proj", h, weights["v_proj"]).reshape(
        B, S, cfg.num_kv_heads, hd)
    q = rms_norm(q, weights["q_norm"], cfg.rms_eps, cfg.norm_offset)
    k = rms_norm(k, weights["k_norm"], cfg.rms_eps, cfg.norm_offset)
    q = llama.apply_rope(q, cos, sin)
    k = llama.apply_rope(k, cos, sin)
    attn = llama.attention(q, k, v, None, cfg)
    attn = (attn.astype(jnp.float32)
            * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(h.dtype)
    return lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: Qwen3NextConfig, mask=None, linear_fn=None,
              linear_attn: bool = True) -> jax.Array:
    lf = linear_fn or llama._plain_linear
    off = cfg.norm_offset
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps, off)
    if linear_attn:
        x = x + _gated_delta_net(weights, h, cfg, lf)
    else:
        x = x + _full_attention(weights, h, cos, sin, cfg, lf)
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps, off)
    if "experts" in weights:
        x = x + mixtral._moe_mlp(weights, h, cfg, lf)
    else:
        act = llama._act(cfg.hidden_act)
        gate = act(lf("gate_proj", h, weights["gate_proj"]))
        up = lf("up_proj", h, weights["up_proj"])
        x = x + lf("down_proj", gate * up, weights["down_proj"])
    return x


@functools.lru_cache(maxsize=8)
def _variant_fn(linear_attn: bool):
    def fn(w, x, cos, sin, cfg, mask=None, linear_fn=None):
        return block_fwd(w, x, cos, sin, cfg, mask=mask,
                         linear_fn=linear_fn, linear_attn=linear_attn)
    return fn


def block_fwd_for(cfg: Qwen3NextConfig, li: int):
    """Per-layer forward variant (linear vs full attention) — stable
    callable identities keep the orchestrator compile caches at two."""
    return _variant_fn(_is_linear_layer(cfg, li))


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: Qwen3NextConfig) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = llama.rope_tables(cfg, input_ids.shape[1])
    for li, b in enumerate(params["blocks"]):
        x = block_fwd(b, x, cos, sin, cfg,
                      linear_attn=_is_linear_layer(cfg, li))
    return llama.final_fwd(params, x, cfg)


def gated_delta_step(weights, h, cfg: Qwen3NextConfig, lf, conv_tail,
                    state):
    """One-token GatedDeltaNet decode (HF ``torch_recurrent_gated_delta_
    rule`` + ``causal_conv1d_update``): O(1) per token — the linear-
    attention serving win.  h (B, 1, H); conv_tail (B, K-1, conv_dim)
    raw pre-conv inputs; state (B, nv, dk, dv) f32.  Returns
    (out (B, 1, H), new_tail, new_state)."""
    B = h.shape[0]
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    r = nv // nk
    f32 = jnp.float32
    qkvz = lf("in_proj_qkvz", h, weights["in_proj_qkvz"])
    ba = lf("in_proj_ba", h, weights["in_proj_ba"])
    qkvz = qkvz.reshape(B, 1, nk, 2 * dk + 2 * r * dv)
    qh = qkvz[..., :dk]
    kh = qkvz[..., dk:2 * dk]
    vh = qkvz[..., 2 * dk:2 * dk + r * dv].reshape(B, 1, nv, dv)
    z = qkvz[..., 2 * dk + r * dv:].reshape(B, 1, nv, dv)
    ba = ba.reshape(B, 1, nk, 2 * r)
    b = ba[..., :r].reshape(B, nv)
    a = ba[..., r:].reshape(B, nv)
    mixed = jnp.concatenate([qh.reshape(B, 1, -1), kh.reshape(B, 1, -1),
                             vh.reshape(B, 1, -1)], axis=-1)
    window = jnp.concatenate([conv_tail.astype(f32),
                              mixed.astype(f32)], axis=1)  # (B, K, cd)
    w = weights["conv1d"].astype(f32)                      # (cd, K)
    conv = jnp.einsum("bkc,ck->bc", window, w)
    mixed_c = jax.nn.silu(conv)                            # (B, cd)
    Kd = nk * dk
    q = mixed_c[:, :Kd].reshape(B, nk, dk)
    k = mixed_c[:, Kd:2 * Kd].reshape(B, nk, dk)
    v = mixed_c[:, 2 * Kd:].reshape(B, nv, dv)
    if r > 1:
        q = jnp.repeat(q, r, axis=1)
        k = jnp.repeat(k, r, axis=1)
    q = _l2norm(q) * (dk ** -0.5)
    k = _l2norm(k)
    beta = jax.nn.sigmoid(b.astype(f32))                   # (B, nv)
    g = (-jnp.exp(weights["A_log"].astype(f32))
         * jax.nn.softplus(a.astype(f32)
                           + weights["dt_bias"].astype(f32)))
    state = state * jnp.exp(g)[..., None, None]
    kv_mem = jnp.einsum("bhdv,bhd->bhv", state, k)
    delta = (v.astype(f32) - kv_mem) * beta[..., None]
    state = state + jnp.einsum("bhd,bhv->bhdv", k, delta)
    core = jnp.einsum("bhdv,bhd->bhv", state, q)           # (B, nv, dv)
    xn = rms_norm(core[:, None].astype(cfg.dtype), weights["linear_norm"],
                  cfg.rms_eps).astype(f32)
    out = (xn * jax.nn.silu(z.astype(f32))).astype(h.dtype)
    y = lf("out_proj", out.reshape(B, 1, nv * dv), weights["out_proj"])
    return y, window[:, 1:].astype(conv_tail.dtype), state


def full_attention_with_cache(weights, h, cos, sin, cfg: Qwen3NextConfig,
                              lf, kv, pos):
    """Gated full attention over a preallocated cache (scalar pos).
    kv=None → prefill (causal, returns k/v for the cache)."""
    B, S, _ = h.shape
    hd = cfg.hd
    qg = lf("q_proj", h, weights["q_proj"]).reshape(
        B, S, cfg.num_heads, 2 * hd)
    q, gate = qg[..., :hd], qg[..., hd:]
    k = lf("k_proj", h, weights["k_proj"]).reshape(
        B, S, cfg.num_kv_heads, hd)
    v = lf("v_proj", h, weights["v_proj"]).reshape(
        B, S, cfg.num_kv_heads, hd)
    q = rms_norm(q, weights["q_norm"], cfg.rms_eps, cfg.norm_offset)
    k = rms_norm(k, weights["k_norm"], cfg.rms_eps, cfg.norm_offset)
    q = llama.apply_rope(q, cos, sin)
    k = llama.apply_rope(k, cos, sin)
    k_new, v_new = k, v
    if kv is None:
        attn = llama.attention(q, k, v, None, cfg)
    else:
        k_all, v_all = kv
        T = k_all.shape[1]
        k_full = jax.lax.dynamic_update_slice(
            k_all, k.astype(k_all.dtype), (0, pos, 0, 0))
        v_full = jax.lax.dynamic_update_slice(
            v_all, v.astype(v_all.dtype), (0, pos, 0, 0))
        idx = jnp.arange(T)
        bias = jnp.where(idx <= pos, 0.0, -1e30)[None, None, None, :]
        attn = llama.attention(q, k_full, v_full, bias, cfg)
    attn = (attn.astype(jnp.float32)
            * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(h.dtype)
    return (lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"]),
            k_new, v_new)


def block_with_cache(weights, x, cos, sin, cfg: Qwen3NextConfig, cache_in,
                     pos, lf):
    """Serving block: returns (out, cache_pieces).

    ``cache_in``: None (prefill) or ("lin", conv_tail, state) /
    ("full", k_all, v_all) for decode.  cache_pieces mirrors the layer
    kind: ("lin", tail, state) or ("full", k_new, v_new)."""
    off = cfg.norm_offset
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps, off)
    if "in_proj_qkvz" in weights:
        if cache_in is None:
            y, tail, state = _gated_delta_net(weights, h, cfg, lf,
                                              return_cache=True)
        else:
            _, tail_in, state_in = cache_in
            y, tail, state = gated_delta_step(weights, h, cfg, lf,
                                              tail_in, state_in)
        pieces = ("lin", tail, state)
    else:
        kv = None if cache_in is None else (cache_in[1], cache_in[2])
        y, k_new, v_new = full_attention_with_cache(
            weights, h, cos, sin, cfg, lf, kv, pos)
        pieces = ("full", k_new, v_new)
    x = x + y
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps, off)
    if "experts" in weights:
        from .. import envs
        x = x + mixtral._moe_mlp(weights, h, cfg, lf,
                                 capacity_factor=envs.AR_MOE_CAPACITY_FACTOR)
    else:
        act = llama._act(cfg.hidden_act)
        gate = act(lf("gate_proj", h, weights["gate_proj"]))
        up = lf("up_proj", h, weights["up_proj"])
        x = x + lf("down_proj", gate * up, weights["down_proj"])
    return x, pieces
