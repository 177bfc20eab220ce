"""Pure-JAX GPT-OSS decoder: attention sinks, alternating sliding window,
MoE with clamped SwiGLU, YaRN rope.

Role of the reference's GPT-OSS support (``auto_round/modeling/fused_moe``
gpt_oss spec — fused 3-D expert tensors replaced with per-expert linears
for quantization): the HF checkpoint's fused ``gate_up_proj`` (E, H, 2I,
gate/up column-interleaved, with biases) splits into ordinary per-expert
``(O, I)`` leaves at load (``utils/hf_loader.py``), so the standard
tuning interceptor covers every expert projection.

Arch quirks, all config-driven on one functional decoder:

* **Attention sinks**: a learnable per-head logit joins the softmax
  denominator (tokens may attend "nowhere"); probabilities renormalize
  over real positions only.
* **Sliding window on even layers** (HF ``layer_types`` alternates
  sliding/full starting at 0 — same convention as :func:`llama.
  layer_is_sliding`).
* **Clamped SwiGLU**: gate clamped above at ``limit``, up to ±limit,
  ``glu = gate·σ(α·gate)``, output ``(up+1)·glu`` (α = 1.702).
* **YaRN rope**: NTK-by-parts inverse frequencies + attention factor
  on cos/sin (HF ``_compute_yarn_parameters`` formula).

Numerics match ``transformers`` ``GptOssForCausalLM`` (eager); locked by
logit parity in ``tests/test_gptoss.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig, rms_norm

__all__ = ["GptOssConfig", "init_params", "block_fwd", "model_fwd",
           "block_linear_names", "rope_tables", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class GptOssConfig(LlamaConfig):
    num_experts: int = 32
    top_k: int = 4
    swiglu_limit: float = 7.0
    swiglu_alpha: float = 1.702
    # YaRN (0 → plain rope)
    yarn_factor: float = 0.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    yarn_original_max_pos: int = 4096
    yarn_truncate: bool = False
    yarn_attention_factor: float = 0.0   # 0 → 0.1·ln(factor) + 1


CONFIG_PRESETS: Dict[str, GptOssConfig] = {
    "tiny-gptoss": GptOssConfig(
        vocab_size=256, hidden_size=64, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, attn_bias=True, sliding_window=8,
        num_experts=4, top_k=2, dtype=jnp.float32),
    "gpt-oss-20b": GptOssConfig(
        vocab_size=201088, hidden_size=2880, intermediate_size=2880,
        num_layers=24, num_heads=64, num_kv_heads=8, head_dim=64,
        rope_theta=150000.0, rms_eps=1e-5, attn_bias=True,
        sliding_window=128, num_experts=32, top_k=4,
        yarn_factor=32.0, yarn_original_max_pos=4096),
    "gpt-oss-120b": GptOssConfig(
        vocab_size=201088, hidden_size=2880, intermediate_size=2880,
        num_layers=36, num_heads=64, num_kv_heads=8, head_dim=64,
        rope_theta=150000.0, rms_eps=1e-5, attn_bias=True,
        sliding_window=128, num_experts=128, top_k=4,
        yarn_factor=32.0, yarn_original_max_pos=4096),
}

_MLP = ("gate_proj", "up_proj", "down_proj")


def block_linear_names(cfg: GptOssConfig) -> Tuple[str, ...]:
    attn = ("q_proj", "k_proj", "v_proj", "o_proj")
    return attn + tuple(f"experts.{e}.{w}"
                        for e in range(cfg.num_experts) for w in _MLP)


def rope_tables(cfg: GptOssConfig, seqlen: int,
                positions: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Half-width-duplicated cos/sin; YaRN NTK-by-parts when
    ``yarn_factor`` is set (HF ``_compute_yarn_parameters``)."""
    hd = cfg.hd
    pos_freqs = cfg.rope_theta ** (np.arange(0, hd, 2) / hd)
    inv_extra = 1.0 / pos_freqs
    att = 1.0
    if cfg.yarn_factor and cfg.yarn_factor > 1.0:
        inv_inter = inv_extra / cfg.yarn_factor

        def corr_dim(n_rot):
            return (hd * math.log(cfg.yarn_original_max_pos
                                  / (n_rot * 2 * math.pi))
                    ) / (2 * math.log(cfg.rope_theta))

        low = corr_dim(cfg.yarn_beta_fast)
        high = corr_dim(cfg.yarn_beta_slow)
        if cfg.yarn_truncate:
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, hd - 1)
        if low == high:
            high += 0.001
        ramp = np.clip((np.arange(hd // 2) - low) / (high - low), 0, 1)
        extra_f = 1.0 - ramp
        inv_freq = inv_inter * (1 - extra_f) + inv_extra * extra_f
        att = (cfg.yarn_attention_factor
               or 0.1 * math.log(cfg.yarn_factor) + 1.0)
    else:
        inv_freq = inv_extra
    if positions is None:
        positions = jnp.arange(seqlen)
    ang = positions[..., None].astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang) * att, jnp.sin(ang) * att


def init_params(cfg: GptOssConfig, key: jax.Array) -> Dict[str, Any]:
    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    I = cfg.intermediate_size
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 7)
        b: Dict[str, Any] = {
            "q_proj": jax.random.normal(bk[0], (qd, H), cfg.dtype) * 0.02,
            "k_proj": jax.random.normal(bk[1], (kvd, H), cfg.dtype) * 0.02,
            "v_proj": jax.random.normal(bk[2], (kvd, H), cfg.dtype) * 0.02,
            "o_proj": jax.random.normal(bk[3], (H, qd), cfg.dtype) * 0.02,
            "q_bias": jnp.zeros((qd,), cfg.dtype),
            "k_bias": jnp.zeros((kvd,), cfg.dtype),
            "v_bias": jnp.zeros((kvd,), cfg.dtype),
            "o_bias": jnp.zeros((H,), cfg.dtype),
            "sinks": jnp.zeros((cfg.num_heads,), jnp.float32),
            "router": jax.random.normal(bk[4], (cfg.num_experts, H),
                                        cfg.dtype) * 0.02,
            "router_bias": jnp.zeros((cfg.num_experts,), jnp.float32),
            "input_layernorm": jnp.ones((H,), cfg.dtype),
            "post_attention_layernorm": jnp.ones((H,), cfg.dtype),
            "experts": [],
        }
        for e in range(cfg.num_experts):
            ek = jax.random.fold_in(bk[5], e)
            e1, e2, e3 = jax.random.split(ek, 3)
            b["experts"].append({
                "gate_proj": jax.random.normal(e1, (I, H), cfg.dtype) * 0.02,
                "up_proj": jax.random.normal(e2, (I, H), cfg.dtype) * 0.02,
                "down_proj": jax.random.normal(e3, (H, I), cfg.dtype) * 0.02
                             / np.sqrt(2 * cfg.num_layers),
                "gate_bias": jnp.zeros((I,), cfg.dtype),
                "up_bias": jnp.zeros((I,), cfg.dtype),
                "down_bias": jnp.zeros((H,), cfg.dtype),
            })
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


def sink_attention(q, k, v, mask, sinks, cfg: GptOssConfig):
    """MHA with a per-head sink logit in the softmax denominator.

    Mirrors HF ``eager_attention_forward``: the sink joins the logits as
    an extra column, softmax normalizes over (positions + sink), then the
    sink column drops — attention mass may vanish instead of being
    forced onto real tokens."""
    B, S, nh, hd = q.shape
    T = k.shape[1]
    rep = nh // k.shape[2]
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bsnh,btnh->bnst", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(hd)
    if mask is None:
        causal = jnp.tril(jnp.ones((S, T), bool), k=T - S)
        scores = jnp.where(causal[None, None], scores, -1e30)
    else:
        scores = scores + mask.astype(jnp.float32)
    sinkcol = jnp.broadcast_to(
        sinks.astype(jnp.float32).reshape(1, nh, 1, 1), (B, nh, S, 1))
    comb = jnp.concatenate([scores, sinkcol], axis=-1)
    comb = comb - jnp.max(comb, axis=-1, keepdims=True)
    probs = jax.nn.softmax(comb, axis=-1)[..., :-1]
    out = jnp.einsum("bnst,btnh->bsnh", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _clamped_swiglu(gate, up, cfg: GptOssConfig):
    lim = cfg.swiglu_limit
    gate = jnp.clip(gate.astype(jnp.float32), None, lim)
    up = jnp.clip(up.astype(jnp.float32), -lim, lim)
    glu = gate * jax.nn.sigmoid(gate * cfg.swiglu_alpha)
    return ((up + 1.0) * glu)


def _moe_mlp(weights, h, cfg: GptOssConfig, lf,
             capacity_factor: float = 0.0):
    """Router: top-k logits → softmax over the k; dense-then-mask expert
    compute with clamped SwiGLU (every expert projection through ``lf``).

    Serving fast paths mirror ``mixtral._moe_mlp``: stacked experts run
    through ``lf.grouped`` (one grouped Pallas GEMM per projection; the
    per-expert biases — which the grouped kernel doesn't carry — stack
    once and add to the (E, C, O) slab), and ``capacity_factor > 0``
    switches to capacity dispatch (output scaled by the routing weight,
    the standard combine)."""
    logits = (jnp.einsum("...h,eh->...e", h.astype(jnp.float32),
                         weights["router"].astype(jnp.float32))
              + weights["router_bias"].astype(jnp.float32))
    topv, topi = jax.lax.top_k(logits, cfg.top_k)
    topw = jax.nn.softmax(topv, axis=-1)
    E = cfg.num_experts

    gnames = getattr(lf, "grouped_names", frozenset())
    use_grouped = {"gate_proj", "up_proj", "down_proj"} <= set(gnames)

    def _bias_stack(name):
        ex = weights["experts"]
        if ex and ex[0].get(name) is not None:
            b = jnp.stack([ew[name] for ew in ex])      # (E, O) replicated
            El = getattr(lf, "local_experts", b.shape[0])
            if El != b.shape[0]:
                # expert parallelism: this shard's grouped payload holds
                # El experts starting at lf.expert_offset
                b = jax.lax.dynamic_slice_in_dim(b, lf.expert_offset,
                                                 El, 0)
            return b[:, None, :]
        return None

    def grouped_clamped_swiglu(buf):  # (E, C, H) → (E, C, H)
        gate = lf.grouped("gate_proj", buf)
        up = lf.grouped("up_proj", buf)
        gb, ub = _bias_stack("gate_bias"), _bias_stack("up_bias")
        if gb is not None:
            gate = gate + gb.astype(gate.dtype)
        if ub is not None:
            up = up + ub.astype(up.dtype)
        mid = _clamped_swiglu(gate, up, cfg).astype(buf.dtype)
        y = lf.grouped("down_proj", mid)
        db = _bias_stack("down_bias")
        return y + db.astype(y.dtype) if db is not None else y

    def apply_expert(e, xb):
        ew = weights["experts"][e]
        p = f"experts.{e}."
        gate = lf(p + "gate_proj", xb, ew["gate_proj"],
                  ew.get("gate_bias"))
        up = lf(p + "up_proj", xb, ew["up_proj"], ew.get("up_bias"))
        mid = _clamped_swiglu(gate, up, cfg).astype(xb.dtype)
        return lf(p + "down_proj", mid, ew["down_proj"],
                  ew.get("down_bias"))

    # expert parallelism (tp engine): this shard owns El experts at `off`
    off = getattr(lf, "expert_offset", 0)
    El = getattr(lf, "local_experts", E)
    combine = getattr(lf, "expert_combine", None)

    if capacity_factor and capacity_factor > 0:
        from .mixtral import capacity_dispatch
        out = capacity_dispatch(
            h, topi, topw, El if use_grouped else E, capacity_factor,
            apply_expert,
            grouped_apply=grouped_clamped_swiglu if use_grouped else None,
            expert_offset=off if use_grouped else 0, n_global_experts=E)
        if combine is not None and use_grouped:
            out = combine(out)
        out = out.astype(jnp.float32)
    elif use_grouped:
        # dense-then-mask through the grouped kernel (exact; biases make
        # unselected experts nonzero, so the per-token weight matrix —
        # zero off the top-k — masks them in the combine)
        B, S, H = h.shape
        N, k = B * S, cfg.top_k
        buf = jnp.broadcast_to(h.reshape(1, N, H), (El, N, H))
        ys = grouped_clamped_swiglu(buf).astype(jnp.float32)
        flat_i = topi.reshape(-1) - off
        valid = ((flat_i >= 0) & (flat_i < El)).astype(jnp.float32)
        w_tok = jnp.zeros((N, El), jnp.float32).at[
            jnp.repeat(jnp.arange(N), k),
            jnp.clip(flat_i, 0, El - 1)].add(
            topw.reshape(-1).astype(jnp.float32) * valid)
        out = jnp.einsum("enh,ne->nh", ys, w_tok).reshape(B, S, H)
        if combine is not None:
            out = combine(out)
    else:
        out = jnp.zeros_like(h, dtype=jnp.float32)
        for e in range(E):
            y = apply_expert(e, h).astype(jnp.float32)
            w_e = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
            out = out + y * w_e[..., None]
    return out.astype(h.dtype)


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: GptOssConfig, mask=None, linear_fn=None) -> jax.Array:
    lf = linear_fn or llama._plain_linear
    B, S, H = x.shape
    hd = cfg.hd
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    q = lf("q_proj", h, weights["q_proj"], weights.get("q_bias"))
    k = lf("k_proj", h, weights["k_proj"], weights.get("k_bias"))
    v = lf("v_proj", h, weights["v_proj"], weights.get("v_bias"))
    q = q.reshape(B, S, cfg.num_heads, hd)
    k = k.reshape(B, S, cfg.num_kv_heads, hd)
    v = v.reshape(B, S, cfg.num_kv_heads, hd)
    q = llama.apply_rope(q, cos, sin)
    k = llama.apply_rope(k, cos, sin)
    attn = sink_attention(q, k, v, mask, weights["sinks"], cfg)
    x = x + lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"],
               weights.get("o_bias"))
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    return x + _moe_mlp(weights, h, cfg, lf)


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: GptOssConfig) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    S = input_ids.shape[1]
    cos, sin = rope_tables(cfg, S)
    for li, b in enumerate(params["blocks"]):
        mask = None
        if (llama.layer_is_sliding(cfg, li) and S > cfg.sliding_window):
            mask = llama.sliding_mask(cfg, S)
        x = block_fwd(b, x, cos, sin, cfg, mask=mask)
    return llama.final_fwd(params, x, cfg)
