"""Pure-JAX DeepSeek V2/V3 decoder: MLA attention + DeepSeek-MoE.

Role of the reference's DeepSeek support (``auto_round/modeling/
unfused_moe/deepseek_v3.py``, ``fused_moe`` deepseek specs, and the
arch quirks in ``utils/model.py``) — built TPU-first on the shared
functional-decoder conventions of this zoo:

* **MLA (multi-head latent attention)**: queries optionally LoRA-
  compressed (``q_a_proj``/``q_b_proj``), keys/values jointly compressed
  to ``kv_lora_rank`` (+ a single shared rope sub-head).  Every
  projection is an ordinary ``(O, I)`` linear leaf, so the whole MLA
  stack quantizes/tunes through the standard interceptor with zero
  special-casing.
* **DeepSeek-MoE**: ``first_k_dense`` dense layers, then routed experts
  with sigmoid (V3) or softmax (V2) scoring, optional aux-free bias
  (``e_score_correction_bias``), group-limited top-k (``n_group`` /
  ``topk_group``), ``routed_scaling_factor``, plus always-on shared
  experts.  Calibration-time expert compute is dense-then-mask (exact,
  XLA-friendly — same design as :mod:`.mixtral`).

Numerics match ``transformers`` ``DeepseekV3ForCausalLM`` /
``DeepseekV2ForCausalLM`` (eager, rope_scaling=None); locked by logit
parity in ``tests/test_deepseek.py``.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama
from .llama import LlamaConfig, rms_norm

__all__ = ["DeepseekConfig", "init_params", "block_fwd", "model_fwd",
           "block_linear_names", "rope_tables", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class DeepseekConfig(LlamaConfig):
    # --- MLA ---
    q_lora_rank: int = 0             # 0 → plain q_proj (V2-Lite)
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rope_interleave: bool = True     # HF DeepseekV3 default
    mscale: float = 1.0              # yarn mscale (squared into the scale)
    # --- yarn rope_scaling (HF DeepseekV2YarnRotaryEmbedding) ---
    yarn_factor: float = 0.0         # 0 → plain rope (no interpolation)
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    yarn_original_max_pos: int = 4096
    yarn_mscale: float = 1.0         # rope_scaling["mscale"]
    yarn_mscale_all_dim: float = 0.0  # rope_scaling["mscale_all_dim"]
    # --- MoE ---
    n_routed_experts: int = 0        # 0 → dense MLP every layer
    num_experts_per_tok: int = 6
    moe_intermediate_size: int = 0
    n_shared_experts: int = 0        # shared width = n * moe_intermediate
    first_k_dense: int = 1
    routed_scaling_factor: float = 1.0
    scoring_func: str = "sigmoid"    # V3 "sigmoid" | V2 "softmax"
    n_group: int = 1
    topk_group: int = 1
    # norm_topk_prob rides on the shared field name used by mixtral
    norm_topk_prob: bool = True

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    def layer_is_moe(self, li: int) -> bool:
        return self.n_routed_experts > 0 and li >= self.first_k_dense


CONFIG_PRESETS: Dict[str, DeepseekConfig] = {
    # V3-style: sigmoid router + bias, group-limited top-k, q lora
    "tiny-deepseek": DeepseekConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_kv_heads=4, rope_theta=10000.0,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=64,
        n_shared_experts=1, first_k_dense=1, routed_scaling_factor=2.5,
        scoring_func="sigmoid", n_group=2, topk_group=1,
        norm_topk_prob=True, dtype=jnp.float32),
    # V2-style: softmax router, no q lora, no grouping
    "tiny-deepseek-v2": DeepseekConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_kv_heads=4, rope_theta=10000.0,
        q_lora_rank=0, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=64,
        n_shared_experts=2, first_k_dense=1, routed_scaling_factor=1.0,
        scoring_func="softmax", norm_topk_prob=False, dtype=jnp.float32),
    "deepseek-v2-lite": DeepseekConfig(
        vocab_size=102400, hidden_size=2048, intermediate_size=10944,
        num_layers=27, num_heads=16, num_kv_heads=16, rope_theta=10000.0,
        rms_eps=1e-6, q_lora_rank=0, kv_lora_rank=512,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        n_routed_experts=64, num_experts_per_tok=6,
        moe_intermediate_size=1408, n_shared_experts=2, first_k_dense=1,
        routed_scaling_factor=1.0, scoring_func="softmax",
        norm_topk_prob=False),
    "deepseek-v3": DeepseekConfig(
        vocab_size=129280, hidden_size=7168, intermediate_size=18432,
        num_layers=61, num_heads=128, num_kv_heads=128, rope_theta=10000.0,
        rms_eps=1e-6, q_lora_rank=1536, kv_lora_rank=512,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        n_routed_experts=256, num_experts_per_tok=8,
        moe_intermediate_size=2048, n_shared_experts=1, first_k_dense=3,
        routed_scaling_factor=2.5, scoring_func="sigmoid", n_group=8,
        topk_group=4, norm_topk_prob=True),
}

_MLP = ("gate_proj", "up_proj", "down_proj")


def block_linear_names(cfg: DeepseekConfig) -> Tuple[str, ...]:
    """Union of quantizable linear names across blocks (dense first-k
    blocks lack expert leaves; the plan prunes per-block — api.py)."""
    attn = (("q_a_proj", "q_b_proj") if cfg.q_lora_rank else ("q_proj",))
    attn += ("kv_a_proj_with_mqa", "kv_b_proj", "o_proj")
    names = attn + _MLP
    if cfg.n_routed_experts:
        names += tuple(f"experts.{e}.{w}"
                       for e in range(cfg.n_routed_experts) for w in _MLP)
        if cfg.n_shared_experts:
            names += tuple(f"shared_experts.{w}" for w in _MLP)
    return names


def _mlp_weights(key, I: int, H: int, dtype, n_layers: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate_proj": jax.random.normal(k1, (I, H), dtype) * 0.02,
        "up_proj": jax.random.normal(k2, (I, H), dtype) * 0.02,
        "down_proj": jax.random.normal(k3, (H, I), dtype) * 0.02
                     / np.sqrt(2 * n_layers),
    }


def init_params(cfg: DeepseekConfig, key: jax.Array) -> Dict[str, Any]:
    H = cfg.hidden_size
    nh, dq, dv = cfg.num_heads, cfg.qk_head_dim, cfg.v_head_dim
    r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(keys[li], 8)
        b: Dict[str, Any] = {
            "kv_a_proj_with_mqa": jax.random.normal(
                bk[0], (r + dr, H), cfg.dtype) * 0.02,
            "kv_a_layernorm": jnp.ones((r,), cfg.dtype),
            "kv_b_proj": jax.random.normal(
                bk[1], (nh * (cfg.qk_nope_head_dim + dv), r),
                cfg.dtype) * 0.02,
            "o_proj": jax.random.normal(bk[2], (H, nh * dv), cfg.dtype)
                      * 0.02 / np.sqrt(2 * cfg.num_layers),
            "input_layernorm": jnp.ones((H,), cfg.dtype),
            "post_attention_layernorm": jnp.ones((H,), cfg.dtype),
        }
        if cfg.q_lora_rank:
            b["q_a_proj"] = jax.random.normal(
                bk[3], (cfg.q_lora_rank, H), cfg.dtype) * 0.02
            b["q_a_layernorm"] = jnp.ones((cfg.q_lora_rank,), cfg.dtype)
            b["q_b_proj"] = jax.random.normal(
                bk[4], (nh * dq, cfg.q_lora_rank), cfg.dtype) * 0.02
        else:
            b["q_proj"] = jax.random.normal(bk[3], (nh * dq, H),
                                            cfg.dtype) * 0.02
        if cfg.layer_is_moe(li):
            mi = cfg.moe_intermediate_size
            b["gate"] = jax.random.normal(
                bk[5], (cfg.n_routed_experts, H), cfg.dtype) * 0.02
            if cfg.scoring_func == "sigmoid":
                b["e_score_correction_bias"] = jnp.zeros(
                    (cfg.n_routed_experts,), jnp.float32)
            b["experts"] = [
                _mlp_weights(jax.random.fold_in(bk[6], e), mi, H,
                             cfg.dtype, cfg.num_layers)
                for e in range(cfg.n_routed_experts)]
            if cfg.n_shared_experts:
                b["shared_experts"] = _mlp_weights(
                    bk[7], mi * cfg.n_shared_experts, H, cfg.dtype,
                    cfg.num_layers)
        else:
            b.update(_mlp_weights(bk[5], cfg.intermediate_size, H,
                                  cfg.dtype, cfg.num_layers))
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


def _yarn_get_mscale(scale: float, mscale: float) -> float:
    """HF ``yarn_get_mscale``: 0.1·mscale·ln(scale) + 1 for scale > 1."""
    if scale <= 1.0 or not mscale:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def rope_tables(cfg: DeepseekConfig, seqlen: int,
                positions: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin over the rope sub-head (``qk_rope_head_dim`` wide).

    When ``yarn_factor`` > 1 (real DeepSeek-V2/V3 checkpoints ship yarn
    ``rope_scaling`` with factor 40) this applies the NTK-by-parts
    frequency interpolation of HF ``DeepseekV2YarnRotaryEmbedding``:
    interpolated frequencies ``inv/factor`` below the ``beta_fast``
    correction dim, extrapolated (unscaled) above ``beta_slow``, linear
    ramp between; cos/sin are scaled by
    ``yarn_get_mscale(factor, mscale) / yarn_get_mscale(factor,
    mscale_all_dim)`` (== 1.0 for published V2/V3 configs where
    mscale == mscale_all_dim).  The ``mscale_all_dim`` softmax-scale
    correction (mscale²) rides separately in ``cfg.mscale`` — both
    halves of yarn are now applied, matching HF numerics at every
    position (previously only the score scale was)."""
    dr = cfg.qk_rope_head_dim
    inv_extra = 1.0 / (cfg.rope_theta ** (np.arange(0, dr, 2) / dr))
    att = 1.0
    if cfg.yarn_factor and cfg.yarn_factor > 1.0:
        inv_inter = inv_extra / cfg.yarn_factor

        def corr_dim(n_rot):
            return (dr * math.log(cfg.yarn_original_max_pos
                                  / (n_rot * 2 * math.pi))
                    ) / (2 * math.log(cfg.rope_theta))

        low = max(math.floor(corr_dim(cfg.yarn_beta_fast)), 0)
        high = min(math.ceil(corr_dim(cfg.yarn_beta_slow)), dr - 1)
        if low == high:
            high += 0.001
        ramp = np.clip((np.arange(dr // 2) - low) / (high - low), 0, 1)
        extra_f = 1.0 - ramp                     # 1 → keep original freq
        inv_freq = inv_inter * (1 - extra_f) + inv_extra * extra_f
        att = (_yarn_get_mscale(cfg.yarn_factor, cfg.yarn_mscale)
               / _yarn_get_mscale(cfg.yarn_factor, cfg.yarn_mscale_all_dim))
    else:
        inv_freq = inv_extra
    if positions is None:
        positions = jnp.arange(seqlen)
    ang = positions[..., None].astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang) * att, jnp.sin(ang) * att


def _rope_rotate(x: jax.Array, cos, sin, interleave: bool) -> jax.Array:
    """Apply rope to (B, S, n, dr); ``interleave`` permutes even/odd
    element pairs into halves first (HF ``apply_rotary_pos_emb_interleave``
    — both q and k get the same permutation, so scores are invariant)."""
    if interleave:
        x = jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)
    return llama.apply_rope(x, cos, sin)


def _route(h: jax.Array, weights, cfg: DeepseekConfig):
    """DeepSeek router → (topk_idx, topk_weight) per token.

    V3 (``sigmoid``): scores = sigmoid(logits); selection adds the
    aux-free ``e_score_correction_bias`` and is group-limited (keep
    ``topk_group`` groups by their top-2-sum), but the mixing WEIGHTS are
    the unbiased scores.  V2 (``softmax``): plain softmax scores.
    """
    E, k = cfg.n_routed_experts, cfg.num_experts_per_tok
    logits = jnp.einsum("...h,eh->...e", h.astype(jnp.float32),
                        weights["gate"].astype(jnp.float32))
    if cfg.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    choice = scores
    if "e_score_correction_bias" in weights:
        choice = choice + weights["e_score_correction_bias"]
    if cfg.n_group > 1:
        gsz = E // cfg.n_group
        grouped = choice.reshape(*choice.shape[:-1], cfg.n_group, gsz)
        # group score: top-2 sum (V3 noaux_tc) vs max (V2
        # group_limited_greedy)
        k_g = 2 if cfg.scoring_func == "sigmoid" else 1
        g_scores = jnp.sum(jax.lax.top_k(grouped, k_g)[0], axis=-1)
        _, g_idx = jax.lax.top_k(g_scores, cfg.topk_group)
        g_mask = jnp.sum(jax.nn.one_hot(g_idx, cfg.n_group,
                                        dtype=jnp.float32), axis=-2)
        choice = jnp.where(
            jnp.repeat(g_mask, gsz, axis=-1) > 0, choice, 0.0)
    _, topi = jax.lax.top_k(choice, k)
    topw = jnp.take_along_axis(scores, topi, axis=-1)
    if cfg.norm_topk_prob:
        topw = topw / (jnp.sum(topw, axis=-1, keepdims=True) + 1e-20)
    return topi, topw * cfg.routed_scaling_factor


def _mlp(weights, h, cfg, lf, prefix: str = ""):
    act = llama._act(cfg.hidden_act)
    gate = act(lf(f"{prefix}gate_proj", h, weights["gate_proj"]))
    up = lf(f"{prefix}up_proj", h, weights["up_proj"])
    return lf(f"{prefix}down_proj", gate * up, weights["down_proj"])


def _moe_mlp(weights, h, cfg: DeepseekConfig, lf,
             capacity_factor: float = 0.0):
    """Routed experts + always-on shared experts.

    capacity_factor == 0 → dense-then-mask (exact; calibration default).
    capacity_factor > 0 → capacity-based dispatch (serving: each expert
    computes C tokens instead of all N — essential at DeepSeek scale,
    E = 64..256 routed experts)."""
    topi, topw = _route(h, weights, cfg)
    B, S, H = h.shape
    E = cfg.n_routed_experts
    gnames = getattr(lf, "grouped_names", frozenset())
    use_grouped = {"gate_proj", "up_proj", "down_proj"} <= set(gnames)
    # expert parallelism (tp engine): local expert slab + psum combine
    off = getattr(lf, "expert_offset", 0)
    El = getattr(lf, "local_experts", E)
    combine = getattr(lf, "expert_combine", None)
    act = llama._act(cfg.hidden_act)

    def grouped_mlp(buf):  # (El, C, H) → (El, C, H)
        mid = act(lf.grouped("gate_proj", buf)) * lf.grouped("up_proj", buf)
        return lf.grouped("down_proj", mid)

    if capacity_factor and capacity_factor > 0:
        from .mixtral import capacity_dispatch

        def apply_expert(e, xb):
            return _mlp(weights["experts"][e], xb[None], cfg, lf,
                        prefix=f"experts.{e}.")[0]

        out = capacity_dispatch(
            h, topi, topw, El if use_grouped else E, capacity_factor,
            apply_expert,
            grouped_apply=grouped_mlp if use_grouped else None,
            expert_offset=off if use_grouped else 0,
            n_global_experts=E).astype(jnp.float32)
        if combine is not None and use_grouped:
            out = combine(out)
    elif use_grouped:
        N = B * S
        k = topi.shape[-1]
        buf = jnp.broadcast_to(h.reshape(1, N, H), (El, N, H))
        ys = grouped_mlp(buf).astype(jnp.float32)
        flat_i = topi.reshape(-1) - off
        valid = ((flat_i >= 0) & (flat_i < El)).astype(jnp.float32)
        w_tok = jnp.zeros((N, El), jnp.float32).at[
            jnp.repeat(jnp.arange(N), k), jnp.clip(flat_i, 0, El - 1)
        ].add(topw.reshape(-1).astype(jnp.float32) * valid)
        out = jnp.einsum("enh,ne->nh", ys, w_tok).reshape(B, S, H)
        if combine is not None:
            out = combine(out)
    else:
        out = jnp.zeros_like(h, dtype=jnp.float32)
        for e, ew in enumerate(weights["experts"]):
            y = _mlp(ew, h, cfg, lf,
                     prefix=f"experts.{e}.").astype(jnp.float32)
            w_e = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
            out = out + y * w_e[..., None]
    if "shared_experts" in weights:
        out = out + _mlp(weights["shared_experts"], h, cfg, lf,
                         prefix="shared_experts.").astype(jnp.float32)
    return out.astype(h.dtype)


def mla_attention_inputs(weights, h, cos, sin, cfg: DeepseekConfig, lf):
    """Shared MLA head math: h → (q, k, v, c_kv, k_rope).

    ``c_kv`` (normed latent) and ``k_rope`` (roped shared sub-head) are
    what the serving cache stores — (r + dr) per token instead of
    ``2·nh·hd`` (the MLA cache-compression win).
    """
    B, S, H = h.shape
    nh, dn, dr = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    r, dv = cfg.kv_lora_rank, cfg.v_head_dim
    if cfg.q_lora_rank:
        qa = lf("q_a_proj", h, weights["q_a_proj"])
        qa = rms_norm(qa, weights["q_a_layernorm"], cfg.rms_eps)
        q = lf("q_b_proj", qa, weights["q_b_proj"])
    else:
        q = lf("q_proj", h, weights["q_proj"])
    q = q.reshape(B, S, nh, dn + dr)
    q_nope, q_rope = q[..., :dn], q[..., dn:]
    q_rope = _rope_rotate(q_rope, cos, sin, cfg.rope_interleave)

    ckv = lf("kv_a_proj_with_mqa", h, weights["kv_a_proj_with_mqa"])
    c_kv = rms_norm(ckv[..., :r], weights["kv_a_layernorm"], cfg.rms_eps)
    k_rope = _rope_rotate(ckv[..., None, r:].reshape(B, S, 1, dr),
                          cos, sin, cfg.rope_interleave)

    kv = lf("kv_b_proj", c_kv, weights["kv_b_proj"])
    kv = kv.reshape(B, S, nh, dn + dv)
    k_nope, v = kv[..., :dn], kv[..., dn:]
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_rope, (B, S, nh, dr))], axis=-1)
    q = jnp.concatenate([q_nope, q_rope], axis=-1)
    return q, k, v, c_kv, k_rope


def _attn_cfg(cfg: DeepseekConfig):
    """llama.attention divides scores by ``attn_scale``; MLA multiplies by
    mscale² / sqrt(qk_head_dim)."""
    return dataclasses.replace(
        cfg, attn_scale=float(np.sqrt(cfg.qk_head_dim)) / (cfg.mscale ** 2))


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: DeepseekConfig, mask=None, linear_fn=None) -> jax.Array:
    lf = linear_fn or llama._plain_linear
    B, S, H = x.shape
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    q, k, v, _, _ = mla_attention_inputs(weights, h, cos, sin, cfg, lf)
    attn = llama.attention(q, k, v, mask, _attn_cfg(cfg))
    x = x + lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    if "experts" in weights:
        x = x + _moe_mlp(weights, h, cfg, lf)
    else:
        x = x + _mlp(weights, h, cfg, lf)
    return x


def block_with_cache(weights, x, cos, sin, cfg: DeepseekConfig, kv, pos,
                     lf) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decoder block for serving, returning ``(out, c_kv, k_rope)``.

    The cache stores the COMPRESSED latents — ``c_kv`` (kv_lora_rank) and
    the shared roped sub-head ``k_rope`` (qk_rope_head_dim) — i.e.
    ``r + dr`` floats per token instead of ``2·nh·hd``: for V3 shapes
    (128 heads × 192/128 dims vs 512+64) a ~70× KV-cache compression.

    Decode uses **weight absorption**: ``q_nope`` is pushed through
    ``kv_b_proj``'s key half once per step (``q_lat = q_nope @ W_k``), so
    attention runs entirely in latent space — no per-token decompression
    of the whole cache, and the HBM stream per step is the compressed
    cache (MQA-like bandwidth).  ``kv_b_proj`` therefore stays a dense
    (qdq) leaf at serving; all other projections pack as usual.
    """
    B, S, H = x.shape
    nh, dn, dr = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    r, dv = cfg.kv_lora_rank, cfg.v_head_dim
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    if kv is None:
        # prefill: decompress and run plain causal attention
        q, k, v, c_kv, k_rope = mla_attention_inputs(
            weights, h, cos, sin, cfg, lf)
        attn = llama.attention(q, k, v, None, _attn_cfg(cfg))
    else:
        # kv: (ckv_all, kr_all) bf16, or (kv_quant, ckv, kr, cs, rs) with
        # int8/fp8 latents and per-layer scalar scales (folded into the
        # score terms and the context epilogue — no dequant pass)
        if len(kv) == 5:
            _, ckv_all, kr_all, cs, rs = kv
        else:
            ckv_all, kr_all = kv       # (B, T, 1, r), (B, T, 1, dr)
            cs = rs = None
        T = ckv_all.shape[1]
        if cfg.q_lora_rank:
            qa = lf("q_a_proj", h, weights["q_a_proj"])
            qa = rms_norm(qa, weights["q_a_layernorm"], cfg.rms_eps)
            q = lf("q_b_proj", qa, weights["q_b_proj"])
        else:
            q = lf("q_proj", h, weights["q_proj"])
        q = q.reshape(B, S, nh, dn + dr)
        q_nope = q[..., :dn]
        q_rope = _rope_rotate(q[..., dn:], cos, sin, cfg.rope_interleave)
        ckv = lf("kv_a_proj_with_mqa", h, weights["kv_a_proj_with_mqa"])
        c_kv = rms_norm(ckv[..., :r], weights["kv_a_layernorm"],
                        cfg.rms_eps)                       # (B, 1, r)
        k_rope = _rope_rotate(ckv[..., None, r:].reshape(B, S, 1, dr),
                              cos, sin, cfg.rope_interleave)
        # append this token's latents into the preallocated buffers
        if cs is not None:
            qmax = 127.0 if ckv_all.dtype == jnp.int8 else 448.0
            quant = lambda t, s: jnp.clip(
                t.astype(jnp.float32) / s, -qmax, qmax)
            c_tok = quant(c_kv[:, :, None, :], cs)
            r_tok = quant(k_rope, rs)
            if ckv_all.dtype == jnp.int8:
                c_tok, r_tok = jnp.round(c_tok), jnp.round(r_tok)
            c_tok = c_tok.astype(ckv_all.dtype)
            r_tok = r_tok.astype(kr_all.dtype)
        else:
            c_tok = c_kv[:, :, None, :].astype(ckv_all.dtype)
            r_tok = k_rope.astype(kr_all.dtype)
        if jnp.ndim(pos) == 0:
            ckv_full = jax.lax.dynamic_update_slice(ckv_all, c_tok,
                                                    (0, pos, 0, 0))
            kr_full = jax.lax.dynamic_update_slice(kr_all, r_tok,
                                                   (0, pos, 0, 0))
        else:
            # per-slot positions (continuous batching)
            bidx = jnp.arange(B)
            ckv_full = ckv_all.at[bidx, pos].set(c_tok[:, 0])
            kr_full = kr_all.at[bidx, pos].set(r_tok[:, 0])
        wkb = weights["kv_b_proj"].reshape(nh, dn + dv, r)
        f32 = jnp.float32
        # absorbed scores: q_lat·c_kv + q_rope·k_rope, all in latent
        # space; quantized-latent scales fold into the score terms and
        # the context epilogue
        q_lat = jnp.einsum("bnd,ndr->bnr", q_nope[:, 0].astype(f32),
                           wkb[:, :dn].astype(f32))
        s_lat = jnp.einsum("bnr,btr->bnt", q_lat,
                           ckv_full[:, :, 0].astype(f32))
        s_rope = jnp.einsum("bnd,btd->bnt", q_rope[:, 0].astype(f32),
                            kr_full[:, :, 0].astype(f32))
        if cs is not None:
            s_lat = s_lat * cs
            s_rope = s_rope * rs
        scale = (cfg.mscale ** 2) / float(np.sqrt(cfg.qk_head_dim))
        scores = (s_lat + s_rope) * scale
        idx = jnp.arange(T)
        if jnp.ndim(pos) == 0:
            valid = (idx <= pos)[None, None, :]
        else:
            valid = (idx[None, :] <= pos[:, None])[:, None, :]
        scores = jnp.where(valid, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)            # (B, nh, T)
        ctx = jnp.einsum("bnt,btr->bnr", probs,
                         ckv_full[:, :, 0].astype(f32))
        if cs is not None:
            ctx = ctx * cs
        attn = jnp.einsum("bnr,nvr->bnv", ctx,
                          wkb[:, dn:].astype(f32))         # (B, nh, dv)
        attn = attn[:, None].astype(x.dtype)               # (B, 1, nh, dv)
    x = x + lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    if "experts" in weights:
        from .. import envs
        x = x + _moe_mlp(weights, h, cfg, lf,
                         capacity_factor=envs.AR_MOE_CAPACITY_FACTOR)
    else:
        x = x + _mlp(weights, h, cfg, lf)
    return x, c_kv, k_rope


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: DeepseekConfig) -> jax.Array:
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = rope_tables(cfg, input_ids.shape[1])
    for b in params["blocks"]:
        x = block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
