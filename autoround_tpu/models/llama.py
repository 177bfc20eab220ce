"""Pure-JAX llama-family decoder (Llama 2/3, Qwen2/2.5, Mistral, TinyLlama).

Role of the reference's model plumbing (it drives HF torch models via
hooks — ``auto_round/utils/model.py`` ``get_block_names`` etc.).  The TPU
build owns its model zoo instead (SURVEY.md §7 "Calibration caching"):
blocks are pure functions over explicit parameter pytrees, so block-wise
calibration capture is just calling the functions in order — no
monkey-patched forwards, no hook early-stop exceptions.

Weight layout convention: every linear kernel is stored ``(out_features,
in_features)`` — the quantization layout (groups along the input axis) and
the HF checkpoint layout, so loading is transposition-free.  Forward uses
``einsum('...i,oi->...o')``; XLA folds the implied transpose into the
dot_general.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LlamaConfig", "init_params", "rope_tables", "block_fwd",
           "embed_fwd", "final_fwd", "model_fwd", "block_linear_names",
           "CONFIG_PRESETS"]


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 22
    num_heads: int = 32
    num_kv_heads: int = 4
    head_dim: Optional[int] = None
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    tie_embeddings: bool = False
    attn_bias: bool = False          # Qwen2-style q/k/v bias
    # per-arch quirks (role of the reference's special-model handlers —
    # config flags on one functional decoder instead of per-arch classes)
    qk_norm: bool = False            # Qwen3: per-head RMSNorm on q/k
    norm_offset: float = 0.0         # Gemma: RMSNorm weight is (offset + g)
    hidden_act: str = "silu"         # "gelu_tanh" for Gemma GeGLU
    embed_scale: bool = False        # Gemma: embeddings * sqrt(hidden)
    sandwich_norms: bool = False     # Gemma2: post-attn/ffw norms + pre-ffw
    attn_logit_softcap: float = 0.0  # Gemma2: tanh soft capping on scores
    final_logit_softcap: float = 0.0
    # Gemma2 alternates sliding-window and global attention layers
    # (even layer indices slide, HF convention); Gemma3-style arbitrary
    # patterns ride in layer_types ("sliding_attention"/"full_attention")
    sliding_window: Optional[int] = None
    layer_types: Optional[Tuple[str, ...]] = None
    # Llama4: "sliding" layers attend block-diagonally within
    # sliding_window-sized CHUNKS (causal inside a chunk) instead of a
    # rolling window
    chunked_attention: bool = False
    # Gemma3 dual rope: sliding layers use a local base frequency and no
    # scaling; global layers use rope_theta / linear rope_scaling_factor
    rope_local_theta: float = 0.0
    # Step-3.5: sliding layers rotate a DIFFERENT head fraction than
    # full-attention layers (swa 1.0 vs full 0.5); 0 → same fraction
    partial_rotary_factor_local: float = 0.0
    rope_scaling_factor: float = 1.0
    # Llama-3.1+ NTK-by-parts rope scaling:
    # (factor, low_freq_factor, high_freq_factor, original_max_pos)
    rope_llama3: Optional[Tuple[float, float, float, int]] = None
    attn_scale: Optional[float] = None  # score divisor override (Gemma2
    #                                      query_pre_attn_scalar ** 0.5)
    # QuaRot-style online R4: rotate the down_proj input at runtime with a
    # block-diagonal Hadamard (weights pre-rotated by transforms.hadamard.
    # apply_r4_rotation).  Block-diag (128) instead of a full FWHT: one
    # (128, 128) MXU matmul that fuses into the surrounding ops, vs
    # log2(I) HBM-bound butterfly passes.
    online_r4: bool = False
    r4_block: int = 128
    # GLM-4.5-style partial rotary: only the first hd*factor dims rotate
    partial_rotary_factor: float = 1.0
    dtype: Any = jnp.bfloat16

    @property
    def hd(self) -> int:
        return self.head_dim if self.head_dim else self.hidden_size // self.num_heads


CONFIG_PRESETS: Dict[str, LlamaConfig] = {
    "tiny": LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                        num_layers=2, num_heads=4, num_kv_heads=2,
                        rope_theta=10000.0, dtype=jnp.float32),
    "tiny-qwen": LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                             num_layers=2, num_heads=4, num_kv_heads=2,
                             attn_bias=True, rope_theta=10000.0, dtype=jnp.float32),
    "llama3.2-1b": LlamaConfig(vocab_size=128256, hidden_size=2048,
                               intermediate_size=8192, num_layers=16,
                               num_heads=32, num_kv_heads=8, head_dim=64,
                               tie_embeddings=True),
    "llama3-8b": LlamaConfig(vocab_size=128256, hidden_size=4096,
                             intermediate_size=14336, num_layers=32,
                             num_heads=32, num_kv_heads=8),
    "qwen2.5-7b": LlamaConfig(vocab_size=152064, hidden_size=3584,
                              intermediate_size=18944, num_layers=28,
                              num_heads=28, num_kv_heads=4, attn_bias=True,
                              rope_theta=1000000.0, rms_eps=1e-6),
    "qwen3-4b": LlamaConfig(vocab_size=151936, hidden_size=2560,
                            intermediate_size=9728, num_layers=36,
                            num_heads=32, num_kv_heads=8, head_dim=128,
                            qk_norm=True, rope_theta=1000000.0,
                            rms_eps=1e-6, tie_embeddings=True),
    "gemma2-2b": LlamaConfig(vocab_size=256000, hidden_size=2304,
                             intermediate_size=9216, num_layers=26,
                             num_heads=8, num_kv_heads=4, head_dim=256,
                             rope_theta=10000.0, rms_eps=1e-6,
                             tie_embeddings=True, norm_offset=1.0,
                             hidden_act="gelu_tanh", embed_scale=True,
                             sandwich_norms=True, attn_logit_softcap=50.0,
                             final_logit_softcap=30.0,
                             attn_scale=256.0 ** 0.5, sliding_window=4096),
    "tiny-qwen3": LlamaConfig(vocab_size=256, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2, qk_norm=True,
                              rope_theta=10000.0, dtype=jnp.float32),
    "tiny-gemma3": LlamaConfig(vocab_size=256, hidden_size=64,
                               intermediate_size=128, num_layers=3,
                               num_heads=4, num_kv_heads=2, head_dim=16,
                               qk_norm=True, rope_theta=1000000.0,
                               rope_local_theta=10000.0,
                               rope_scaling_factor=8.0, rms_eps=1e-6,
                               norm_offset=1.0, hidden_act="gelu_tanh",
                               embed_scale=True, sandwich_norms=True,
                               attn_scale=16.0 ** 0.5, sliding_window=8,
                               layer_types=("sliding_attention",
                                            "sliding_attention",
                                            "full_attention"),
                               tie_embeddings=True, dtype=jnp.float32),
    "gemma3-12b": LlamaConfig(vocab_size=262208, hidden_size=3840,
                              intermediate_size=15360, num_layers=48,
                              num_heads=16, num_kv_heads=8, head_dim=256,
                              qk_norm=True, rope_theta=1000000.0,
                              rope_local_theta=10000.0,
                              rope_scaling_factor=8.0, rms_eps=1e-6,
                              norm_offset=1.0, hidden_act="gelu_tanh",
                              embed_scale=True, sandwich_norms=True,
                              attn_scale=256.0 ** 0.5, sliding_window=1024,
                              layer_types=tuple(
                                  "full_attention" if (i + 1) % 6 == 0
                                  else "sliding_attention"
                                  for i in range(48)),
                              tie_embeddings=True),
    "tiny-gemma2": LlamaConfig(vocab_size=256, hidden_size=64,
                               intermediate_size=128, num_layers=2,
                               num_heads=4, num_kv_heads=2,
                               rope_theta=10000.0, rms_eps=1e-6,
                               norm_offset=1.0, hidden_act="gelu_tanh",
                               embed_scale=True, sandwich_norms=True,
                               attn_logit_softcap=50.0,
                               final_logit_softcap=30.0,
                               dtype=jnp.float32),
}

# The 2-D linear kernels inside one decoder block, in (O, I) layout —
# exactly the set the reference quantizes per block.
LINEAR_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj")


def block_linear_names(cfg: LlamaConfig) -> Tuple[str, ...]:
    return LINEAR_KEYS


def init_params(cfg: LlamaConfig, key: jax.Array) -> Dict[str, Any]:
    """Random-init parameter pytree (tests / benchmarks use this; real
    checkpoints come from utils.hf_loader)."""
    H, hd = cfg.hidden_size, cfg.hd
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    shapes = {
        "q_proj": (qd, H), "k_proj": (kvd, H), "v_proj": (kvd, H),
        "o_proj": (H, qd),
        "gate_proj": (cfg.intermediate_size, H),
        "up_proj": (cfg.intermediate_size, H),
        "down_proj": (H, cfg.intermediate_size),
    }
    keys = jax.random.split(key, cfg.num_layers + 2)
    blocks = []
    for li in range(cfg.num_layers):
        bkeys = jax.random.split(keys[li], len(shapes))
        b = {
            name: (jax.random.normal(k, shp, cfg.dtype)
                   * (0.02 if name != "down_proj" else 0.02 / np.sqrt(2 * cfg.num_layers)))
            for (name, shp), k in zip(shapes.items(), bkeys)
        }
        # norm gains init at identity: 1 for plain RMSNorm, 0 when the
        # arch folds a +offset into the weight (Gemma)
        gain0 = jnp.full((H,), 1.0 - cfg.norm_offset, cfg.dtype)
        b["input_layernorm"] = gain0
        b["post_attention_layernorm"] = gain0
        if cfg.sandwich_norms:
            b["pre_feedforward_layernorm"] = gain0
            b["post_feedforward_layernorm"] = gain0
        if cfg.qk_norm:
            b["q_norm"] = jnp.ones((hd,), cfg.dtype)
            b["k_norm"] = jnp.ones((hd,), cfg.dtype)
        if cfg.attn_bias:
            b["q_bias"] = jnp.zeros((qd,), cfg.dtype)
            b["k_bias"] = jnp.zeros((kvd,), cfg.dtype)
            b["v_bias"] = jnp.zeros((kvd,), cfg.dtype)
        blocks.append(b)
    params = {
        "embed_tokens": jax.random.normal(keys[-2], (cfg.vocab_size, H),
                                          cfg.dtype) * 0.02,
        "norm": jnp.ones((H,), cfg.dtype),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(
            keys[-1], (cfg.vocab_size, H), cfg.dtype) * 0.02
    return params


def rms_norm(x: jax.Array, g: jax.Array, eps: float,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm; ``offset`` is the Gemma-style (offset + g) weight fold."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * (offset + g.astype(jnp.float32))).astype(dt)


def _act(name: str):
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    return jax.nn.silu


@functools.lru_cache(maxsize=4)
def _hadamard_block(n: int):
    h = np.ones((1, 1), np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    assert h.shape[0] == n, f"r4_block={n} must be a power of 2"
    return jnp.asarray(h / np.sqrt(n), jnp.float32)


def r4_rotate(x: jax.Array, block: int = 128) -> jax.Array:
    """Online block-diagonal Hadamard rotation of the trailing axis."""
    shp = x.shape
    h = _hadamard_block(block).astype(x.dtype)
    y = x.reshape(*shp[:-1], shp[-1] // block, block) @ h
    return y.reshape(shp)


def _softcap(x, cap: float):
    return jnp.tanh(x / cap) * cap


def rope_tables(cfg: LlamaConfig, seqlen: int,
                positions: Optional[jax.Array] = None,
                local: bool = False) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables (seqlen, rotary_dim) in fp32, HF half-split
    convention; ``rotary_dim = hd * partial_rotary_factor`` (GLM-4.5
    rotates only the leading half of each head).  ``local=True`` builds
    the Gemma3 sliding-layer tables (local base frequency, unscaled)."""
    frac = (cfg.partial_rotary_factor_local
            if local and cfg.partial_rotary_factor_local
            else cfg.partial_rotary_factor)
    hd = int(cfg.hd * frac)
    theta = (cfg.rope_local_theta if local and cfg.rope_local_theta
             else cfg.rope_theta)
    inv_freq = 1.0 / (theta ** (np.arange(0, hd, 2) / hd))
    if not local and cfg.rope_scaling_factor != 1.0:
        inv_freq = inv_freq / cfg.rope_scaling_factor  # HF linear scaling
    if not local and cfg.rope_llama3 is not None:
        # Llama-3.1 NTK-by-parts (HF _compute_llama3_parameters): long
        # wavelengths interpolate by `factor`, short ones extrapolate,
        # with a smooth ramp between
        factor, lo_f, hi_f, orig = cfg.rope_llama3
        wavelen = 2.0 * np.pi / inv_freq
        lo_wl, hi_wl = orig / lo_f, orig / hi_f
        smooth = np.clip((orig / wavelen - lo_f) / (hi_f - lo_f), 0.0, 1.0)
        blended = (1 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = np.where(wavelen < hi_wl, inv_freq,
                            np.where(wavelen > lo_wl, inv_freq / factor,
                                     blended))
    if positions is None:
        positions = jnp.arange(seqlen)
    ang = positions[:, None].astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32)[None, :]
    ang = jnp.concatenate([ang, ang], axis=-1)  # (S, hd)
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, n, hd); cos/sin: (S, rd) shared, or (B, S, rd) per-batch
    (continuous batching: each slot sits at its own position).  When
    rd < hd (partial rotary, GLM-4.5) only the leading rd dims rotate."""
    if cos.ndim == 2:
        c = cos[None, :, None, :].astype(jnp.float32)
        s = sin[None, :, None, :].astype(jnp.float32)
    else:
        c = cos[:, :, None, :].astype(jnp.float32)
        s = sin[:, :, None, :].astype(jnp.float32)
    rd = cos.shape[-1]
    if rd < x.shape[-1]:
        xr = x[..., :rd].astype(jnp.float32)
        rot = (xr * c + _rotate_half(xr) * s).astype(x.dtype)
        return jnp.concatenate([rot, x[..., rd:]], axis=-1)
    xf = x.astype(jnp.float32)
    return (xf * c + _rotate_half(xf) * s).astype(x.dtype)


def _plain_linear(name, x, w, b=None):
    y = jnp.einsum("...i,oi->...o", x, w)
    if b is not None:
        y = y + b
    return y


def _linear(x, w, b=None):
    return _plain_linear("", x, w, b)


def attention(q, k, v, mask: Optional[jax.Array], cfg: LlamaConfig):
    """Plain batched MHA with GQA head repeat; causal unless mask given.

    q: (B,S,nh,hd)  k,v: (B,T,nkv,hd).  Softmax in fp32 (TPU MXU feeds
    bf16 inputs; accumulation and normalization stay fp32).

    Long causal sequences on TPU route through the Pallas flash kernel
    (ops/flash_attention.py) — no (S, T) scores materialization.
    """
    B, S, nh, hd = q.shape
    if (mask is None and hd % 128 == 0 and S >= 512 and S % 256 == 0
            and k.shape[1] % 256 == 0 and cfg.attn_logit_softcap == 0.0
            and cfg.attn_scale is None
            and jax.devices()[0].platform == "tpu"):
        from ..ops.flash_attention import flash_attention
        out = flash_attention(q.transpose(0, 2, 1, 3),
                              k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3), causal=True)
        return out.transpose(0, 2, 1, 3)
    T = k.shape[1]
    rep = nh // k.shape[2]
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bsnh,btnh->bnst", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / (cfg.attn_scale if cfg.attn_scale is not None
                       else np.sqrt(hd))
    if cfg.attn_logit_softcap:
        scores = _softcap(scores, cfg.attn_logit_softcap)
    if mask is None:
        causal = jnp.tril(jnp.ones((S, T), bool), k=T - S)
        scores = jnp.where(causal[None, None], scores, -1e30)
    else:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnst,btnh->bsnh", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def block_fwd(weights: Dict[str, jax.Array], x: jax.Array,
              cos: jax.Array, sin: jax.Array, cfg: LlamaConfig,
              mask: Optional[jax.Array] = None,
              linear_fn=None) -> jax.Array:
    """One decoder block: pre-norm attn + pre-norm SwiGLU MLP.

    This is THE function the tuning loop differentiates through with qdq'd
    weights substituted — keep it pure and jit-friendly.

    ``linear_fn(name, x, w, b) -> y`` intercepts every linear application;
    it is the TPU-native replacement for the reference's forward hooks
    (``wrapper.py`` WrapperWALayer / act hooks): activation fake-quant,
    act-stat collection, and serving-kernel substitution all inject here.
    """
    lf = linear_fn or _plain_linear
    B, S, H = x.shape
    hd = cfg.hd
    off = cfg.norm_offset
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps, off)
    q = lf("q_proj", h, weights["q_proj"], weights.get("q_bias"))
    k = lf("k_proj", h, weights["k_proj"], weights.get("k_bias"))
    v = lf("v_proj", h, weights["v_proj"], weights.get("v_bias"))
    q = q.reshape(B, S, cfg.num_heads, hd)
    k = k.reshape(B, S, cfg.num_kv_heads, hd)
    v = v.reshape(B, S, cfg.num_kv_heads, hd)
    if cfg.qk_norm:  # Qwen3/Gemma3: per-head RMS before rope (Gemma's
        # zero-centered (offset + g) weight rides on norm_offset)
        q = rms_norm(q, weights["q_norm"], cfg.rms_eps, off)
        k = rms_norm(k, weights["k_norm"], cfg.rms_eps, off)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = attention(q, k, v, mask, cfg).reshape(B, S, -1)
    attn_out = lf("o_proj", attn, weights["o_proj"])
    if cfg.sandwich_norms:  # Gemma2: norm the residual branch outputs
        attn_out = rms_norm(attn_out, weights["post_attention_layernorm"],
                            cfg.rms_eps, off)
        x = x + attn_out
        h = rms_norm(x, weights["pre_feedforward_layernorm"],
                     cfg.rms_eps, off)
    else:
        x = x + attn_out
        h = rms_norm(x, weights["post_attention_layernorm"],
                     cfg.rms_eps, off)
    gate = _act(cfg.hidden_act)(lf("gate_proj", h, weights["gate_proj"]))
    up = lf("up_proj", h, weights["up_proj"])
    mlp_in = gate * up
    if cfg.online_r4:
        mlp_in = r4_rotate(mlp_in, cfg.r4_block)
    mlp_out = lf("down_proj", mlp_in, weights["down_proj"])
    if cfg.sandwich_norms:
        mlp_out = rms_norm(mlp_out, weights["post_feedforward_layernorm"],
                           cfg.rms_eps, off)
    return x + mlp_out


def embed_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: LlamaConfig) -> jax.Array:
    x = jnp.take(params["embed_tokens"], input_ids, axis=0)
    if cfg.embed_scale:  # Gemma normalizer
        x = (x.astype(jnp.float32) * np.sqrt(cfg.hidden_size)).astype(x.dtype)
    return x


def final_fwd(params: Dict[str, Any], x: jax.Array,
              cfg: LlamaConfig) -> jax.Array:
    """Final norm + lm_head → logits."""
    x = rms_norm(x, params["norm"], cfg.rms_eps, cfg.norm_offset)
    head = params.get("lm_head", params["embed_tokens"])
    logits = _linear(x, head)
    if cfg.final_logit_softcap:
        logits = _softcap(logits.astype(jnp.float32),
                          cfg.final_logit_softcap).astype(logits.dtype)
    return logits


def layer_is_sliding(cfg: LlamaConfig, layer_idx: int) -> bool:
    """Gemma2: even layers use the sliding window (HF convention);
    Gemma3-style arbitrary patterns ride in cfg.layer_types."""
    if cfg.sliding_window is None:
        return False
    if cfg.layer_types is not None:
        return cfg.layer_types[layer_idx] == "sliding_attention"
    return layer_idx % 2 == 0


def dual_rope_tables(cfg: LlamaConfig, seqlen: int,
                     positions: Optional[jax.Array] = None):
    """((cos, sin) global, (cos, sin) local) — identical unless the
    config carries a Gemma3-style local base frequency."""
    glob = rope_tables(cfg, seqlen, positions)
    if cfg.rope_local_theta:
        return glob, rope_tables(cfg, seqlen, positions, local=True)
    return glob, glob


def sliding_mask(cfg: LlamaConfig, S: int) -> jax.Array:
    """(1, 1, S, S) additive bias: causal AND within the window (rolling,
    Gemma-style) or within the same chunk (Llama4 chunked attention)."""
    rows = jnp.arange(S)[:, None]
    cols = jnp.arange(S)[None, :]
    if cfg.chunked_attention:
        w = cfg.sliding_window
        ok = (cols <= rows) & (rows // w == cols // w)
    else:
        ok = (cols <= rows) & (cols > rows - cfg.sliding_window)
    return jnp.where(ok, 0.0, -1e30)[None, None]


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: LlamaConfig) -> jax.Array:
    """Full forward → logits (eval / perplexity / LFQ loss)."""
    x = embed_fwd(params, input_ids, cfg)
    S = input_ids.shape[1]
    (cos, sin), (cosl, sinl) = dual_rope_tables(cfg, S)
    smask = (sliding_mask(cfg, S) if cfg.sliding_window is not None
             and S > cfg.sliding_window else None)
    for li, b in enumerate(params["blocks"]):
        sliding = layer_is_sliding(cfg, li)
        mask = smask if sliding else None
        c, s = (cosl, sinl) if sliding else (cos, sin)
        x = block_fwd(b, x, c, s, cfg, mask=mask)
    return final_fwd(params, x, cfg)
