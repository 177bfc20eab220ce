"""Qwen2.5-Omni (thinker): conv1d audio encoder + Qwen2.5-VL window
ViT over the Qwen2.5 m-rope decoder.

Role of the reference's qwen2_5_omni template/processor registration
(``compressors/mllm/template.py:122``); modeling mirrors HF
``Qwen2_5OmniThinker*``.  The vision/decoder sides ARE
``models.qwen25vl`` (config subclass); the audio tower differs from
Qwen3-Omni's (``models.qwen3omni``):

* per 2·n_window-frame mel chunk: conv1d(k3, p1) → GELU → conv1d(k3,
  s2, p1) → GELU (2x time downsample, mel treated as channels), plus
  Whisper sinusoid positions restarting per chunk;
* transformer layers attend BLOCK-DIAGONALLY per chunk (equal static
  chunks → batched attention over the chunk dim, no mask);
* tail: avg-pool(2) over time (pairs stay inside chunks — the post-conv
  chunk length is even), LayerNorm, linear projection into the decoder
  width → one soft token per 4 mel frames.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import llama, qwen25vl, qwen2vl, qwen3omni

__all__ = ["Qwen25OmniConfig", "init_params", "embed_fwd", "model_fwd",
           "audio_fwd", "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Qwen25OmniConfig(qwen25vl.Qwen25VLConfig):
    audio_token_id: int = 151646
    a_d_model: int = 1280
    a_layers: int = 32
    a_heads: int = 20
    a_ffn: int = 5120
    n_mels: int = 128
    a_n_window: int = 100
    a_max_positions: int = 1500

    @property
    def a_chunk(self) -> int:
        return 2 * self.a_n_window

    def a_tokens_for(self, T: int) -> int:
        """Audio tokens for T mel frames (T % a_chunk == 0): conv2
        halves, avg-pool halves again."""
        return (T // self.a_chunk) * (self.a_chunk // 4)


CONFIG_PRESETS: Dict[str, Qwen25OmniConfig] = {
    "tiny-qwen25omni": Qwen25OmniConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, attn_bias=True,
        rope_theta=1e4, dtype=jnp.float32,
        mrope_section=(2, 3, 3), image_token_id=5, audio_token_id=9,
        v_embed_dim=32, v_layers=2, v_heads=2, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2, v_intermediate=48,
        window_size=16, fullatt_block_indexes=(1,),
        a_d_model=32, a_layers=2, a_heads=2, a_ffn=64, n_mels=32,
        a_n_window=8, a_max_positions=64),
}


def block_linear_names(cfg: Qwen25OmniConfig) -> Tuple[str, ...]:
    return llama.LINEAR_KEYS


def init_params(cfg: Qwen25OmniConfig, key: jax.Array) -> Dict[str, Any]:
    params = qwen25vl.init_params(cfg, key)
    ak = jax.random.split(jax.random.fold_in(key, 677), cfg.a_layers + 6)
    D, F = cfg.a_d_model, cfg.a_ffn
    n = lambda k, s: jax.random.normal(k, s, cfg.dtype) * 0.02
    z = lambda s: jnp.zeros(s, cfg.dtype)
    o = lambda s: jnp.ones(s, cfg.dtype)
    blocks = []
    for li in range(cfg.a_layers):
        bk = jax.random.split(ak[li], 6)
        blocks.append({
            "ln1_g": o((D,)), "ln1_b": z((D,)),
            "q_proj": n(bk[0], (D, D)), "q_b": z((D,)),
            "k_proj": n(bk[1], (D, D)), "k_b": z((D,)),
            "v_proj": n(bk[2], (D, D)), "v_b": z((D,)),
            "out_proj": n(bk[3], (D, D)), "out_b": z((D,)),
            "ln2_g": o((D,)), "ln2_b": z((D,)),
            "fc1": n(bk[4], (F, D)), "fc1_b": z((F,)),
            "fc2": n(bk[5], (D, F)), "fc2_b": z((D,)),
        })
    params["audio_tower"] = {
        "conv1": n(ak[-6], (D, cfg.n_mels, 3)),   # (out, in, k) 1-D
        "conv1_b": z((D,)),
        "conv2": n(ak[-5], (D, D, 3)), "conv2_b": z((D,)),
        "blocks": blocks,
        "ln_post_g": o((D,)), "ln_post_b": z((D,)),
        "proj": n(ak[-4], (cfg.hidden_size, D)),
        "proj_b": z((cfg.hidden_size,)),
    }
    return params


def _conv1d(x, w, b, stride: int):
    """x (B, Cin, T) → (B, Cout, T') with k=3 pad=1."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return jax.nn.gelu(y + b[None, :, None], approximate=False)


def audio_fwd(at: Dict[str, Any], feats: jax.Array,
              cfg: Qwen25OmniConfig) -> jax.Array:
    """(T, n_mels) log-mel → (T//4, hidden) soft tokens; T static
    multiple of ``cfg.a_chunk``."""
    T, M = feats.shape
    C = cfg.a_chunk
    assert T % C == 0, f"audio frames {T} must be a multiple of {C}"
    nch = T // C
    D, nh = cfg.a_d_model, cfg.a_heads
    hd = D // nh
    x = feats.reshape(nch, C, M).transpose(0, 2, 1)     # (nch, mel, C)
    x = x.astype(at["conv1"].dtype)
    x = _conv1d(x, at["conv1"], at["conv1_b"], 1)
    x = _conv1d(x, at["conv2"], at["conv2_b"], 2)       # (nch, D, C/2)
    x = x.transpose(0, 2, 1)                            # (nch, t, D)
    t = x.shape[1]
    x = x + jnp.asarray(qwen3omni._sinusoid_positions(t, D))[None]
    # block-diagonal per chunk == batched attention over the chunk dim
    for blk in at["blocks"]:
        h = qwen2vl._layer_norm(x, blk["ln1_g"], blk["ln1_b"], eps=1e-5)
        q = (jnp.einsum("gld,od->glo", h, blk["q_proj"]) + blk["q_b"]
             ).reshape(nch, t, nh, hd)
        k = (jnp.einsum("gld,od->glo", h, blk["k_proj"]) + blk["k_b"]
             ).reshape(nch, t, nh, hd)
        v = (jnp.einsum("gld,od->glo", h, blk["v_proj"]) + blk["v_b"]
             ).reshape(nch, t, nh, hd)
        s = jnp.einsum("gsnh,gtnh->gnst", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("gnst,gtnh->gsnh", p, v).reshape(nch, t, D)
        x = x + jnp.einsum("gld,od->glo", a, blk["out_proj"]) + blk["out_b"]
        h = qwen2vl._layer_norm(x, blk["ln2_g"], blk["ln2_b"], eps=1e-5)
        h = jnp.einsum("gld,fd->glf", h, blk["fc1"]) + blk["fc1_b"]
        h = jax.nn.gelu(h, approximate=False)
        x = x + jnp.einsum("glf,df->gld", h, blk["fc2"]) + blk["fc2_b"]
    # avg-pool(2) over time (pairs stay within chunks: t is even)
    x = x.reshape(nch * t // 2, 2, D).mean(axis=1)
    x = qwen2vl._layer_norm(x, at["ln_post_g"], at["ln_post_b"], eps=1e-5)
    return jnp.einsum("nd,hd->nh", x, at["proj"]) + at["proj_b"]


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, Any]],
              cfg: Qwen25OmniConfig) -> jax.Array:
    x = qwen25vl.embed_fwd(params, inputs, cfg)
    if not isinstance(inputs, dict):
        return x
    feats = inputs.get("input_features")
    if feats is None:
        return x
    ids = inputs["input_ids"]
    B = ids.shape[0]
    if feats.ndim == 2:
        audio = audio_fwd(params["audio_tower"], feats, cfg)
        audio = jnp.broadcast_to(audio[None], (B,) + audio.shape)
    else:
        audio = jax.vmap(lambda f: audio_fwd(params["audio_tower"], f,
                                             cfg))(feats)
    is_aud = ids == cfg.audio_token_id
    idx = jnp.clip(jnp.cumsum(is_aud, axis=1) - 1, 0,
                   audio.shape[1] - 1)
    gathered = jnp.take_along_axis(audio, idx[..., None], axis=1)
    return jnp.where(is_aud[..., None], gathered.astype(x.dtype), x)


def model_fwd(params: Dict[str, Any], inputs,
              cfg: Qwen25OmniConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    cos, sin = qwen2vl.rope_tables_for_inputs(cfg, inputs)
    for b in params["blocks"]:
        x = llama.block_fwd(b, x, cos, sin, cfg)
    return llama.final_fwd(params, x, cfg)
