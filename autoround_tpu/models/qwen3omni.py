"""Qwen3-Omni (thinker): audio encoder + deepstack ViT + Qwen3-MoE
decoder — the zoo's first AUDIO-modality family.

Role of the reference's qwen3_omni fused-expert spec
(``modeling/fused_moe/qwen3_omni.py``) and its qwen2_5_omni /
qwen3_omni_moe template registrations; modeling mirrors HF
``Qwen3OmniMoeThinkerForConditionalGeneration``.  The vision/text sides
ARE ``models.qwen3vlmoe`` (config subclass); what this module adds is
the audio tower and its splice:

* audio tower (HF ``Qwen3OmniMoeAudioEncoder``): the (T, 128) log-mel
  spectrogram (utils/audio.py) splits into 2·n_window-frame chunks,
  each chunk runs three stride-2 3x3 conv2d stages over (mel, time)
  with exact GELU (8x time/mel downsample), flattens (channel, mel')
  per step through a bias-free linear into d_model, adds per-chunk
  Whisper sinusoid positions, then pre-LN transformer layers whose
  attention is BLOCK-DIAGONAL over groups of
  ``n_window_infer // (2 n_window)`` chunks; ln_post → proj1 → GELU →
  proj2 projects into the decoder width.
* splice: projected audio frames replace ``audio_token_id`` positions
  in the text embedding, exactly like image soft tokens.

TPU-first shape discipline: T is static and a multiple of 2·n_window
(the calibration batcher pads the mel features host-side), so chunking
is a reshape, the block-diag attention is a batched dense attention
over (groups, g_len) — no ragged cu_seqlens machinery in the trace.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import llama, mixtral, qwen3vlmoe

__all__ = ["Qwen3OmniConfig", "init_params", "embed_fwd", "model_fwd",
           "audio_fwd", "block_linear_names", "CONFIG_PRESETS"]


@dataclass(frozen=True)
class Qwen3OmniConfig(qwen3vlmoe.Qwen3VLMoeConfig):
    audio_token_id: int = 151646
    # --- audio tower (HF Qwen3OmniMoeAudioEncoderConfig) ---
    a_d_model: int = 1280
    a_layers: int = 32
    a_heads: int = 20
    a_ffn: int = 5120
    n_mels: int = 128
    a_downsample_hidden: int = 480
    a_n_window: int = 100
    a_n_window_infer: int = 400
    a_max_positions: int = 1500

    @property
    def a_chunk(self) -> int:
        return 2 * self.a_n_window

    @property
    def a_conv_freq(self) -> int:
        f = self.n_mels
        for _ in range(3):
            f = (f - 1) // 2 + 1
        return f

    def a_tokens_for(self, T: int) -> int:
        """Audio tokens for T mel frames (T % a_chunk == 0)."""
        per_chunk = (self.a_chunk - 1) // 8 + 1
        return (T // self.a_chunk) * per_chunk


CONFIG_PRESETS: Dict[str, Qwen3OmniConfig] = {
    "tiny-qwen3omni": Qwen3OmniConfig(
        vocab_size=256, hidden_size=64, intermediate_size=32,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        qk_norm=True, norm_topk_prob=True, num_experts=4, top_k=2,
        rope_theta=5e6, dtype=jnp.float32,
        mrope_section=(4, 2, 2), image_token_id=5, audio_token_id=9,
        v_embed_dim=32, v_layers=2, v_heads=2, v_intermediate=64,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        num_position_embeddings=64, deepstack_visual_indexes=(0,),
        a_d_model=32, a_layers=2, a_heads=2, a_ffn=64, n_mels=32,
        a_downsample_hidden=12, a_n_window=8, a_n_window_infer=32,
        a_max_positions=64),
}


def block_linear_names(cfg: Qwen3OmniConfig) -> Tuple[str, ...]:
    return mixtral.block_linear_names(cfg)


def init_params(cfg: Qwen3OmniConfig, key: jax.Array) -> Dict[str, Any]:
    params = qwen3vlmoe.init_params(cfg, key)
    ak = jax.random.split(jax.random.fold_in(key, 377), cfg.a_layers + 8)
    D, F = cfg.a_d_model, cfg.a_ffn
    dh = cfg.a_downsample_hidden
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
        # conv2d kernels in (out, in, kh, kw) like torch
        "conv1": n(ak[-8], (dh, 1, 3, 3)), "conv1_b": z((dh,)),
        "conv2": n(ak[-7], (dh, dh, 3, 3)), "conv2_b": z((dh,)),
        "conv3": n(ak[-6], (dh, dh, 3, 3)), "conv3_b": z((dh,)),
        "conv_out": n(ak[-5], (D, dh * cfg.a_conv_freq)),
        "blocks": blocks,
        "ln_post_g": o((D,)), "ln_post_b": z((D,)),
        "proj1": n(ak[-4], (D, D)), "proj1_b": z((D,)),
        "proj2": n(ak[-3], (cfg.hidden_size, D)),
        "proj2_b": z((cfg.hidden_size,)),
    }
    return params


def _sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """Whisper sinusoid table (HF SinusoidsPositionEmbedding)."""
    inc = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2, dtype=np.float64))
    t = np.arange(length, dtype=np.float64)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _conv2d_s2(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 conv (NCHW), exact GELU."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jax.nn.gelu(y + b[None, :, None, None], approximate=False)


def audio_fwd(at: Dict[str, Any], feats: jax.Array,
              cfg: Qwen3OmniConfig) -> jax.Array:
    """(T, n_mels) log-mel features → (n_tokens, hidden) soft tokens.
    T must be a static multiple of ``cfg.a_chunk``."""
    T, M = feats.shape
    C = cfg.a_chunk
    assert T % C == 0, f"audio frames {T} must be a multiple of {C}"
    nch = T // C
    D, nh = cfg.a_d_model, cfg.a_heads
    hd = D // nh
    # chunks: (nch, 1, mel, C) — conv over (mel, time)
    x = feats.reshape(nch, C, M).transpose(0, 2, 1)[:, None]
    x = x.astype(at["conv1"].dtype)
    x = _conv2d_s2(x, at["conv1"], at["conv1_b"])
    x = _conv2d_s2(x, at["conv2"], at["conv2_b"])
    x = _conv2d_s2(x, at["conv3"], at["conv3_b"])
    b, c, f, t = x.shape
    x = x.transpose(0, 3, 1, 2).reshape(b, t, c * f)   # (nch, t, c*f)
    x = jnp.einsum("btf,df->btd", x, at["conv_out"])
    x = x + jnp.asarray(_sinusoid_positions(t, D))[None]
    # block-diagonal attention: groups of n_window_infer/(2 n_window)
    # chunks attend jointly (equal-chunk static reshape)
    w = max(1, cfg.a_n_window_infer // C)
    ng = -(-nch // w)
    pad_ch = ng * w - nch
    kmask = None
    if pad_ch:
        x = jnp.concatenate([x, jnp.zeros((pad_ch, t, D), x.dtype)], 0)
        # padded chunks must NOT serve as attention keys (HF drops them
        # via the after-cnn mask before the layers run)
        valid = np.ones((ng * w, t), bool)
        valid[nch:] = False
        kmask = jnp.asarray(
            np.where(valid.reshape(ng, w * t), 0.0, -1e9)
        ).astype(jnp.float32)                          # (ng, L)
    g = x.reshape(ng, w * t, D)                        # (groups, L, D)
    L = g.shape[1]
    for blk in at["blocks"]:
        h = qwen3vlmoe._layer_norm(g, blk["ln1_g"], blk["ln1_b"], eps=1e-5)
        q = (jnp.einsum("gld,od->glo", h, blk["q_proj"]) + blk["q_b"]
             ).reshape(ng, L, nh, hd)
        k = (jnp.einsum("gld,od->glo", h, blk["k_proj"]) + blk["k_b"]
             ).reshape(ng, L, nh, hd)
        v = (jnp.einsum("gld,od->glo", h, blk["v_proj"]) + blk["v_b"]
             ).reshape(ng, L, nh, hd)
        s = jnp.einsum("gsnh,gtnh->gnst", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        if kmask is not None:
            s = s + kmask[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("gnst,gtnh->gsnh", p, v).reshape(ng, L, D)
        g = g + jnp.einsum("gld,od->glo", a, blk["out_proj"]) + blk["out_b"]
        h = qwen3vlmoe._layer_norm(g, blk["ln2_g"], blk["ln2_b"], eps=1e-5)
        h = jnp.einsum("gld,fd->glf", h, blk["fc1"]) + blk["fc1_b"]
        h = jax.nn.gelu(h, approximate=False)
        g = g + jnp.einsum("glf,df->gld", h, blk["fc2"]) + blk["fc2_b"]
    x = g.reshape(ng * w, t, D)[:nch].reshape(nch * t, D)
    x = qwen3vlmoe._layer_norm(x, at["ln_post_g"], at["ln_post_b"], eps=1e-5)
    x = jnp.einsum("nd,od->no", x, at["proj1"]) + at["proj1_b"]
    x = jax.nn.gelu(x, approximate=False)
    return jnp.einsum("nd,hd->nh", x, at["proj2"]) + at["proj2_b"]


def embed_fwd(params: Dict[str, Any],
              inputs: Union[jax.Array, Dict[str, Any]],
              cfg: Qwen3OmniConfig) -> jax.Array:
    x = qwen3vlmoe.embed_fwd(params, inputs, cfg)
    if not isinstance(inputs, dict):
        return x
    feats = inputs.get("input_features")
    if feats is None:
        return x
    ids = inputs["input_ids"]
    B = ids.shape[0]
    if feats.ndim == 2:                  # shared features: (T, n_mels)
        audio = audio_fwd(params["audio_tower"], feats, cfg)
        audio = jnp.broadcast_to(audio[None], (B,) + audio.shape)
    else:                                # per-row: (B, T, n_mels)
        audio = jax.vmap(lambda f: audio_fwd(params["audio_tower"], f,
                                             cfg))(feats)
    is_aud = ids == cfg.audio_token_id
    tok_idx = jnp.clip(jnp.cumsum(is_aud, axis=1) - 1, 0,
                       audio.shape[1] - 1)
    gathered = jnp.take_along_axis(audio, tok_idx[..., None], axis=1)
    return jnp.where(is_aud[..., None], gathered.astype(x.dtype), x)


def model_fwd(params: Dict[str, Any], inputs,
              cfg: Qwen3OmniConfig) -> jax.Array:
    x = embed_fwd(params, inputs, cfg)
    cos, sin = qwen3vlmoe.rope_tables_for_inputs(cfg, inputs)
    extras = qwen3vlmoe.chain_extras(params, inputs, cfg)
    for li, b in enumerate(params["blocks"]):
        x = mixtral.block_fwd(b, x, cos, sin, cfg)
        if li in extras:
            x = x + extras[li]
    return llama.final_fwd(params, x, cfg)
