"""Pure-JAX GLM-5 ``GlmMoeDsa``: DeepSeek-architecture MLA + MoE with
**DSA** (DeepSeek Sparse Attention) — a lightning indexer that selects a
per-query top-k token subset before the main attention.

Role of the reference's GLM-5 support (``modeling/unfused_moe/
glm_moe_dsa.py`` — whose routed-expert spec is the DeepSeek-V3 routing
verbatim, reused here from :mod:`.deepseek`; ``special_model_handler.py``
ignore rules — ``weights_proj`` stays unquantized; the
``prev_topk_indices`` block-output chaining registered in
``algorithms/block_runner.py:81``).  The reference's own GGUF converter
exports the family off ``DeepseekV2Model`` (``conversion/glm.py:212``),
so everything but the indexer dispatches through :mod:`.deepseek`.

**Indexer** (DeepSeek-V3.2 lightning indexer, public spec): per query
``t``, heads ``h``: ``score(t, j) = sum_h w[t,h] * relu(q_idx[t,h] .
k_idx[j])`` with a single shared key head; rope on the leading
``qk_rope_head_dim`` dims; causal top-``index_topk`` selection; main MLA
attention is masked to the selected subset (plus the diagonal).

**Index sharing**: ``index_layers`` lists the layers that own a FULL
indexer; ``model_fwd`` threads their indices to the following layers —
the TPU rendering of the reference's ``prev_topk_indices`` chaining.
For per-block CALIBRATION the orchestrator's chain carries only hidden
states, so configs where every layer indexes (``index_layers=()`` ⇒
all — DeepSeek-V3.2 semantics, the default) calibrate exactly; subset
configs calibrate each shared block with indices recomputed from that
block's own input through its stored governing-indexer copy (a
documented approximation; the projections are tiny).

No public ``transformers`` modeling exists to lock logit parity
against; numerics are pinned by the dense-equivalence property
(``index_topk >= S`` ⇒ exactly :func:`deepseek.block_fwd`) in
``tests/test_glmdsa.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import deepseek, llama
from .deepseek import DeepseekConfig, _mlp, _moe_mlp, mla_attention_inputs
from .llama import rms_norm

__all__ = ["GlmMoeDsaConfig", "init_params", "block_fwd", "model_fwd",
           "block_linear_names", "indexer_scores", "dsa_mask",
           "CONFIG_PRESETS"]


@dataclass(frozen=True)
class GlmMoeDsaConfig(DeepseekConfig):
    index_n_heads: int = 4
    index_head_dim: int = 32
    index_topk: int = 64
    # () → every layer owns an indexer (DeepSeek-V3.2 layout).  A
    # non-empty tuple lists the full-indexer layers; later layers reuse
    # the most recent one's indices (GLM-5 shared-indexer layout).
    index_layers: Tuple[int, ...] = ()

    def layer_has_indexer(self, li: int) -> bool:
        return not self.index_layers or li in self.index_layers


CONFIG_PRESETS: Dict[str, GlmMoeDsaConfig] = {
    "tiny-glmdsa": GlmMoeDsaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_kv_heads=4, rope_theta=10000.0,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=64,
        n_shared_experts=1, first_k_dense=1, routed_scaling_factor=1.8,
        scoring_func="sigmoid", n_group=2, topk_group=1,
        norm_topk_prob=True, index_n_heads=2, index_head_dim=16,
        index_topk=8, dtype=jnp.float32),
}


def block_linear_names(cfg: GlmMoeDsaConfig) -> Tuple[str, ...]:
    # indexer q/k quantize like any linear; weights_proj stays FP — the
    # reference's ignore rule (special_model_handler.py "glm5":
    # ignore_layers=[..., "weights_proj"]) — so it is NOT listed here
    return deepseek.block_linear_names(cfg) + (
        "indexer.q_proj", "indexer.k_proj")


def init_params(cfg: GlmMoeDsaConfig, key: jax.Array) -> Dict[str, Any]:
    params = deepseek.init_params(cfg, key)
    H = cfg.hidden_size
    nI, dI = cfg.index_n_heads, cfg.index_head_dim
    governing = None
    for li, b in enumerate(params["blocks"]):
        if cfg.layer_has_indexer(li):
            ik = jax.random.fold_in(key, 1000 + li)
            k1, k2, k3 = jax.random.split(ik, 3)
            b["indexer"] = {
                "q_proj": jax.random.normal(k1, (nI * dI, H),
                                            cfg.dtype) * 0.02,
                "k_proj": jax.random.normal(k2, (dI, H),
                                            cfg.dtype) * 0.02,
                "weights_proj": jax.random.normal(k3, (nI, H),
                                                  cfg.dtype) * 0.02,
            }
            governing = b
        elif governing is not None:
            # shared layer: carry a COPY of the governing indexer so the
            # per-block calibration chain stays self-contained (module
            # docstring; model_fwd threads the exact indices instead)
            b["indexer"] = dict(governing["indexer"])
    return params


def indexer_scores(weights, h, cos, sin, cfg: GlmMoeDsaConfig,
                   lf) -> jax.Array:
    """(B, S, H) hidden states → (B, S, S) indexer scores (pre-mask).

    ``w[t] = weights_proj @ h[t]`` head weights; rope on the leading
    ``qk_rope_head_dim`` dims of every indexer head (shared tables)."""
    B, S, H = h.shape
    nI, dI, dr = cfg.index_n_heads, cfg.index_head_dim, cfg.qk_rope_head_dim
    q = lf("indexer.q_proj", h, weights["indexer"]["q_proj"])
    q = q.reshape(B, S, nI, dI)
    k = lf("indexer.k_proj", h, weights["indexer"]["k_proj"])
    k = k.reshape(B, S, 1, dI)
    if dI >= dr:
        rot = lambda x: jnp.concatenate(
            [deepseek._rope_rotate(x[..., :dr], cos, sin,
                                   cfg.rope_interleave), x[..., dr:]],
            axis=-1)
        q, k = rot(q), rot(k)
    w = jnp.einsum("bsh,nh->bsn", h.astype(jnp.float32),
                   weights["indexer"]["weights_proj"].astype(jnp.float32))
    logits = jnp.einsum("bsnd,btjd->bnst", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    relu = jnp.maximum(logits, 0.0)                       # (B, nI, S, T)
    return jnp.einsum("bnst,bsn->bst", relu, w)           # (B, S, T)


def dsa_mask(scores: jax.Array, topk: int) -> jax.Array:
    """(B, S, T) indexer scores → (B, 1, S, T) additive attention bias
    keeping, per query, the causal top-``topk`` tokens plus the
    diagonal."""
    B, S, T = scores.shape
    rows = jnp.arange(S)[:, None]
    cols = jnp.arange(T)[None, :]
    causal = cols <= (rows + (T - S))
    s = jnp.where(causal[None], scores, -jnp.inf)
    k = min(topk, T)
    kth = jax.lax.top_k(s, k)[0][..., -1:]                # (B, S, 1)
    keep = (s >= kth) | (cols == rows + (T - S))[None]
    keep = keep & causal[None]
    return jnp.where(keep, 0.0, -1e30)[:, None]           # (B, 1, S, T)


def block_fwd(weights: Dict[str, Any], x: jax.Array, cos, sin,
              cfg: GlmMoeDsaConfig, mask=None, linear_fn=None,
              idx_mask: Optional[jax.Array] = None) -> jax.Array:
    """DeepSeek MLA block with the attention masked to the DSA subset.

    ``idx_mask`` injects indices threaded from an earlier full-indexer
    layer (``model_fwd``); absent, the block's own indexer runs (every
    block stores one — shared blocks carry a copy of their governing
    layer's, see module docstring)."""
    lf = linear_fn or llama._plain_linear
    B, S, H = x.shape
    h = rms_norm(x, weights["input_layernorm"], cfg.rms_eps)
    if idx_mask is None:
        sc = indexer_scores(weights, h, cos, sin, cfg, lf)
        idx_mask = dsa_mask(sc, cfg.index_topk)
    if mask is not None:
        idx_mask = idx_mask + mask.astype(jnp.float32)
    q, k, v, _, _ = mla_attention_inputs(weights, h, cos, sin, cfg, lf)
    attn = llama.attention(q, k, v, idx_mask, deepseek._attn_cfg(cfg))
    x = x + lf("o_proj", attn.reshape(B, S, -1), weights["o_proj"])
    h = rms_norm(x, weights["post_attention_layernorm"], cfg.rms_eps)
    if "experts" in weights:
        x = x + _moe_mlp(weights, h, cfg, lf)
    else:
        x = x + _mlp(weights, h, cfg, lf)
    return x


def model_fwd(params: Dict[str, Any], input_ids: jax.Array,
              cfg: GlmMoeDsaConfig) -> jax.Array:
    """Full forward with exact index threading: full-indexer layers
    compute and publish their DSA mask; following layers reuse it (the
    reference's ``prev_topk_indices`` chain)."""
    x = llama.embed_fwd(params, input_ids, cfg)
    cos, sin = deepseek.rope_tables(cfg, input_ids.shape[1])
    carry_mask = None
    for li, b in enumerate(params["blocks"]):
        if cfg.layer_has_indexer(li) and "indexer" in b:
            h = rms_norm(x, b["input_layernorm"], cfg.rms_eps)
            sc = indexer_scores(b, h, cos, sin, cfg, llama._plain_linear)
            carry_mask = dsa_mask(sc, cfg.index_topk)
        x = block_fwd(b, x, cos, sin, cfg, idx_mask=carry_mask)
    return llama.final_fwd(params, x, cfg)
