"""Hadamard rotation preprocessing (QuaRot-style R1).

Role of the reference's ``transforms/hadamard/`` (inplace apply + hook
variants, deterministic/random construction): rotate the residual stream
by an orthogonal (scaled) Hadamard matrix so outlier channels spread
across the hidden dimension before quantization — a pure reparameterization
that leaves model outputs unchanged.

Functional-pytree version: RMSNorm gains are first folded into the
consuming linears (rotation only commutes with *unit-gain* RMSNorm), then

    embed       E  -> E H          (x' = H^T x for every residual tensor)
    read-side   W  -> W H          (q/k/v/gate/up, lm_head)
    write-side  W  -> H^T W        (o_proj, down_proj)

H is a scaled Sylvester Hadamard (H H^T = I), optionally randomized with a
diagonal ±1 (preserves orthogonality).  Non-power-of-two hidden sizes use
a block-diagonal H (power-of-two blocks), like the reference's
block-diagonal fallback.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..utils.logger import logger

__all__ = ["hadamard_matrix", "fuse_rms_gains", "apply_r1_rotation",
           "apply_r4_rotation"]


def _sylvester(k: int) -> np.ndarray:
    h = np.array([[1.0]])
    for _ in range(k):
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard_matrix(n: int, seed: Optional[int] = None) -> np.ndarray:
    """Orthonormal (scaled) Hadamard-like matrix of size n.

    Power-of-two sizes use Sylvester; other sizes use the largest
    power-of-two block diagonal (still orthogonal, slightly less mixing —
    the reference's bank of known non-pow2 Hadamards can slot in later).
    Optional random ±1 diagonal (SpinQuant-lite randomization).
    """
    blocks = []
    rem = n
    while rem > 0:
        k = rem.bit_length() - 1
        size = 1 << k
        blocks.append(_sylvester(k) / np.sqrt(size))
        rem -= size
    if len(blocks) == 1:
        h = blocks[0]
    else:
        h = np.zeros((n, n))
        off = 0
        for b in blocks:
            s = b.shape[0]
            h[off:off + s, off:off + s] = b
            off += s
    if seed is not None:
        rng = np.random.default_rng(seed)
        d = rng.choice([-1.0, 1.0], size=n)
        h = h * d[None, :]
    return h


def fuse_rms_gains(params: Dict[str, Any], cfg: llama.LlamaConfig
                   ) -> Dict[str, Any]:
    """Fold RMSNorm gains into the consuming linears; norms become 1.

    input_layernorm → q/k/v; post_attention_layernorm → gate/up;
    final norm → lm_head (or tied embeddings' output use).
    """
    out = jax.tree.map(lambda x: x, params)
    new_blocks = []
    for block in out["blocks"]:
        b = dict(block)
        g1 = b["input_layernorm"].astype(jnp.float32)
        for n in ("q_proj", "k_proj", "v_proj"):
            b[n] = (b[n].astype(jnp.float32) * g1[None, :]).astype(b[n].dtype)
        b["input_layernorm"] = jnp.ones_like(b["input_layernorm"])
        g2 = b["post_attention_layernorm"].astype(jnp.float32)
        for n in ("gate_proj", "up_proj"):
            b[n] = (b[n].astype(jnp.float32) * g2[None, :]).astype(b[n].dtype)
        b["post_attention_layernorm"] = jnp.ones_like(
            b["post_attention_layernorm"])
        new_blocks.append(b)
    out["blocks"] = new_blocks

    gf = out["norm"].astype(jnp.float32)
    if "lm_head" in out:
        out["lm_head"] = (out["lm_head"].astype(jnp.float32)
                          * gf[None, :]).astype(out["lm_head"].dtype)
        out["norm"] = jnp.ones_like(out["norm"])
    else:
        # tied embeddings double as the head; folding the gain into the
        # embedding would change the input side, so keep the final norm
        logger.warning("tied embeddings: final norm gain left in place")
    return out


def apply_r1_rotation(params: Dict[str, Any], cfg: llama.LlamaConfig,
                      seed: Optional[int] = None) -> Dict[str, Any]:
    """Apply the residual-stream rotation.  Returns new params whose
    ``model_fwd`` outputs are numerically unchanged (orthogonal reparam).
    """
    p = fuse_rms_gains(params, cfg)
    H = jnp.asarray(hadamard_matrix(cfg.hidden_size, seed), jnp.float32)

    def rot_read(w):   # W -> W H  (consumes hidden)
        return (w.astype(jnp.float32) @ H).astype(w.dtype)

    def rot_write(w):  # W -> H^T W  (produces hidden)
        return (H.T @ w.astype(jnp.float32)).astype(w.dtype)

    p["embed_tokens"] = rot_read(p["embed_tokens"])  # rows are hidden vecs
    if "lm_head" in p:
        p["lm_head"] = rot_read(p["lm_head"])
    new_blocks = []
    for block in p["blocks"]:
        b = dict(block)
        for n in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
            b[n] = rot_read(b[n])
        for n in ("o_proj", "down_proj"):
            b[n] = rot_write(b[n])
        new_blocks.append(b)
    p["blocks"] = new_blocks
    logger.info("applied R1 Hadamard rotation (hidden=%d, seed=%s)",
                cfg.hidden_size, seed)
    return p


def apply_r4_rotation(params: Dict[str, Any], cfg: llama.LlamaConfig,
                      block: int = 128):
    """QuaRot online R4: pre-rotate down_proj weights so the runtime
    block-Hadamard on its input (``llama.r4_rotate``, enabled with
    ``cfg.online_r4``) is an exact reparameterization.

    y = x W^T becomes (x H) (W H)^T with H block-diag orthogonal, so the
    stored weight is W' = W H and the activation quantizer now sees
    Hadamard-spread (outlier-free) down_proj inputs.  Returns
    (new_params, new_cfg) — the cfg carries the runtime flag.
    """
    import dataclasses

    from ..models.llama import _hadamard_block

    H = _hadamard_block(block)

    def rot(w):  # (O, I): rotate the input side in blocks of `block`
        O, I = w.shape
        w3 = w.astype(jnp.float32).reshape(O, I // block, block)
        return jnp.einsum("oib,bc->oic", w3, H).reshape(O, I).astype(w.dtype)

    p = dict(params)
    p["blocks"] = [dict(b, down_proj=rot(b["down_proj"]))
                   for b in params["blocks"]]
    new_cfg = dataclasses.replace(cfg, online_r4=True, r4_block=block)
    logger.info("applied online R4 rotation (block=%d) to %d down_proj",
                block, len(p["blocks"]))
    return p, new_cfg
