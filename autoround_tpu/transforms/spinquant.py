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
           "apply_trained_rotation", "train_r2_rotations",
           "apply_trained_r2"]


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
    calib_x: Optional[jax.Array] = None,
) -> jax.Array:
    """Learn the R1 rotation matrix.  Returns R (hidden, hidden) f32.

    Two objectives:

    * weight-space proxy (default): activation-weighted qdq error of the
      rotated read weights — forward-free, very cheap.
    * **block-output loss** (``calib_x`` given, (B, S, hidden) block-0
      inputs): MSE between the rotated-qdq block forward and the FP
      block output over real activations — the model-loss-aware
      objective (role of the reference's full-model training loop,
      ``transforms/spinquant/training.py:209``, applied block-wise: the
      same quantity the SignRound tuner optimizes).  Orthogonal
      invariance lets the FP target be computed once in the unrotated
      basis and rotated per step.
    """
    H = jnp.asarray(hadamard_matrix(cfg.hidden_size, seed), jnp.float32)
    qfn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym,
                         mode="rtn")

    fused = fuse_rms_gains(params, cfg) if calib_x is not None else params
    blocks = fused["blocks"]
    if sq_cfg.max_blocks:
        blocks = blocks[: sq_cfg.max_blocks]
    read_ws = [b[n].astype(jnp.float32) for b in blocks
               for n in sq_cfg.layers_per_block]

    if calib_x is not None:
        cos, sin = llama.rope_tables(cfg, calib_x.shape[1])
        x0 = calib_x.astype(jnp.float32)
        # FP chain through the (norm-fused) blocks, unrotated basis
        fp_outs = []
        xc = x0
        for b in blocks:
            xc = llama.block_fwd(b, xc, cos, sin, cfg)
            fp_outs.append(xc)

        read_names = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
        write_names = ("o_proj", "down_proj")

        def _qdq(w):
            return qfn(w, bits=scheme.bits,
                       group_size=scheme.group_size).qdq

        def loss_fn(A):
            R = H @ cayley(_skew(A))
            total = 0.0
            x = x0 @ R
            for b, fp in zip(blocks, fp_outs):
                br = dict(b)
                for n in read_names:
                    br[n] = _qdq(b[n].astype(jnp.float32) @ R)
                for n in write_names:
                    br[n] = _qdq(R.T @ b[n].astype(jnp.float32))
                x = llama.block_fwd(br, x, cos, sin, cfg)
                total = total + jnp.mean((x - fp @ R) ** 2)
            return total * 1000.0
    else:
        def loss_fn(A):
            R = H @ cayley(_skew(A))
            total = 0.0
            for w in read_ws:
                wr = w @ R
                qdq = qfn(wr, bits=scheme.bits,
                          group_size=scheme.group_size).qdq
                total = total + jnp.sum((wr - qdq) ** 2)
            return total / len(read_ws)

    A0 = jnp.zeros((cfg.hidden_size, cfg.hidden_size), jnp.float32)

    # the loss data (weights/activations) rides as a jit ARGUMENT — a
    # closure capture would bake it into the HLO as constants (GBs at
    # real-model scale, shipped with every remote compile)
    if calib_x is not None:
        loss_data = (tuple(blocks), x0, tuple(fp_outs))

        def loss_with(A, data):
            nonlocal blocks, x0, fp_outs
            blocks_s, x0_s, fp_s = blocks, x0, fp_outs
            blocks, x0, fp_outs = list(data[0]), data[1], list(data[2])
            try:
                return loss_fn(A)
            finally:
                blocks, x0, fp_outs = blocks_s, x0_s, fp_s
    else:
        loss_data = tuple(read_ws)

        def loss_with(A, data):
            nonlocal read_ws
            saved = read_ws
            read_ws = list(data)
            try:
                return loss_fn(A)
            finally:
                read_ws = saved

    @jax.jit
    def run(A0, data):
        def step(carry, i):
            A, best_A, best_l = carry
            l, g = jax.value_and_grad(loss_with)(A, data)
            is_best = l < best_l
            best_A = jnp.where(is_best, A, best_A)
            best_l = jnp.minimum(best_l, l)
            A = A - sq_cfg.lr * jnp.sign(_skew(g))
            return (A, best_A, best_l), l

        (_, best_A, best_l), losses = jax.lax.scan(
            step, (A0, A0, jnp.inf), jnp.arange(sq_cfg.steps))
        return best_A, losses

    best_A, losses = run(A0, loss_data)
    logger.info("SpinQuant R1: loss %.5g -> %.5g over %d steps",
                float(losses[0]), float(jnp.min(losses)), sq_cfg.steps)
    return H @ cayley(_skew(best_A))


def train_r2_rotations(
    params: Dict[str, Any],
    cfg: llama.LlamaConfig,
    scheme: QuantizationScheme,
    sq_cfg: SpinQuantConfig = SpinQuantConfig(),
    seed: int = 0,
) -> jax.Array:
    """Learn per-layer R2 rotations of the value/output head space.

    SpinQuant's R2 (reference ``transforms/spinquant``): for each layer
    an orthogonal (hd, hd) matrix rotates every value head's output and
    the matching o_proj input columns — exact reparameterization
    (softmax weights are per-head scalars, so ``Σ p_t R2ᵀv_t = R2ᵀ Σ p_t
    v_t``) that reshapes the v/o weight distributions for quantization.
    All layers train jointly as one stacked (L, hd, hd) Cayley parameter
    in a single jitted scan.  Returns R2 stack (L, hd, hd) f32.
    """
    hd = cfg.hd
    L = len(params["blocks"])
    H2 = jnp.asarray(hadamard_matrix(hd, seed), jnp.float32)
    qfn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym,
                         mode="rtn")
    wv = jnp.stack([b["v_proj"].astype(jnp.float32).reshape(
        cfg.num_kv_heads, hd, -1) for b in params["blocks"]])  # (L,nkv,hd,H)
    wo = jnp.stack([b["o_proj"].astype(jnp.float32).reshape(
        -1, cfg.num_heads, hd) for b in params["blocks"]])     # (L,H,nh,hd)

    def _qdq_err(w2d):
        qdq = qfn(w2d, bits=scheme.bits, group_size=scheme.group_size).qdq
        return jnp.sum((w2d - qdq) ** 2)

    def loss_fn(As):
        Rs = jax.vmap(lambda a: H2 @ cayley(_skew(a)))(As)     # (L,hd,hd)
        # v rows per head: W_v' = R2ᵀ W_vh ; o cols per head: W_oh R2
        wv_r = jnp.einsum("lde,lkeH->lkdH", Rs.transpose(0, 2, 1), wv)
        wo_r = jnp.einsum("lHne,led->lHnd", wo, Rs)
        total = 0.0
        for li in range(L):
            total = total + _qdq_err(wv_r[li].reshape(
                cfg.num_kv_heads * hd, -1))
            total = total + _qdq_err(wo_r[li].reshape(wo.shape[1], -1))
        return total / (2 * L)

    A0 = jnp.zeros((L, hd, hd), jnp.float32)

    # weights ride as jit arguments (no captured-constant HLO)
    def loss_with(A, data):
        nonlocal wv, wo
        saved = (wv, wo)
        wv, wo = data
        try:
            return loss_fn(A)
        finally:
            wv, wo = saved

    @jax.jit
    def run(A0, data):
        def step(carry, i):
            A, best_A, best_l = carry
            l, g = jax.value_and_grad(loss_with)(A, data)
            is_best = l < best_l
            best_A = jnp.where(is_best, A, best_A)
            best_l = jnp.minimum(best_l, l)
            A = A - sq_cfg.lr * jnp.sign(jax.vmap(_skew)(g))
            return (A, best_A, best_l), l

        (_, best_A, best_l), losses = jax.lax.scan(
            step, (A0, A0, jnp.inf), jnp.arange(sq_cfg.steps))
        return best_A, losses

    best_A, losses = run(A0, (wv, wo))
    logger.info("SpinQuant R2: loss %.5g -> %.5g over %d steps",
                float(losses[0]), float(jnp.min(losses)), sq_cfg.steps)
    return jax.vmap(lambda a: H2 @ cayley(_skew(a)))(best_A)


def apply_trained_r2(params: Dict[str, Any], cfg: llama.LlamaConfig,
                     R2s: jax.Array) -> Dict[str, Any]:
    """Bake per-layer R2 into v_proj/o_proj (exact reparameterization)."""
    hd = cfg.hd
    new_blocks = []
    for li, block in enumerate(params["blocks"]):
        R = R2s[li].astype(jnp.float32)
        b = dict(block)
        wv = b["v_proj"].astype(jnp.float32).reshape(
            cfg.num_kv_heads, hd, -1)
        b["v_proj"] = jnp.einsum("de,keH->kdH", R.T, wv).reshape(
            cfg.num_kv_heads * hd, -1).astype(block["v_proj"].dtype)
        if b.get("v_bias") is not None:
            vb = b["v_bias"].astype(jnp.float32).reshape(
                cfg.num_kv_heads, hd)
            b["v_bias"] = (vb @ R).reshape(-1).astype(block["v_bias"].dtype)
        wo = b["o_proj"].astype(jnp.float32).reshape(
            -1, cfg.num_heads, hd)
        b["o_proj"] = jnp.einsum("Hne,ed->Hnd", wo, R).reshape(
            wo.shape[0], -1).astype(block["o_proj"].dtype)
        new_blocks.append(b)
    out = dict(params)
    out["blocks"] = new_blocks
    return out


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
