"""Device mesh + sharding rules.

This is where the TPU build goes past the reference (SURVEY.md §2.4): the
reference's only parallelism is DDP grad averaging + accelerate memory
placement; here calibration tuning and serving are laid out on a
``jax.sharding.Mesh`` with named axes

  * ``dp`` — data parallel over calibration samples (the reference's DDP
    role, ``utils/distributed.py:30-125``; grads psum over dp, and since
    only the *sign* is consumed, AVG vs SUM is immaterial — the same
    correctness note the reference documents),
  * ``tp`` — tensor parallel over weight feature dims (new capability:
    true TP instead of accelerate's per-module placement).

Rules follow the Megatron pattern: column-parallel q/k/v/gate/up (shard
out-features), row-parallel o/down (shard in-features) → one psum per
attention/MLP pair, inserted automatically by GSPMD.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "block_weight_specs", "tune_param_specs",
           "block_param_sharding", "shard_block", "data_spec"]

# per-linear weight PartitionSpec in (O, I) layout
_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW_PARALLEL = ("o_proj", "down_proj")


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh.  Defaults: tp = min(n, 8)-ish split with
    dp * tp == n_devices; single device → (1, 1)."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and tp is None:
        # favor tp on one slice (ICI-rich), dp across the rest
        tp = min(n, 4) if n % 4 == 0 else (2 if n % 2 == 0 else 1)
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != n({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def block_weight_specs(cfg=None) -> Dict[str, P]:
    """PartitionSpec per block-weight leaf name."""
    specs: Dict[str, P] = {}
    for n in _COL_PARALLEL:
        specs[n] = P("tp", None)
    for n in _ROW_PARALLEL:
        specs[n] = P(None, "tp")
    specs["input_layernorm"] = P(None)
    specs["post_attention_layernorm"] = P(None)
    specs["q_bias"] = P("tp")
    specs["k_bias"] = P("tp")
    specs["v_bias"] = P("tp")
    return specs


def tune_param_specs() -> Dict[str, Dict[str, P]]:
    """Specs for the tuning pytree {layer: {v, min_scale, max_scale}} —
    v and the (O, groups) clip scales shard exactly like the weight."""
    out: Dict[str, Dict[str, P]] = {}
    for n in _COL_PARALLEL:
        out[n] = {"v": P("tp", None), "min_scale": P("tp", None),
                  "max_scale": P("tp", None)}
    for n in _ROW_PARALLEL:
        out[n] = {"v": P(None, "tp"), "min_scale": P(None, "tp"),
                  "max_scale": P(None, "tp")}
    return out


def data_spec() -> P:
    """Calibration caches (nsamples, S, H): samples over dp, replicated tp."""
    return P("dp", None, None)


def block_param_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    return {k: NamedSharding(mesh, s) for k, s in block_weight_specs().items()}


def shard_block(block: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device_put a block's weights with TP sharding (unknown keys replicate)."""
    specs = block_weight_specs()
    out = {}
    for k, v in block.items():
        spec = specs.get(k, P())
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
