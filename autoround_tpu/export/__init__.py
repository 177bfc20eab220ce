"""Export formats (role of reference ``auto_round/export/``).

Formats:
  * ``fake``      — qdq weights serialized as safetensors + a
    quantization_config.json; loadable for eval without kernels
    (reference ``export/formats/backends/fake.py``).
  * ``autoround`` — packed int codes: qweight/qzeros/scales int32 words
    (reference ``export_to_autoround/export.py:143`` layout).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from ..utils.logger import logger
from .packing import pack_quantized, unpack_quantized

__all__ = ["save_quantized", "load_fake", "pack_quantized", "unpack_quantized",
           "codes_from_qdq"]


def _flatten_params(params: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_params(v, name + "."))
        elif isinstance(v, (list, tuple)):
            for i, item in enumerate(v):
                out.update(_flatten_params(item, f"{name}.{i}."))
        else:
            out[name] = np.asarray(v)
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for name, arr in flat.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node)
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def codes_from_qdq(qdq: np.ndarray, scale: np.ndarray, zp, bits: int,
                   group_size: int) -> np.ndarray:
    """Recover integer codes from a qdq weight: q = round(qdq/s) + zp.
    Exact because qdq lies on the grid."""
    O, I = qdq.shape
    g = group_size if group_size > 0 else I
    s = np.repeat(np.asarray(scale, np.float64), g, axis=1)[:, :I]
    if zp is None:
        z = 2 ** (bits - 1)
    else:
        z = np.repeat(np.asarray(zp, np.float64), g, axis=1)[:, :I]
    q = np.rint(np.asarray(qdq, np.float64) / s + z)
    return np.clip(q, 0, 2 ** bits - 1).astype(np.uint32)


def save_quantized(result, model_cfg, output_dir: str,
                   format: str = "fake") -> str:
    """Write a quantized checkpoint.  Returns output_dir."""
    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    qcfg = {
        "quant_method": "auto-round",
        "provider": "autoround_tpu",
        "fmt": format,
        "layers": {
            name: {
                "bits": ql.scheme.bits,
                "group_size": (list(ql.scheme.group_size)
                               if isinstance(ql.scheme.group_size, tuple)
                               else ql.scheme.group_size),
                "sym": ql.scheme.sym,
                "data_type": ql.scheme.data_type,
            }
            for name, ql in result.layers.items()
        },
        "model_config": {
            k: (v if not hasattr(v, "dtype") else str(v))
            for k, v in model_cfg.__dict__.items() if k != "dtype"
        },
    }

    if format == "fake":
        tensors = _flatten_params(result.params)
        save_file(tensors, os.path.join(output_dir, "model.safetensors"))
    elif format in ("autoround", "gptq", "awq", "llm_compressor"):
        from .formats import (
            awq_pack_layer, ct_float_layer, ct_pack_layer, gptq_pack_layer,
            llmcompressor_config)

        flat = _flatten_params(result.params)
        quant_names = set(result.layers)
        tensors = {k: v for k, v in flat.items() if k not in quant_names}
        for name, ql in result.layers.items():
            gs = ql.scheme.group_size
            if format == "llm_compressor" and ql.scheme.data_type.startswith(
                    "fp8") and not isinstance(gs, tuple):
                payload = ct_float_layer(ql)
                for pk, pv in payload.items():
                    tensors[f"{name}.{pk}"] = pv
                continue
            if ql.scheme.data_type != "int" or isinstance(gs, tuple):
                raise NotImplementedError(
                    f"{format} packed export currently covers int schemes; "
                    f"layer {name} is {ql.scheme.data_type}")
            if format == "gptq":
                payload = gptq_pack_layer(ql)
            elif format == "awq":
                payload = awq_pack_layer(ql)
            elif format == "llm_compressor":
                payload = ct_pack_layer(ql)
            else:
                qdq = np.asarray(ql.qdq, np.float32)
                scale = np.asarray(ql.scale, np.float32)
                zp = None if ql.zp is None else np.asarray(ql.zp)
                codes = codes_from_qdq(qdq, scale, zp, ql.scheme.bits,
                                       gs if gs > 0 else qdq.shape[1])
                payload = pack_quantized(codes, scale, zp, ql.scheme.bits)
            for pk, pv in payload.items():
                tensors[f"{name}.{pk}"] = pv
        save_file(tensors, os.path.join(output_dir, "model.safetensors"))
        if format == "llm_compressor":
            qcfg["compressed_tensors"] = llmcompressor_config(result)
    elif format == "mlx":
        from .mlx import save_quantized_as_mlx
        save_quantized_as_mlx(result, model_cfg, output_dir)
    elif format.startswith("gguf"):
        # "gguf:q4_k_m" etc. — requantizes the qdq weights with the ggml
        # packers (tuned weights already sit on the k-quant grid)
        from .gguf import GGMLType, save_gguf_checkpoint
        name = (format.split(":", 1)[1] if ":" in format else "q4_k_m").lower()
        base = {"q2_k": GGMLType.Q2_K, "q2_k_s": GGMLType.Q2_K,
                "q3_k": GGMLType.Q3_K, "q3_k_s": GGMLType.Q3_K,
                "q3_k_m": GGMLType.Q3_K,
                "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1,
                "q5_0": GGMLType.Q5_0, "q5_1": GGMLType.Q5_1,
                "q8_0": GGMLType.Q8_0,
                "q4_k": GGMLType.Q4_K, "q4_k_s": GGMLType.Q4_K,
                "q4_k_m": GGMLType.Q4_K,
                "q5_k": GGMLType.Q5_K, "q5_k_s": GGMLType.Q5_K,
                "q5_k_m": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[name]
        mixed = name.endswith("_m")
        save_gguf_checkpoint(result.params, model_cfg,
                             os.path.join(output_dir, "model.gguf"),
                             base_type=base, mixed=mixed,
                             layers=result.layers,
                             imatrix=getattr(result, "imatrices", None))
    else:
        raise ValueError(f"unknown export format {format!r}")

    with open(os.path.join(output_dir, "quantization_config.json"), "w") as f:
        json.dump(qcfg, f, indent=2)
    logger.info("saved %s-format checkpoint to %s", format, output_dir)
    return output_dir


def load_fake(path: str):
    """Load a fake-format checkpoint back into a params pytree (+ config)."""
    import jax.numpy as jnp
    from safetensors.numpy import load_file

    flat = load_file(os.path.join(path, "model.safetensors"))
    params = _unflatten_params({k: jnp.asarray(v) for k, v in flat.items()})
    with open(os.path.join(path, "quantization_config.json")) as f:
        qcfg = json.load(f)
    return params, qcfg
