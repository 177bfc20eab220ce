"""Model-free streaming compressor.

Role of the reference's ``ModelFreeCompressor``
(``auto_round/compressors/model_free.py``: docstring ``:15-88``,
``_process_shard`` ``:914``, process-pool shard parallelism ``:2218`` via
``AR_MODEL_FREE_SHARD_PARALLELISM``): quantize a checkpoint **without
instantiating the model** — stream safetensors shards, RTN-quantize every
eligible 2-D weight tensor-by-tensor, and write output shards + index +
quantization_config.  Works on any architecture since no forward pass is
needed.

Shards are processed in parallel worker processes (spawn context; each
worker pins JAX to CPU before import so the TPU tunnel is never touched).
"""

from __future__ import annotations

import json
import os
import re
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..schemes import QuantizationScheme, parse_scheme
from ..utils.logger import logger

__all__ = ["model_free_quantize"]

# default eligibility: 2-D weights that look like projection/linear kernels,
# skipping norms/embeddings (reference regex scheme matcher)
_DEFAULT_INCLUDE = r".*(proj|fc\d*|w\d|dense|gate|up|down|qkv|out|o)\.weight$"
_DEFAULT_EXCLUDE = r".*(embed|norm|ln|layernorm|lm_head|rotary).*"


def _worker_init():
    os.environ["JAX_PLATFORMS"] = "cpu"


def _quantize_tensor(name: str, w: np.ndarray, scheme_dict: dict,
                     pack: bool) -> Dict[str, np.ndarray]:
    """RTN one tensor (runs in a CPU worker)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..algorithms.rtn import rtn_quantize_layer
    from ..export import codes_from_qdq
    from ..export.packing import pack_quantized

    scheme = QuantizationScheme(**scheme_dict)
    r = rtn_quantize_layer(jnp.asarray(w, jnp.float32), scheme)
    if not pack or scheme.data_type != "int":
        return {f"{name}": np.asarray(r.qdq, np.float32).astype(w.dtype)}
    g = scheme.group_size if scheme.group_size > 0 else w.shape[1]
    codes = codes_from_qdq(np.asarray(r.qdq, np.float32),
                           np.asarray(r.scale, np.float32),
                           None if r.zp is None else np.asarray(r.zp),
                           scheme.bits, g)
    payload = pack_quantized(codes, np.asarray(r.scale, np.float32),
                             None if r.zp is None else np.asarray(r.zp),
                             scheme.bits)
    return {f"{name}.{k}": v for k, v in payload.items()}


def _process_shard(args) -> Tuple[str, Dict[str, list], List[str]]:
    """Worker: quantize all eligible tensors of one shard, write output
    shard, return (outfile, tensor->outfile map entries, quantized names)."""
    (shard_path, out_dir, scheme_dict, include, exclude, pack) = args
    _worker_init()
    from safetensors import safe_open
    from safetensors.numpy import save_file

    inc = re.compile(include)
    exc = re.compile(exclude)
    out: Dict[str, np.ndarray] = {}
    quantized: List[str] = []
    with safe_open(shard_path, framework="numpy") as f:
        for key in f.keys():
            t = f.get_tensor(key)
            if (t.ndim == 2 and inc.fullmatch(key) and not exc.fullmatch(key)
                    and t.shape[0] >= 32 and t.shape[1] >= 32):
                base = key[: -len(".weight")] if key.endswith(".weight") else key
                out.update(_quantize_tensor(base, t, scheme_dict, pack))
                quantized.append(base)
            else:
                out[key] = t
    fname = os.path.basename(shard_path)
    save_file(out, os.path.join(out_dir, fname))
    return fname, {k: fname for k in out}, quantized


def model_free_quantize(
    model_path: str,
    output_dir: str,
    scheme: Union[str, QuantizationScheme] = "W4A16",
    include: str = _DEFAULT_INCLUDE,
    exclude: str = _DEFAULT_EXCLUDE,
    pack: bool = True,
    num_workers: Optional[int] = None,
) -> str:
    """Stream-quantize a safetensors checkpoint directory.

    num_workers: None → env AR_MODEL_FREE_SHARD_PARALLELISM (default 1).
    """
    scheme = parse_scheme(scheme)
    scheme_dict = {k: getattr(scheme, k) for k in (
        "bits", "group_size", "sym", "data_type", "super_bits",
        "super_group_size")}
    os.makedirs(output_dir, exist_ok=True)

    index_path = os.path.join(model_path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            idx = json.load(f)
        shards = sorted(set(idx["weight_map"].values()))
    else:
        shards = ["model.safetensors"]

    if num_workers is None:
        num_workers = int(os.environ.get(
            "AR_MODEL_FREE_SHARD_PARALLELISM", "1"))
    num_workers = max(1, min(num_workers, len(shards)))

    args = [(os.path.join(model_path, s), output_dir, scheme_dict,
             include, exclude, pack) for s in shards]

    weight_map: Dict[str, str] = {}
    all_quantized: List[str] = []
    if num_workers == 1:
        results = [_process_shard(a) for a in args]
    else:
        import multiprocessing as mp
        try:
            ctx = mp.get_context("spawn")
            with ProcessPoolExecutor(max_workers=num_workers, mp_context=ctx,
                                     initializer=_worker_init) as pool:
                results = list(pool.map(_process_shard, args))
        except Exception as e:
            # spawn workers need an importable __main__ (REPL/stdin scripts
            # don't have one) — degrade to serial rather than fail
            logger.warning(
                "model-free shard pool failed (%s); falling back to serial",
                type(e).__name__)
            results = [_process_shard(a) for a in args]
    for fname, wmap, quantized in results:
        weight_map.update(wmap)
        all_quantized.extend(quantized)

    with open(os.path.join(output_dir, "model.safetensors.index.json"),
              "w") as f:
        json.dump({"weight_map": weight_map}, f, indent=2)
    qcfg = {
        "quant_method": "auto-round",
        "provider": "autoround_tpu.model_free",
        "packed": pack,
        "scheme": scheme_dict,
        "quantized_layers": sorted(all_quantized),
    }
    with open(os.path.join(output_dir, "quantization_config.json"), "w") as f:
        json.dump(qcfg, f, indent=2)
    # copy config.json through if present
    src_cfg = os.path.join(model_path, "config.json")
    if os.path.exists(src_cfg):
        with open(src_cfg) as f:
            cfg = json.load(f)
        cfg["quantization_config"] = qcfg
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2)
    logger.info("model-free: quantized %d tensors across %d shards -> %s",
                len(all_quantized), len(shards), output_dir)
    return output_dir
