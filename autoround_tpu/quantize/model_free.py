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


def _load_fp8_as_f32(shard_path: str, key: str) -> np.ndarray:
    """FP8-stored tensor → float32 numpy (numpy safetensors cannot decode
    float8; torch-cpu can)."""
    from safetensors import safe_open
    with safe_open(shard_path, framework="pt") as f:
        return f.get_tensor(key).float().numpy()


def _dequant_fp8_source(w: np.ndarray, scale: Optional[np.ndarray]
                        ) -> np.ndarray:
    """Apply a DeepSeek-style ``weight_scale_inv`` — per-tensor scalar or
    (O/128, I/128) 2-D block grid (reference ModelFreeCompressor FP8
    source handling)."""
    if scale is None:
        return w
    s = np.asarray(scale, np.float32)
    if s.ndim <= 1 and s.size == 1:
        return w * float(s.reshape(()))
    O, I = w.shape
    bo, bi = -(-O // s.shape[0]), -(-I // s.shape[1])
    s_full = np.repeat(np.repeat(s, bo, axis=0), bi, axis=1)[:O, :I]
    return w * s_full


def _process_shard(args) -> Tuple[str, Dict[str, list], List[str]]:
    """Worker: quantize all eligible tensors of one shard, write output
    shard, return (outfile, tensor->outfile map entries, quantized names).

    Handles two reference ModelFreeCompressor specials:
      * FP8-source checkpoints (float8 weights + ``weight_scale_inv``):
        dequant to f32 first, then quantize; the scale tensors are
        consumed, not copied through.
      * Fused-MoE 3-D expert stacks (E, O, I): split per expert and
        quantize each slice independently (reference
        ``fused_moe/replace_modules.py`` role).
    """
    (shard_path, out_dir, scheme_dict, include, exclude, pack) = args
    _worker_init()
    from safetensors import safe_open
    from safetensors.numpy import save_file

    inc = re.compile(include)
    exc = re.compile(exclude)
    out: Dict[str, np.ndarray] = {}
    quantized: List[str] = []
    with safe_open(shard_path, framework="numpy") as f:
        keys = set(f.keys())

        def scale_for(key):
            base = key[: -len(".weight")] if key.endswith(".weight") else key
            for suffix in (".weight_scale_inv", ".weight_scale"):
                sk = base + suffix
                if sk in keys:
                    return f.get_tensor(sk)
            return None

        consumed_scales = {
            k for k in keys
            if k.endswith((".weight_scale_inv", ".weight_scale"))
            and (k.rsplit(".", 1)[0] + ".weight" in keys
                 or k.rsplit(".", 1)[0] in keys)}
        for key in sorted(keys):
            if key in consumed_scales:
                continue
            try:
                t = f.get_tensor(key)
                fp8_src = False
            except Exception:
                t = _load_fp8_as_f32(shard_path, key)
                fp8_src = True
            eligible = (inc.fullmatch(key) and not exc.fullmatch(key)
                        and t.shape[-1] >= 32 and t.shape[-2] >= 32
                        if t.ndim >= 2 else False)
            if t.ndim == 2 and eligible:
                if fp8_src:
                    t = _dequant_fp8_source(t, scale_for(key))
                base = key[: -len(".weight")] if key.endswith(".weight") \
                    else key
                out.update(_quantize_tensor(base, t, scheme_dict, pack))
                quantized.append(base)
            elif t.ndim == 3 and eligible:
                # fused MoE stack: one 2-D quantization per expert slice
                base = key[: -len(".weight")] if key.endswith(".weight") \
                    else key
                s3 = scale_for(key) if fp8_src else None
                for e in range(t.shape[0]):
                    we = t[e]
                    if fp8_src:
                        se = s3[e] if (s3 is not None
                                       and np.ndim(s3) == 3) else s3
                        we = _dequant_fp8_source(we, se)
                    out.update(_quantize_tensor(f"{base}.{e}", we,
                                                scheme_dict, pack))
                    quantized.append(f"{base}.{e}")
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
