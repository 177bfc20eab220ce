"""Crash-resume for block-wise quantization.

Role of the reference's ``utils/resume.py`` (``ResumeState``: per-block
JSON manifest + persisted chained tensors, durable-write-before-mark
ordering at ``orchestrator.py:362-373``).  The module docstring of the
reference warns that the chained caches must be restored *verbatim* —
regenerating them cost a 20x loss regression — so both the FP and the
quantized input chains are persisted exactly.

Layout under ``resume_dir``::

    manifest.json                    {signature, done: [block indices]}
    block_<i>.safetensors            quantized layers of block i (qdq/scale/zp)
    chain_<i>.safetensors            x_fp / x_q caches AFTER block i

Writes go to a temp file + fsync + atomic rename; the manifest only lists
a block after its payload is durable.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .logger import logger

__all__ = ["ResumeState", "run_signature"]


def run_signature(model_cfg, layer_schemes, input_ids, cfg) -> str:
    """Stable hash over everything that must match for caches to be valid
    (reference: model/scheme/dataset/nsamples/seqlen/blocks)."""
    h = hashlib.sha256()
    h.update(repr(sorted((k, repr(v)) for k, v in
                         layer_schemes.items())).encode())
    h.update(repr(model_cfg).encode())
    h.update(np.ascontiguousarray(np.asarray(input_ids)).tobytes())
    for field in ("iters", "seed", "batch_size", "enable_quanted_input",
                  "enable_alg_ext"):
        h.update(f"{field}={getattr(cfg, field)}".encode())
    return h.hexdigest()[:32]


def _atomic_save(tensors: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    tmp = path + ".tmp"
    save_file(tensors, tmp)
    with open(tmp, "rb") as f:
        os.fsync(f.fileno())
    os.replace(tmp, path)


class ResumeState:
    def __init__(self, resume_dir: str, signature: str):
        self.dir = resume_dir
        self.signature = signature
        os.makedirs(resume_dir, exist_ok=True)
        self.manifest_path = os.path.join(resume_dir, "manifest.json")
        self.done: List[int] = []
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                m = json.load(f)
            if m.get("signature") == signature:
                self.done = sorted(m.get("done", []))
                logger.info("resume: found %d finished blocks in %s",
                            len(self.done), resume_dir)
            else:
                logger.warning(
                    "resume: signature mismatch in %s — starting fresh",
                    resume_dir)

    def next_block(self) -> int:
        """First block index that still needs work (done must be a prefix)."""
        n = 0
        for i in self.done:
            if i == n:
                n += 1
            else:
                break
        return n

    def mark_block_done(self, i: int, block_payload: Dict[str, np.ndarray],
                        x_fp: np.ndarray, x_q: Optional[np.ndarray]) -> None:
        _atomic_save({k: np.asarray(v) for k, v in block_payload.items()},
                     os.path.join(self.dir, f"block_{i}.safetensors"))
        chain = {"x_fp": np.asarray(x_fp)}
        if x_q is not None:
            chain["x_q"] = np.asarray(x_q)
        _atomic_save(chain, os.path.join(self.dir, f"chain_{i}.safetensors"))
        if i not in self.done:
            self.done.append(i)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"signature": self.signature,
                       "done": sorted(self.done)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.manifest_path)
        # older chains are superseded — drop them to bound disk usage
        prev = os.path.join(self.dir, f"chain_{i-1}.safetensors")
        if i > 0 and os.path.exists(prev):
            os.remove(prev)

    def load_block(self, i: int) -> Dict[str, np.ndarray]:
        from safetensors.numpy import load_file
        return load_file(os.path.join(self.dir, f"block_{i}.safetensors"))

    def load_chain(self, i: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        from safetensors.numpy import load_file
        t = load_file(os.path.join(self.dir, f"chain_{i}.safetensors"))
        return t["x_fp"], t.get("x_q")

    def clear(self) -> None:
        """Called after a successful export (reference defers manifest
        clearing until save succeeds, ``base.py:1856-1862``)."""
        for f in os.listdir(self.dir):
            if f.startswith(("block_", "chain_", "manifest")):
                os.remove(os.path.join(self.dir, f))
