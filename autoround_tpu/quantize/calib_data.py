"""Calibration dataset handling.

Role of the reference's ``auto_round/calib_dataset.py`` (named-dataset
registry, ``get_dataloader`` ``:1136``, pad/trailing-token ``-100``
masking in ``calibration/llm.py``): produce a fixed ``(nsamples, seqlen)``
int32 token batch plus a validity mask.

Zero-egress container note: HF hub datasets (pile-10k etc.) are registered
but only usable when a local cache exists; ``local:`` files and raw token
arrays always work, and ``synthetic`` provides deterministic random tokens
for smoke tests/benchmarks.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from ..utils.logger import logger, warning_once

__all__ = ["CALIB_DATASETS", "register_dataset", "get_calib_batch"]

CALIB_DATASETS: Dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(fn):
        CALIB_DATASETS[name] = fn
        return fn
    return deco


def apply_chat_template_to_samples(samples, tokenizer,
                                   system_prompt: Optional[str] = None
                                   ) -> List[str]:
    """Render raw calibration texts through the tokenizer's chat template
    (role of the reference's ``apply_chat_template_to_samples``,
    ``calib_dataset.py:86-114``): each sample becomes a user turn (plus an
    optional system turn) with the generation prompt appended, so
    instruct-tuned models are calibrated on the token distribution they
    actually see.  Samples that are already message lists pass through as
    the conversation.  Falls back to dropping the system turn when the
    template rejects it (e.g. gemma)."""
    rendered = []
    for text in samples:
        msgs = []
        if system_prompt:
            msgs.append({"role": "system", "content": system_prompt})
        if isinstance(text, list) and text and isinstance(text[0], dict):
            msgs += text
        else:
            msgs.append({"role": "user", "content": text})
        try:
            rendered.append(tokenizer.apply_chat_template(
                msgs, tokenize=False, add_generation_prompt=True))
        except Exception:
            warning_once(
                "chat template rejected the system role; retrying without")
            msgs = [m for m in msgs if m["role"] != "system"]
            rendered.append(tokenizer.apply_chat_template(
                msgs, tokenize=False, add_generation_prompt=True))
    return rendered


def _pack_texts(texts: List[str], tokenizer, nsamples: int, seqlen: int,
                seed: int, apply_chat_template: bool = False,
                system_prompt: Optional[str] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize, keep samples >= half seqlen, pad/truncate to seqlen.
    Pad and trailing positions are masked 0 (the reference marks them -100,
    ``calibration/llm.py:340-360``)."""
    rng = np.random.default_rng(seed)
    if apply_chat_template:
        if getattr(tokenizer, "chat_template", None) is None:
            warning_once("apply_chat_template requested but the tokenizer "
                         "has no chat template; using raw text")
        else:
            texts = apply_chat_template_to_samples(texts, tokenizer,
                                                   system_prompt)
    # chat-rendered prompts are naturally short — keep any non-trivial
    # sample there (the reference pads short chat samples too); raw text
    # keeps the >= seqlen/2 floor so corpus calib stays information-dense
    min_len = 4 if apply_chat_template else seqlen // 2
    ids_list = []
    for t in texts:
        toks = tokenizer(t)
        toks = toks["input_ids"] if isinstance(toks, dict) else toks
        if len(toks) >= min_len:
            ids_list.append(np.asarray(toks[: seqlen], np.int32))
        if len(ids_list) >= nsamples * 4:
            break
    if not ids_list:
        raise ValueError("no calibration sample reached seqlen/2 tokens")
    order = rng.permutation(len(ids_list))[:nsamples]
    batch = np.zeros((len(order), seqlen), np.int32)
    mask = np.zeros((len(order), seqlen), np.float32)
    for i, j in enumerate(order):
        t = ids_list[j]
        batch[i, : len(t)] = t
        mask[i, : len(t)] = 1.0
    return batch, mask


@register_dataset("synthetic")
def _synthetic(nsamples, seqlen, tokenizer=None, vocab_size=32000, seed=42,
               **_):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab_size, (nsamples, seqlen), dtype=np.int64)
    return ids.astype(np.int32), np.ones((nsamples, seqlen), np.float32)


@register_dataset("local")
def _local(nsamples, seqlen, tokenizer=None, path=None, seed=42,
           apply_chat_template=False, system_prompt=None, **_):
    """Local text/json/jsonl file: one sample per line, or a json list of
    strings / {"text": ...} / {"messages": [...]} records (reference
    'local' dataset)."""
    assert tokenizer is not None, "local dataset needs a tokenizer"
    texts = []

    def add(item):
        if isinstance(item, dict):
            texts.append(item.get("text") or item.get("messages"))
        else:
            texts.append(item)

    with open(path) as f:
        if path.endswith(".json"):
            for item in json.load(f):
                add(item)
        else:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                add(json.loads(line) if path.endswith(".jsonl") else line)
    return _pack_texts(texts, tokenizer, nsamples, seqlen, seed,
                       apply_chat_template, system_prompt)


def _load_hub_texts(hub_name: str, text_key: str, split: str,
                    limit: int) -> List[str]:
    import datasets
    ds = datasets.load_dataset(hub_name, split=split)
    out = []
    for row in ds:
        out.append(row[text_key])
        if len(out) >= limit:
            break
    return out


def _subprocess_entry(q, hub_name, text_key, split, limit):
    try:
        q.put(("ok", _load_hub_texts(hub_name, text_key, split, limit)))
    except Exception as e:  # pragma: no cover - depends on datasets state
        q.put(("err", f"{type(e).__name__}: {e}"))


def _hf_dataset(hub_name: str, text_key: str = "text", split: str = "train"):
    def load(nsamples, seqlen, tokenizer=None, seed=42,
             apply_chat_template=False, system_prompt=None, **_):
        assert tokenizer is not None, f"{hub_name} needs a tokenizer"
        limit = nsamples * 8
        from .. import envs
        try:
            if envs.AR_CALIB_SUBPROCESS:
                # isolate the datasets library in a spawn subprocess
                # (reference runs hub dataset loading isolated so a
                # segfault/hang in datasets cannot take the run down)
                import multiprocessing as mp
                ctx = mp.get_context("spawn")
                q = ctx.Queue()
                p = ctx.Process(target=_subprocess_entry,
                                args=(q, hub_name, text_key, split, limit))
                p.start()
                timeout = envs.AR_CALIB_SUBPROCESS_TIMEOUT
                try:
                    status, payload = q.get(timeout=timeout)
                finally:
                    p.join(timeout=5)
                    if p.is_alive():
                        p.terminate()
                if status != "ok":
                    raise RuntimeError(payload)
                texts = payload
            else:
                texts = _load_hub_texts(hub_name, text_key, split, limit)
        except Exception as e:  # zero-egress: no cache → actionable error
            raise RuntimeError(
                f"dataset {hub_name!r} unavailable (no network/cache): {e}"
            ) from e
        return _pack_texts(texts, tokenizer, nsamples,
                           seqlen, seed, apply_chat_template, system_prompt)
    return load


# reference dataset registry surface (calib_dataset.py:165-685) — hub id
# aliases registered alongside the short names, like the reference
for _names, _hub, _key in [
    (("pile-10k", "NeelNanda/pile-10k"), "NeelNanda/pile-10k", "text"),
    (("pile-val-backup", "swift/pile-val-backup"),
     "mit-han-lab/pile-val-backup", "text"),
    (("ultrachat_200k", "HuggingFaceH4/ultrachat_200k"),
     "HuggingFaceH4/ultrachat_200k", "prompt"),
    (("mbpp", "google-research-datasets/mbpp"), "mbpp", "text"),
    (("github-code-clean", "codeparrot/github-code-clean"),
     "codeparrot/github-code-clean", "code"),
    (("CCI3-HQ", "BAAI/CCI3-HQ"), "BAAI/CCI3-HQ", "text"),
    (("opencode-instruct", "nvidia/OpenCodeInstruct"),
     "nvidia/OpenCodeInstruct", "input"),
    (("openbmb/Ultra-FineWeb",), "openbmb/Ultra-FineWeb", "content"),
    (("new-title-chinese", "madao33/new-title-chinese"),
     "madao33/new-title-chinese", "content"),
]:
    for _name in _names:
        CALIB_DATASETS[_name] = _hf_dataset(_hub, _key)


def get_calib_batch(
    dataset: Union[str, np.ndarray, List[List[int]]],
    nsamples: int = 128,
    seqlen: int = 2048,
    tokenizer=None,
    vocab_size: int = 32000,
    seed: int = 42,
    apply_chat_template: bool = False,
    system_prompt: Optional[str] = None,
    **kw,
) -> Tuple[np.ndarray, np.ndarray]:
    """Resolve a dataset spec into (input_ids, mask).

    Accepts: a registered name ("pile-10k", "synthetic", "local:<path>"),
    a raw (nsamples, seqlen) token array, or a list of token lists.
    ``apply_chat_template`` renders text samples through the tokenizer's
    chat template first (reference ``calib_dataset.py:86-114``).
    """
    kw.update(apply_chat_template=apply_chat_template,
              system_prompt=system_prompt)
    if isinstance(dataset, np.ndarray):
        ids = dataset.astype(np.int32)
        return ids, np.ones(ids.shape, np.float32)
    if isinstance(dataset, (list, tuple)):
        batch = np.zeros((min(len(dataset), nsamples), seqlen), np.int32)
        mask = np.zeros_like(batch, dtype=np.float32)
        for i, toks in enumerate(dataset[:nsamples]):
            t = np.asarray(toks[:seqlen], np.int32)
            batch[i, : len(t)] = t
            mask[i, : len(t)] = 1.0
        return batch, mask
    if isinstance(dataset, str):
        if "," in dataset:
            # mixing syntax "name1:frac,name2" (reference calib_dataset.py)
            parts = []
            for spec in dataset.split(","):
                if ":" in spec and not spec.startswith("local:"):
                    name, frac = spec.rsplit(":", 1)
                    parts.append((name.strip(), float(frac)))
                else:
                    parts.append((spec.strip(), None))
            n_unspec = sum(1 for _, f in parts if f is None)
            rem = 1.0 - sum(f for _, f in parts if f is not None)
            counts = []
            for name, f in parts:
                share = f if f is not None else rem / max(n_unspec, 1)
                counts.append((name, max(1, int(round(nsamples * share)))))
            ids_list, mask_list = [], []
            for i, (name, n) in enumerate(counts):
                a, m = get_calib_batch(name, nsamples=n, seqlen=seqlen,
                                       tokenizer=tokenizer,
                                       vocab_size=vocab_size,
                                       seed=seed + i, **kw)
                ids_list.append(a)
                mask_list.append(m)
            ids = np.concatenate(ids_list)[:nsamples]
            mask = np.concatenate(mask_list)[:nsamples]
            order = np.random.default_rng(seed).permutation(len(ids))
            return ids[order], mask[order]
        if dataset.startswith("local:"):
            return CALIB_DATASETS["local"](
                nsamples, seqlen, tokenizer=tokenizer,
                path=dataset.split(":", 1)[1], seed=seed, **kw)
        if dataset in CALIB_DATASETS:
            return CALIB_DATASETS[dataset](
                nsamples, seqlen, tokenizer=tokenizer,
                vocab_size=vocab_size, seed=seed, **kw)
        raise ValueError(
            f"unknown dataset {dataset!r}; known: {sorted(CALIB_DATASETS)}")
    raise TypeError(f"cannot build calib batch from {type(dataset)}")


def get_mllm_calib_batch(model_cfg, nsamples: int = 16, seqlen: int = 64,
                         seed: int = 42):
    """Multimodal calibration batch (role of reference ``mllm/dataset.py``
    ``get_mllm_dataloader``): each sample is a prompt whose first
    ``num_patches`` positions are image tokens, plus pixel values.

    Synthetic in this zero-egress container; real image datasets slot in
    via ``utils.vlm_templates.build_calib_inputs`` (the template
    registry), producing the same input dict + mask.
    """
    rng = np.random.default_rng(seed)
    from ..models.glm4vmoe import Glm4vMoeConfig
    from ..models.qwen2vl import Qwen2VLConfig
    from ..models.qwen25omni import Qwen25OmniConfig
    from ..models.qwen3omni import Qwen3OmniConfig
    from ..models.qwen3vlmoe import Qwen3VLMoeConfig
    if isinstance(model_cfg, (Qwen3OmniConfig, Qwen25OmniConfig)):
        # omni: one image + one audio clip per row (uniform layout)
        m = model_cfg.spatial_merge_size
        gh = gw = 2 * m
        n_img = gh * gw // (m * m)
        T = 2 * model_cfg.a_chunk
        n_aud = model_cfg.a_tokens_for(T)
        assert seqlen > n_img + n_aud + 3
        ids = rng.integers(10, model_cfg.vocab_size,
                           (nsamples, seqlen)).astype(np.int32)
        ids[:, 1:1 + n_img] = model_cfg.image_token_id
        ids[:, 2 + n_img:2 + n_img + n_aud] = model_cfg.audio_token_id
        pixels = rng.standard_normal(
            (nsamples * gh * gw, model_cfg.patch_dim)).astype(np.float32)
        mel = rng.standard_normal(
            (nsamples, T, model_cfg.n_mels)).astype(np.float32)
        mask = np.ones((nsamples, seqlen), np.float32)
        return {"input_ids": ids, "pixel_values": pixels,
                "input_features": mel,
                "grid_thw": [(1, gh, gw)] * nsamples}, mask
    if isinstance(model_cfg, (Qwen2VLConfig, Qwen3VLMoeConfig,
                              Glm4vMoeConfig)):
        # one image per row, uniform grid (shared m-rope layout)
        m = model_cfg.spatial_merge_size
        gh = gw = 2 * m
        n_patch = gh * gw
        n_img = n_patch // (m * m)
        assert seqlen > n_img + 2
        ids = rng.integers(9, model_cfg.vocab_size,
                           (nsamples, seqlen)).astype(np.int32)
        ids[:, 1:1 + n_img] = model_cfg.image_token_id
        pixels = rng.standard_normal(
            (nsamples * n_patch, model_cfg.patch_dim)).astype(np.float32)
        mask = np.ones((nsamples, seqlen), np.float32)
        return {"input_ids": ids, "pixel_values": pixels,
                "grid_thw": [(1, gh, gw)] * nsamples}, mask
    from ..models.mistral3 import Mistral3Config
    if isinstance(model_cfg, Mistral3Config):
        # pixtral: row-major patch stream + (h, w) grid metadata; one
        # soft token per m x m merged block
        m = model_cfg.spatial_merge_size
        gh = gw = 2 * m
        n_img = gh * gw // (m * m)
        assert seqlen > n_img + 2
        ids = rng.integers(12, model_cfg.vocab_size,
                           (nsamples, seqlen)).astype(np.int32)
        ids[:, 1:1 + n_img] = model_cfg.image_token_id
        pixels = rng.standard_normal(
            (nsamples * gh * gw, model_cfg.patch_dim)).astype(np.float32)
        mask = np.ones((nsamples, seqlen), np.float32)
        return {"input_ids": ids, "pixel_values": pixels,
                "grid_hw": [(gh, gw)] * nsamples}, mask
    from ..models.mllama import MllamaConfig
    if isinstance(model_cfg, MllamaConfig):
        # cross-attention VLM: the text carries a SINGLE image marker;
        # vision states ride the augmented cache, not the embeddings
        ids = rng.integers(2, model_cfg.vocab_size,
                           (nsamples, seqlen)).astype(np.int32)
        ids[:, 0] = model_cfg.image_token_id
        pixels = rng.standard_normal(
            (nsamples, model_cfg.image_size, model_cfg.image_size, 3)
        ).astype(np.float32)
        # mask covers the AUGMENTED cache (text + vision tail): vision
        # positions pass through every block unchanged, so their loss
        # terms are zero — keeping them in the mask is harmless and
        # keeps the mask shape aligned with the block cache
        mask = np.ones((nsamples, seqlen + model_cfg.vision_tokens),
                       np.float32)
        return {"input_ids": ids, "pixel_values": pixels}, mask
    from ..models.deepseek_vl import DeepseekVLConfig
    from ..models.gemma3vl import Gemma3VLConfig
    # gemma3 pools the patch grid to mm_tokens_per_image soft tokens,
    # deepseek-vl2 pixel-shuffles to num_image_tokens; other families
    # use one token per vision patch
    P = (model_cfg.mm_tokens_per_image
         if isinstance(model_cfg, Gemma3VLConfig)
         else model_cfg.num_image_tokens
         if isinstance(model_cfg, DeepseekVLConfig)
         else model_cfg.num_patches)
    assert seqlen > P, f"seqlen {seqlen} must exceed image tokens {P}"
    ids = rng.integers(2, model_cfg.vocab_size,
                       (nsamples, seqlen)).astype(np.int32)
    ids[:, :P] = model_cfg.image_token_id
    pixels = rng.standard_normal(
        (nsamples, model_cfg.image_size, model_cfg.image_size, 3)
    ).astype(np.float32)
    mask = np.ones((nsamples, seqlen), np.float32)
    return {"input_ids": ids, "pixel_values": pixels}, mask


def get_diffusion_calib_batch(model_cfg, nsamples: int = 16, seed: int = 42):
    """Diffusion calibration batch (role of reference
    ``diffusion/dataset.py``): latents + uniformly sampled denoise
    timesteps + conditioning — the inputs one denoise step sees.
    MMDiT configs get text-encoder states + pooled conditioning; DiT
    gets class labels.  Real denoise-LOOP capture (every step of a real
    sampler) rides ``models.mmdit.euler_sample(capture=...)`` — see
    ``scripts/e2e_mmdit.py``."""
    rng = np.random.default_rng(seed)
    latents = rng.standard_normal(
        (nsamples, model_cfg.image_size, model_cfg.image_size,
         model_cfg.in_channels)).astype(np.float32)
    timesteps = rng.integers(0, 1000, (nsamples,)).astype(np.int32)
    from ..models.mmdit import MMDiTConfig
    if isinstance(model_cfg, MMDiTConfig):
        enc = rng.standard_normal(
            (nsamples, model_cfg.text_len, model_cfg.text_dim)
        ).astype(np.float32)
        pooled = rng.standard_normal(
            (nsamples, model_cfg.pooled_dim)).astype(np.float32)
        return {"pixel_values": latents, "timesteps": timesteps,
                "encoder_states": enc, "pooled": pooled}
    labels = rng.integers(0, model_cfg.num_classes,
                          (nsamples,)).astype(np.int32)
    return {"pixel_values": latents, "timesteps": timesteps,
            "labels": labels}
