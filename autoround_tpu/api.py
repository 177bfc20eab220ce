"""Public API: the ``AutoRound`` entry point.

Role of the reference dispatcher (``auto_round/autoround.py:705``
``AutoRound.__new__`` routing to compressor classes): one front door that
normalizes the scheme, resolves the per-layer plan, runs calibration-data
capture + block-chain tuning (or RTN when ``iters=0``), and hands the
result to the export writers.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .models import llama
from .quantize.layer_config import resolve_layer_schemes
from .quantize.orchestrator import (
    QuantizeConfig,
    QuantizeResult,
    quantize_model,
)
from .schemes import QuantizationScheme, parse_scheme
from .utils.logger import logger

__all__ = ["AutoRound", "AutoRoundLLM", "AutoRoundMLLM",
           "AutoRoundDiffusion", "AutoRoundAdam"]


class AutoRound:
    """TPU-native AutoRound quantizer for llama-family models.

    Example::

        ar = AutoRound((params, model_cfg), scheme="W4A16", iters=200)
        result = ar.quantize(input_ids)           # (nsamples, seqlen) tokens
        ar.save_quantized("out/", format="fake")
    """

    def __init__(
        self,
        model,
        scheme: Union[str, dict, QuantizationScheme] = "W4A16",
        tokenizer=None,
        dataset: Optional[str] = None,
        nsamples: int = 128,
        seqlen: int = 2048,
        apply_chat_template: bool = False,
        system_prompt: Optional[str] = None,
        iters: int = 200,
        lr: Optional[float] = None,
        minmax_lr: Optional[float] = None,
        batch_size: int = 8,
        seed: int = 42,
        layer_config: Optional[Dict[str, Any]] = None,
        ignore_layers: Optional[Iterable[str]] = None,
        quant_lm_head: bool = False,
        enable_quanted_input: bool = True,
        enable_minmax_tuning: bool = True,
        enable_alg_ext: bool = False,
        enable_awq: bool = False,
        enable_rotation: bool = False,
        use_imatrix: bool = False,
        optimizer: str = "signsgd",
        nblocks: int = 1,
        enable_lfq: bool = False,
        donate_params: bool = False,
        dynamic_max_gap: int = -1,
        gradient_accumulate_steps: int = 1,
        **kw,
    ):
        from . import envs as _envs
        if _envs.AR_COMPILE_CACHE_DIR:
            # opt-in persistent XLA compilation cache: repeat runs skip
            # the 95-445 s per-executable remote compiles (see envs.py)
            jax.config.update("jax_compilation_cache_dir",
                              _envs.AR_COMPILE_CACHE_DIR)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        from .models.registry import ALL_PRESETS, get_model_fns
        if isinstance(model, str):
            cfg = ALL_PRESETS[model]
            params = get_model_fns(cfg).init_params(cfg,
                                                    jax.random.PRNGKey(seed))
        else:
            params, cfg = model
        self._mfns = get_model_fns(cfg)
        if enable_rotation:
            # reference post_init phase 4.5 _apply_rotations.
            # True → R1; or a string combining modes: "r1,r4" (r4 =
            # QuaRot online block-Hadamard on the down_proj input)
            modes = (("r1",) if enable_rotation is True
                     else tuple(m.strip() for m in
                                str(enable_rotation).lower().split(",")))
            from .transforms.hadamard import (apply_r1_rotation,
                                              apply_r4_rotation)
            if "spin" in modes or "r2" in modes:
                # SpinQuant trained rotations (Cayley); "spin" trains R1
                # against the weight-space objective (the block-output
                # variant is train_r1_rotation(..., calib_x=...)), "r2"
                # trains per-layer value/output head rotations
                from .transforms.spinquant import (
                    apply_trained_r2, apply_trained_rotation,
                    train_r1_rotation, train_r2_rotations)
                sq_scheme = parse_scheme(scheme) if isinstance(
                    scheme, (str, QuantizationScheme)) else parse_scheme(
                        "W4A16")
                if "spin" in modes:
                    R = train_r1_rotation(params, cfg, sq_scheme, seed=seed)
                    params = apply_trained_rotation(params, cfg, R)
                if "r2" in modes:
                    R2s = train_r2_rotations(params, cfg, sq_scheme,
                                             seed=seed)
                    params = apply_trained_r2(params, cfg, R2s)
            if "r1" in modes:
                if "spin" in modes:
                    raise ValueError("rotation modes r1 and spin both "
                                     "rotate the residual stream; pick one")
                params = apply_r1_rotation(params, cfg, seed=seed)
            if "r4" in modes:
                params, cfg = apply_r4_rotation(params, cfg)
            unknown = set(modes) - {"r1", "r2", "r4", "spin"}
            if unknown:
                raise ValueError(f"unknown rotation modes {sorted(unknown)};"
                                 " supported: r1, r2, r4, spin")
        self.params = params
        self.model_cfg = cfg
        from .quantize.auto_scheme import AutoScheme as _AutoScheme
        if isinstance(scheme, _AutoScheme):
            # mixed-precision search resolved lazily at quantize() time
            # (needs calibration tokens for the gradient pass)
            self.scheme = scheme
            self.layer_schemes = None
            self._auto_layer_kwargs = dict(
                layer_config=layer_config, ignore_layers=ignore_layers,
                quant_lm_head=quant_lm_head)
        else:
            from .quantize.layer_config import handle_special_scheme
            lnames = self._mfns.block_linear_names(cfg)
            special = handle_special_scheme(scheme, lnames, quant_lm_head)
            pinned = ()
            if special is not None:
                # GGUF:Q2_K_MIXED / W4A16_MIXED recipes (reference
                # _handle_special_schemes, schemes.py:822) — recipe
                # overrides lose to explicit user layer_config
                scheme, overrides, quant_lm_head, _gguf_base = special
                pinned = tuple(overrides)
                merged = dict(overrides)
                merged.update(layer_config or {})
                layer_config = merged
            self.scheme = parse_scheme(scheme)
            self.layer_schemes = resolve_layer_schemes(
                cfg.num_layers, lnames,
                self.scheme, layer_config=layer_config,
                ignore_layers=ignore_layers, quant_lm_head=quant_lm_head)
            from .quantize.layer_config import prune_missing_layers
            self.layer_schemes = prune_missing_layers(
                self.layer_schemes, params)
            if isinstance(scheme, str) and scheme.upper().startswith("GGUF:"):
                # tune each layer on the byte grid the GGUF writer will
                # store (mixed-rule upgrades + 256-divisibility fallback)
                # so tuned scales pass through export verbatim
                from .quantize.layer_config import apply_gguf_cascade
                self.layer_schemes = apply_gguf_cascade(
                    self.layer_schemes, params, cfg.num_layers, scheme,
                    quant_lm_head=quant_lm_head, pinned=pinned,
                    model_cfg=cfg)
                if special is not None and "embed_tokens" in \
                        self.layer_schemes:
                    # Q2_K_MIXED pins the embedding at Q8_0 (reference
                    # assigns Embedding modules GGUF:Q8_0)
                    self.layer_schemes["embed_tokens"] = parse_scheme(
                        "GGUF:Q8_0")
        # extra kwargs naming QuantizeConfig fields pass through (e.g.
        # quant_attention, resume_dir, immediate_save_dir, cache_batch);
        # anything unrecognized is a loud warning, not a silent no-op
        cfg_fields = QuantizeConfig.__dataclass_fields__
        extra = {k: v for k, v in kw.items() if k in cfg_fields}
        for k in kw:
            if k not in cfg_fields:
                logger.warning("AutoRound: ignoring unknown kwarg %r", k)
        self.cfg = QuantizeConfig(
            iters=iters, lr=lr, minmax_lr=minmax_lr, batch_size=batch_size,
            seed=seed, enable_quanted_input=enable_quanted_input,
            enable_minmax_tuning=enable_minmax_tuning,
            enable_alg_ext=enable_alg_ext,
            enable_awq=enable_awq,
            use_imatrix=use_imatrix,
            optimizer=optimizer,
            nblocks=nblocks,
            enable_lfq=enable_lfq,
            donate_params=donate_params,
            dynamic_max_gap=dynamic_max_gap,
            gradient_accumulate_steps=gradient_accumulate_steps,
            **extra)
        # dataset spec resolved lazily at quantize() time (reference
        # passes dataset/tokenizer to the compressor and tokenizes during
        # calibration, calib_dataset.py:1136)
        self.tokenizer = tokenizer
        self._dataset_spec = dict(
            dataset=dataset, nsamples=nsamples, seqlen=seqlen,
            apply_chat_template=apply_chat_template,
            system_prompt=system_prompt)
        self.result: Optional[QuantizeResult] = None

    def quantize(self, input_ids=None, mask=None) -> QuantizeResult:
        if input_ids is None:
            spec = self._dataset_spec
            if spec["dataset"] is None:
                raise ValueError("quantize() needs input_ids, or construct "
                                 "AutoRound with dataset=...")
            from .quantize.calib_data import get_calib_batch
            input_ids, mask = get_calib_batch(
                spec["dataset"], nsamples=spec["nsamples"],
                seqlen=spec["seqlen"], tokenizer=self.tokenizer,
                vocab_size=self.model_cfg.vocab_size, seed=self.cfg.seed,
                apply_chat_template=spec["apply_chat_template"],
                system_prompt=spec["system_prompt"])
        if isinstance(input_ids, dict):
            input_ids = {k: jnp.asarray(v) for k, v in input_ids.items()}
            ids_for_log = input_ids.get(
                "input_ids", next(iter(input_ids.values())))
        else:
            input_ids = jnp.asarray(input_ids)
            ids_for_log = input_ids
        if self.layer_schemes is None:
            # AutoScheme path (reference post_init phase 4 _gen_auto_scheme,
            # compressors/base.py:700)
            from .quantize.auto_scheme import gen_auto_scheme
            if isinstance(input_ids, dict):
                raise NotImplementedError(
                    "AutoScheme search over multimodal batches is not "
                    "supported yet; pass text-only calibration tokens")
            plan = gen_auto_scheme(self.params, self.model_cfg, self.scheme,
                                   input_ids)
            kw = self._auto_layer_kwargs
            if kw["ignore_layers"]:
                import re
                for pattern in kw["ignore_layers"]:
                    plan = {n: s for n, s in plan.items()
                            if not (n == pattern
                                    or n.split(".")[-1] == pattern
                                    or re.fullmatch(pattern, n))}
            self.layer_schemes = plan
        logger.info(
            "quantizing %d layers, scheme=%s, iters=%d, nsamples=%d seqlen=%d",
            len(self.layer_schemes),
            self.scheme.key() if hasattr(self.scheme, "key") else "auto",
            self.cfg.iters, ids_for_log.shape[0], ids_for_log.shape[1])
        self.result = quantize_model(
            self.params, self.model_cfg, self.layer_schemes, input_ids,
            self.cfg, mask=mask)
        return self.result

    def save_quantized(self, output_dir: str, format: str = "fake") -> str:
        """format may be a comma-separated list (reference resolve_formats):
        each lands in its own subdirectory when more than one is given."""
        if self.result is None:
            raise RuntimeError("call quantize() first")
        from .export import save_quantized
        fmts = [f.strip() for f in format.split(",") if f.strip()]

        def _with_tokenizer(path):
            # the reference saves the tokenizer into every output dir so
            # the checkpoint is directly loadable/evaluable
            if self.tokenizer is not None and hasattr(self.tokenizer,
                                                      "save_pretrained"):
                try:
                    self.tokenizer.save_pretrained(path)
                except Exception as e:
                    logger.warning("tokenizer save failed: %s", e)
            return path

        if len(fmts) == 1:
            return _with_tokenizer(save_quantized(
                self.result, self.model_cfg, output_dir, fmts[0]))
        import os
        for f in fmts:
            sub = os.path.join(output_dir, f.replace(":", "_"))
            _with_tokenizer(save_quantized(self.result, self.model_cfg,
                                           sub, f))
        return output_dir

    def quantize_and_save(self, input_ids, output_dir: str,
                          format: str = "fake", mask=None) -> str:
        self.quantize(input_ids, mask=mask)
        return self.save_quantized(output_dir, format=format)


# Legacy entry aliases (reference ``autoround.py:776-798``): the dispatcher
# handles routing; these exist so reference-style call sites keep working.
class AutoRoundLLM(AutoRound):
    pass


class AutoRoundMLLM(AutoRound):
    pass


class AutoRoundDiffusion(AutoRound):
    pass


class AutoRoundAdam(AutoRound):
    def __init__(self, *args, **kw):
        kw.setdefault("optimizer", "adam")
        super().__init__(*args, **kw)
