"""CLI (role of reference ``auto_round/cli/`` + ``__main__.py``).

Recipes match the reference's kwarg bundles
(``docs/step_by_step.md:310-318``): default 200 iters / 128 samples /
seqlen 2048 / bs 8; best 1000/512; light 50/128 lr 5e-3; rtn & opt-rtn
iters 0.

Usage::

    python -m autoround_tpu --model <hf_ckpt_dir> --scheme W4A16 \
        --recipe default --dataset synthetic --output out/ --format fake
"""

from __future__ import annotations

import argparse
import json
import sys

RECIPES = {
    "default": dict(iters=200, nsamples=128, seqlen=2048, batch_size=8),
    "best": dict(iters=1000, nsamples=512, seqlen=2048, batch_size=8),
    "light": dict(iters=50, nsamples=128, seqlen=2048, batch_size=8, lr=5e-3),
    "rtn": dict(iters=0, nsamples=1, seqlen=32, batch_size=1),
    "opt-rtn": dict(iters=0, nsamples=64, seqlen=2048, batch_size=8,
                    imatrix=True),
}


def build_parser() -> argparse.ArgumentParser:
    """Flag surface mirrors the reference parser's groups
    (``auto_round/cli/parser.py``: scheme / runtime / tuning / mllm /
    compat) with TPU-native semantics for the device-placement flags."""
    p = argparse.ArgumentParser(
        prog="autoround_tpu",
        description="TPU-native AutoRound: post-training quantization in JAX")
    p.add_argument("--model", "--model-name-or-path", dest="model",
                   required=True,
                   help="HF checkpoint dir or a model-zoo preset name")
    p.add_argument("--recipe", default="default", choices=sorted(RECIPES))
    p.add_argument("--iters", "--iter", dest="iters", type=int, default=None)
    p.add_argument("--nsamples", "--nsample", dest="nsamples", type=int,
                   default=None)
    p.add_argument("--seqlen", "--seq-len", dest="seqlen", type=int,
                   default=None)
    p.add_argument("--batch-size", "--train-bs", "--bs", dest="batch_size",
                   type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--minmax-lr", type=float, default=None)
    p.add_argument("--dataset", default="synthetic",
                   help="dataset name, local:<path>, or .npy token file")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer dir (defaults to --model)")
    p.add_argument("--apply-chat-template", action="store_true",
                   help="render calib text through the tokenizer's chat "
                        "template (instruct models)")
    p.add_argument("--system-prompt", default=None,
                   help="optional system turn for --apply-chat-template")
    p.add_argument("--output", "--output-dir", dest="output",
                   default="quantized/")
    p.add_argument("--format", "--formats", dest="format", default="fake",
                   help="fake | autoround | gptq | awq | llm_compressor | "
                        "gguf:q4_k_m (etc.); comma-separated for several")
    p.add_argument("--seed", type=int, default=42)

    sch = p.add_argument_group(
        "scheme overrides (win over --scheme preset fields)")
    sch.add_argument("--scheme", default="W4A16")
    sch.add_argument("--bits", type=int, default=None,
                     help="weight bit width")
    sch.add_argument("--group-size", type=int, default=None)
    sch.add_argument("--asym", action="store_true", default=None,
                     help="asymmetric weight quantization")
    sch.add_argument("--data-type", "--dtype", dest="data_type",
                     default=None, help="weight dtype: int | mx_fp | nv_fp "
                                        "| fp8 | int_dq ...")
    sch.add_argument("--act-bits", type=int, default=None)
    sch.add_argument("--act-group-size", type=int, default=None)
    sch.add_argument("--act-data-type", "--act-dtype", dest="act_data_type",
                     default=None)
    sch.add_argument("--act-asym", action="store_true", default=None)
    sch.add_argument("--disable-act-dynamic", action="store_true",
                     help="static (calibrated) activation scales instead "
                          "of dynamic per-token")
    sch.add_argument("--super-bits", type=int, default=None,
                     help="GGUF double-quant metadata bits")
    sch.add_argument("--super-group-size", type=int, default=None)
    sch.add_argument("--scale-dtype", default=None,
                     help="storage dtype for scales (fp16/bf16/fp32)")

    rt = p.add_argument_group("runtime")
    rt.add_argument("--device", choices=("tpu", "cpu"), default=None,
                    help="computation platform (default: container "
                         "setting; cpu uses the 8-device virtual mesh)")
    rt.add_argument("--device-map", default=None,
                    help="TPU reinterpretation of the reference's "
                         "device_map: 'offload' keeps FP weights in host "
                         "RAM and streams one block at a time to HBM "
                         "(8B-on-16GB regime); 'none' keeps all on device")
    rt.add_argument("--low-gpu-mem-usage", "--remat", dest="remat",
                    action="store_true",
                    help="rematerialize the tuning forward (fits 8B-shape "
                         "blocks at seqlen 2048 in 16 GB HBM)")
    rt.add_argument("--model-dtype", default=None,
                    choices=("bf16", "bfloat16", "f32", "float32"),
                    help="cast loaded FP params before quantization")
    rt.add_argument("--cache-batch", type=int, default=None,
                    help="batch size for the cache-advance forwards")
    rt.add_argument("--resume-dir", default=None,
                    help="crash-resume directory (blocks re-start after "
                         "the last completed one)")
    rt.add_argument("--immediate-save-dir", default=None,
                    help="stream packed blocks to sharded safetensors as "
                         "they finish (peak RAM never holds the model)")
    rt.add_argument("--shard-size-gb", type=float, default=4.0)
    rt.add_argument("--not-use-best-mse", action="store_true",
                    help="keep the LAST iterate instead of the best-loss "
                         "snapshot")

    tune = p.add_argument_group("tuning")
    tune.add_argument("--quant-lm-head", action="store_true")
    tune.add_argument("--ignore-layers", nargs="*", default=None)
    tune.add_argument("--fp-layers", default=None,
                      help="comma-separated layer name fragments kept in "
                           "full precision (reference --fp_layers)")
    tune.add_argument("--to-quant-block-names", default=None,
                      help="comma-separated block indices (or ranges a-b) "
                           "to quantize; all other blocks stay FP")
    tune.add_argument("--layer-config", default=None,
                      help="JSON file or inline JSON: per-layer-pattern "
                           "scheme overrides")
    tune.add_argument("--avg-bits", "--target-bits", dest="avg_bits",
                      type=float, default=None,
                      help="enable AutoScheme mixed-precision search")
    tune.add_argument("--scheme-options", "--options", dest="scheme_options",
                      nargs="*", default=None,
                      help="candidate schemes for AutoScheme")
    tune.add_argument("--nblocks", type=int, default=1,
                      help="tune N consecutive blocks jointly")
    tune.add_argument("--gradient-accumulate-steps", type=int, default=None)
    tune.add_argument("--optimizer", default=None,
                      choices=("signsgd", "adam"))
    tune.add_argument("--dynamic-max-gap", type=int, default=None,
                      help="early-stop tuning when best loss stalls this "
                           "many iters (-1 = off)")
    tune.add_argument("--disable-quanted-input", action="store_true",
                      help="tune against FP block inputs instead of the "
                           "quantized chain")
    tune.add_argument("--disable-minmax-tuning", action="store_true")
    tune.add_argument("--enable-alg-ext", action="store_true",
                      help="sign_roundv2 extensions (widened clip, GGUF "
                           "grid search)")
    tune.add_argument("--enable-awq", action="store_true",
                      help="AWQ smoothing + clip search before tuning")
    tune.add_argument("--enable-norm-bias-tuning", action="store_true")
    tune.add_argument("--enable-lfq", action="store_true",
                      help="last-block LM cross-entropy loss")
    tune.add_argument("--quant-attention", action="store_true",
                      help="collect static q/k/v FP8 attention scales")
    tune.add_argument("--enable-rotation", default=None,
                      help="pre-quantization rotations: r1 | r4 | spin | "
                           "r2 (comma-combinable, e.g. 'spin,r2,r4')")
    tune.add_argument("--model-free", action="store_true",
                      help="streaming shard RTN without model "
                           "instantiation")

    mllm = p.add_argument_group("multimodal")
    mllm.add_argument("--mllm", action="store_true",
                      help="multimodal calibration: prompts carry image "
                           "tokens + pixel tensors through the family's "
                           "VLM template (also: `autoround_tpu mllm ...`)")
    mllm.add_argument("--template", default=None,
                      help="override the VLM template family (llava | "
                           "qwen2_vl | gemma3 | mllama | deepseek_vl_v2)")
    mllm.add_argument("--quant-nontext-module", action="store_true",
                      help="also quantize the vision tower / projector "
                           "linears (RTN with the same scheme)")
    mllm.add_argument("--extra-data-dir", default=None,
                      help="directory of local images for multimodal "
                           "calibration (synthetic pixels when absent)")

    ev = p.add_argument_group("evaluation")
    ev.add_argument("--eval-ppl", action="store_true",
                    help="report perplexity delta FP vs quantized on the "
                         "calibration batch")
    ev.add_argument("--eval-greedy-acc", action="store_true",
                    help="report per-position greedy next-token accuracy "
                         "FP vs quantized on the calibration batch")
    return p


def _parse_block_names(spec: str, num_layers: int):
    """'0,2,5-8' → set of block indices to QUANTIZE."""
    keep = set()
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            a, b = part.split("-", 1)
            keep.update(range(int(a), int(b) + 1))
        else:
            keep.add(int(part))
    return keep


def _scheme_overrides(args) -> dict:
    ov = {}
    for flag, field in (("bits", "bits"), ("group_size", "group_size"),
                        ("data_type", "data_type"),
                        ("act_bits", "act_bits"),
                        ("act_group_size", "act_group_size"),
                        ("act_data_type", "act_data_type"),
                        ("super_bits", "super_bits"),
                        ("super_group_size", "super_group_size"),
                        ("scale_dtype", "scale_dtype")):
        v = getattr(args, flag)
        if v is not None:
            ov[field] = v
    if args.asym:
        ov["sym"] = False
    if args.act_asym:
        ov["act_sym"] = False
    if args.disable_act_dynamic:
        ov["act_dynamic"] = False
    return ov


def _quant_nontext_rtn(result, scheme):
    """RTN-quantize vision tower / projector 2-D linears in place
    (reference --quant_nontext_module; non-text modules are far less
    quantization-sensitive, so RTN with the text scheme suffices)."""
    from .algorithms.rtn import rtn_quantize_layer
    from .schemes import parse_scheme
    from .utils.pytree import set_by_path
    s = parse_scheme(scheme) if not hasattr(scheme, "bits") else scheme
    n = 0
    # "visual" covers the Qwen-VL/omni/GLM4V/Mistral3 families;
    # "audio_tower" the omni audio thinkers.
    for tower in ("vision_tower", "mm_projector", "multi_modal_projector",
                  "visual", "audio_tower"):
        sub = result.params.get(tower)
        if sub is None:
            continue
        import jax.tree_util as jtu
        leaves_paths = jtu.tree_flatten_with_path(sub)[0]
        for path, leaf in leaves_paths:
            if getattr(leaf, "ndim", 0) != 2 or min(leaf.shape) < 8:
                continue
            name = tower + "." + ".".join(
                str(getattr(k, "key", getattr(k, "idx", k)))
                for k in path)
            r = rtn_quantize_layer(leaf, s)
            result.params[tower] = set_by_path(
                result.params[tower],
                name[len(tower) + 1:], r.qdq.astype(leaf.dtype))
            n += 1
    return n


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    if argv and argv[0] == "eval":
        # eval subcommand (role of the reference's auto-round-eval CLI)
        from .eval.eval_cli import main as eval_main
        return eval_main(argv[1:])
    if argv and argv[0] == "mllm":
        # role of the reference's auto-round-mllm console script
        # (setup.cfg:7-19): same parser, multimodal calibration forced on
        argv = argv[1:] + ["--mllm"]
    args = build_parser().parse_args(argv)

    import os
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from . import AutoRound
    from .quantize.calib_data import get_calib_batch

    if args.model_free:
        from .quantize.model_free import model_free_quantize
        out = model_free_quantize(args.model, args.output,
                                  scheme=args.scheme)
        print(json.dumps({"output": out, "mode": "model-free"}))
        return 0

    recipe = dict(RECIPES[args.recipe])
    if recipe.pop("imatrix", False):
        recipe["use_imatrix"] = True
    for k in ("iters", "nsamples", "seqlen", "batch_size", "lr"):
        v = getattr(args, k)
        if v is not None:
            recipe[k] = v
    nsamples = recipe.pop("nsamples")
    seqlen = recipe.pop("seqlen")

    from .models.registry import ALL_PRESETS, get_model_fns
    if args.model in ALL_PRESETS:
        cfg = ALL_PRESETS[args.model]
        params = get_model_fns(cfg).init_params(
            cfg, jax.random.PRNGKey(args.seed))
        tokenizer = None
    else:
        from .utils.hf_loader import load_hf_checkpoint
        params, cfg = load_hf_checkpoint(args.model)
        tokenizer = None
        tok_path = args.tokenizer or args.model
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(tok_path)
        except Exception:
            print(f"warning: no tokenizer at {tok_path}; "
                  "text datasets unavailable", file=sys.stderr)

    if args.model_dtype is not None:
        import jax.numpy as jnp
        tgt = (jnp.bfloat16 if args.model_dtype in ("bf16", "bfloat16")
               else jnp.float32)
        params = jax.tree.map(
            lambda t: t.astype(tgt) if getattr(t, "dtype", None)
            in (jnp.float32, jnp.bfloat16, jnp.float16) else t, params)
        import dataclasses as _dc
        if hasattr(cfg, "dtype"):
            cfg = _dc.replace(cfg, dtype=tgt)

    # ---- calibration batch -------------------------------------------
    if args.mllm:
        from .quantize.calib_data import get_mllm_calib_batch
        if args.extra_data_dir:
            # local images through the family template pipeline
            from .utils.vlm_templates import get_vlm_template
            tpl = (get_vlm_template(args.template) if args.template
                   else get_vlm_template(cfg))
            from PIL import Image
            files = sorted(
                f for f in os.listdir(args.extra_data_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
            imgs = [Image.open(os.path.join(args.extra_data_dir, f))
                    for f in files[:nsamples]]
            pre = tpl.preprocess(imgs, cfg) if tpl.preprocess else {}
            inputs, mask = get_mllm_calib_batch(
                cfg, nsamples=len(imgs) or nsamples, seqlen=seqlen,
                seed=args.seed)
            if "pixel_values" in pre:
                inputs["pixel_values"] = pre["pixel_values"]
        else:
            inputs, mask = get_mllm_calib_batch(
                cfg, nsamples=nsamples, seqlen=seqlen, seed=args.seed)
        ids = inputs
    elif args.dataset.endswith(".npy"):
        ids = np.load(args.dataset)[:nsamples, :seqlen]
        mask = np.ones(ids.shape, np.float32)
    else:
        ids, mask = get_calib_batch(
            args.dataset, nsamples=nsamples, seqlen=seqlen,
            tokenizer=tokenizer, vocab_size=cfg.vocab_size, seed=args.seed,
            apply_chat_template=args.apply_chat_template,
            system_prompt=args.system_prompt)

    # ---- scheme ------------------------------------------------------
    overrides = _scheme_overrides(args)
    scheme = args.scheme
    if overrides:
        from .schemes import parse_scheme
        scheme = parse_scheme(args.scheme, **overrides)
    if args.avg_bits is not None:
        from .quantize.auto_scheme import AutoScheme
        scheme = AutoScheme(avg_bits=args.avg_bits,
                            options=tuple(args.scheme_options
                                          or ("W2A16", "W4A16", "W8A16")))

    # ---- layer selection ---------------------------------------------
    ignore = list(args.ignore_layers or [])
    if args.fp_layers:
        ignore += [f.strip() for f in args.fp_layers.split(",") if f.strip()]
    if args.to_quant_block_names:
        keep = _parse_block_names(args.to_quant_block_names, cfg.num_layers)
        ignore += [rf"blocks\.{i}\..*" for i in range(cfg.num_layers)
                   if i not in keep]
    layer_config = None
    if args.layer_config:
        if os.path.exists(args.layer_config):
            with open(args.layer_config) as f:
                layer_config = json.load(f)
        else:
            layer_config = json.loads(args.layer_config)

    # ---- orchestrator kwargs -----------------------------------------
    kw = dict(recipe)
    if args.device_map is not None:
        kw["offload_params"] = args.device_map.lower() in (
            "offload", "cpu", "auto")
    if args.remat:
        kw["use_remat"] = True
    for flag, field in (("cache_batch", "cache_batch"),
                        ("resume_dir", "resume_dir"),
                        ("immediate_save_dir", "immediate_save_dir"),
                        ("gradient_accumulate_steps",
                         "gradient_accumulate_steps"),
                        ("optimizer", "optimizer"),
                        ("dynamic_max_gap", "dynamic_max_gap")):
        v = getattr(args, flag)
        if v is not None:
            kw[field] = v
    if args.immediate_save_dir is not None:
        kw["shard_size_bytes"] = int(args.shard_size_gb * (1 << 30))
    if args.not_use_best_mse:
        kw["use_best_params"] = False
    for flag in ("enable_alg_ext", "enable_awq", "enable_norm_bias_tuning",
                 "enable_lfq", "quant_attention"):
        if getattr(args, flag):
            kw[flag] = True
    if args.disable_quanted_input:
        kw["enable_quanted_input"] = False
    if args.disable_minmax_tuning:
        kw["enable_minmax_tuning"] = False

    ar = AutoRound((params, cfg), scheme=scheme,
                   minmax_lr=args.minmax_lr, nblocks=args.nblocks,
                   quant_lm_head=args.quant_lm_head,
                   ignore_layers=ignore or None,
                   layer_config=layer_config,
                   enable_rotation=args.enable_rotation or False,
                   seed=args.seed, **kw)
    result = ar.quantize(ids, mask=mask)

    n_vis = 0
    if args.quant_nontext_module:
        n_vis = _quant_nontext_rtn(result, scheme)
        if n_vis == 0:
            from .utils.logger import logger
            logger.warning(
                "--quant-nontext-module matched no vision/audio tower "
                "params (checked vision_tower/mm_projector/"
                "multi_modal_projector/visual/audio_tower)")

    out = ar.save_quantized(args.output, format=args.format)

    report = {"output": out, "layers": len(result.layers)}
    if n_vis:
        report["nontext_layers_rtn"] = n_vis
    if (args.eval_ppl or args.eval_greedy_acc) and not args.mllm:
        from .eval import perplexity
        if args.eval_ppl:
            report["ppl_fp"] = perplexity(params, cfg, ids, mask)
            # ar.model_cfg carries rotation-induced config changes (R4)
            report["ppl_quant"] = perplexity(result.params, ar.model_cfg,
                                             ids, mask)
        if args.eval_greedy_acc:
            from .eval.lm_eval_adapter import greedy_token_accuracy
            report["greedy_acc_fp"] = round(
                greedy_token_accuracy(params, cfg, np.asarray(ids)), 4)
            report["greedy_acc_quant"] = round(
                greedy_token_accuracy(result.params, ar.model_cfg,
                                      np.asarray(ids)), 4)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
