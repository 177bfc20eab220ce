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
    p = argparse.ArgumentParser(
        prog="autoround_tpu",
        description="TPU-native AutoRound: post-training quantization in JAX")
    p.add_argument("--model", required=True,
                   help="HF checkpoint dir or a model-zoo preset name")
    p.add_argument("--scheme", default="W4A16")
    p.add_argument("--recipe", default="default", choices=sorted(RECIPES))
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--nsamples", type=int, default=None)
    p.add_argument("--seqlen", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
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
    p.add_argument("--output", default="quantized/")
    p.add_argument("--format", default="fake",
                   help="fake | autoround | gptq | awq | llm_compressor | "
                        "gguf:q4_k_m (etc.)")
    p.add_argument("--quant-lm-head", action="store_true")
    p.add_argument("--ignore-layers", nargs="*", default=None)
    p.add_argument("--avg-bits", type=float, default=None,
                   help="enable AutoScheme mixed-precision search")
    p.add_argument("--scheme-options", nargs="*", default=None,
                   help="candidate schemes for AutoScheme")
    p.add_argument("--eval-ppl", action="store_true",
                   help="report perplexity delta FP vs quantized on the "
                        "calibration batch")
    p.add_argument("--nblocks", type=int, default=1,
                   help="tune N consecutive blocks jointly")
    p.add_argument("--enable-rotation", default=None,
                   help="pre-quantization rotations: r1 | r4 | spin | r2 "
                        "(comma-combinable, e.g. 'spin,r2,r4')")
    p.add_argument("--model-free", action="store_true",
                   help="streaming shard RTN without model instantiation")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    if argv and argv[0] == "eval":
        # eval subcommand (role of the reference's auto-round-eval CLI)
        from .eval.eval_cli import main as eval_main
        return eval_main(argv[1:])
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from . import AutoRound
    from .models import llama
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
        v = getattr(args, k if k != "batch_size" else "batch_size")
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

    if args.dataset.endswith(".npy"):
        ids = np.load(args.dataset)[:nsamples, :seqlen]
        mask = np.ones(ids.shape, np.float32)
    else:
        ids, mask = get_calib_batch(
            args.dataset, nsamples=nsamples, seqlen=seqlen,
            tokenizer=tokenizer, vocab_size=cfg.vocab_size, seed=args.seed,
            apply_chat_template=args.apply_chat_template,
            system_prompt=args.system_prompt)

    scheme = args.scheme
    if args.avg_bits is not None:
        from .quantize.auto_scheme import AutoScheme
        scheme = AutoScheme(avg_bits=args.avg_bits,
                            options=tuple(args.scheme_options
                                          or ("W2A16", "W4A16", "W8A16")))

    ar = AutoRound((params, cfg), scheme=scheme,
                   minmax_lr=args.minmax_lr, nblocks=args.nblocks,
                   quant_lm_head=args.quant_lm_head,
                   ignore_layers=args.ignore_layers,
                   enable_rotation=args.enable_rotation or False,
                   seed=args.seed, **recipe)
    result = ar.quantize(ids, mask=mask)
    out = ar.save_quantized(args.output, format=args.format)

    report = {"output": out, "layers": len(result.layers)}
    if args.eval_ppl:
        from .eval import perplexity
        report["ppl_fp"] = perplexity(params, cfg, ids, mask)
        # ar.model_cfg carries rotation-induced config changes (online R4)
        report["ppl_quant"] = perplexity(result.params, ar.model_cfg, ids,
                                         mask)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
