"""Eval CLI (role of the reference's ``auto-round-eval``,
``auto_round/eval/eval_cli.py``).

Usage::

    python -m autoround_tpu eval --model <preset|hf_dir|quantized_dir> \
        --tasks t1.jsonl t2.jsonl [--packed] [--ppl tokens.npy]

Tasks are offline JSONL files (``eval/harness_shim.py`` formats); with
the real ``lm_eval`` installed, ``--lm-eval-tasks`` names hub tasks
instead.  ``--packed`` scores through the serving engine's packed
low-bit weights rather than dense qdq weights.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="autoround_tpu eval")
    p.add_argument("--model", required=True,
                   help="model-zoo preset, HF checkpoint dir, or an "
                        "exported quantized dir (autoround format)")
    p.add_argument("--tasks", nargs="*", default=[],
                   help="offline JSONL task files")
    p.add_argument("--lm-eval-tasks", nargs="*", default=[],
                   help="lm-eval hub task names (needs lm_eval installed)")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--packed", action="store_true",
                   help="score through packed serving weights")
    p.add_argument("--ppl", default=None,
                   help=".npy token matrix for a perplexity report")
    p.add_argument("--batch", "--eval-bs", dest="batch", type=int,
                   default=8)
    p.add_argument("--limit", type=int, default=None,
                   help="cap samples per task (reference --limit)")
    p.add_argument("--greedy-acc", default=None,
                   help=".npy token matrix for per-position greedy "
                        "next-token accuracy")
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--seed", type=int, default=42)
    return p


def _load_model(name, seed):
    import jax

    from ..models.registry import ALL_PRESETS, get_model_fns
    if name in ALL_PRESETS:
        cfg = ALL_PRESETS[name]
        return get_model_fns(cfg).init_params(
            cfg, jax.random.PRNGKey(seed)), cfg, None
    if name.endswith(".gguf"):
        # GGUF-file eval (reference eval/evaluation.py:187-255): dequant
        # the k-quant tensors and score the dense model
        from ..export.gguf import load_gguf_checkpoint
        params, cfg = load_gguf_checkpoint(name)
        return params, cfg, None
    if os.path.exists(os.path.join(name, "quantization_config.json")):
        from ..serve import QuantizedLlama
        eng = QuantizedLlama.from_pretrained(name)
        return eng.params, eng.cfg, eng
    from ..utils.hf_loader import load_hf_checkpoint
    params, cfg = load_hf_checkpoint(name)
    return params, cfg, None


def _tokenizer_for(args):
    tok_path = args.tokenizer or args.model
    try:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(tok_path)
        return (lambda s: tok.encode(s, add_special_tokens=False),
                lambda ids: tok.decode(ids))
    except Exception:
        # numeric fallback: whitespace-separated token ids (offline tiny-
        # model tasks are written this way)
        return (lambda s: [int(t) for t in s.split()],
                lambda ids: " ".join(map(str, ids)))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    params, cfg, engine = _load_model(args.model, args.seed)
    if not args.packed:
        engine = None
    tokenizer, detokenizer = _tokenizer_for(args)

    report = {"model": args.model}
    if args.tasks:
        from .lm_eval_adapter import evaluate_offline
        report["tasks"] = {}
        for tp in args.tasks:
            report["tasks"][os.path.basename(tp)] = evaluate_offline(
                params, cfg, tokenizer, tp, detokenizer=detokenizer,
                batch=args.batch, max_len=args.max_len, engine=engine,
                limit=args.limit)
    if args.lm_eval_tasks:
        from .lm_eval_adapter import simple_evaluate
        res = simple_evaluate(params, cfg, tokenizer, args.lm_eval_tasks,
                              detokenizer=detokenizer, batch=args.batch,
                              max_len=args.max_len)
        report["lm_eval"] = {t: res["results"].get(t)
                             for t in args.lm_eval_tasks}
    if args.greedy_acc:
        import numpy as np

        from .lm_eval_adapter import greedy_token_accuracy
        ids = np.load(args.greedy_acc)
        report["greedy_acc"] = round(
            greedy_token_accuracy(params, cfg, ids, batch=args.batch), 4)
    if args.ppl:
        import numpy as np

        from . import perplexity
        ids = np.load(args.ppl)
        report["ppl"] = perplexity(params, cfg, ids)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
