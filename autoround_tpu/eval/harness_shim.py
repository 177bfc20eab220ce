"""Minimal offline lm-eval-harness shim.

The container ships no ``lm_eval`` package and has zero egress, so this
module vendors JUST ENOUGH of the harness contract to run real task
files offline (role of the reference's eval integration,
``auto_round/eval/evaluation.py:57-99``): the abstract ``LM`` interface
(same method surface as ``lm_eval.api.model.LM``), a JSONL task loader,
and the two standard metrics — multiple-choice accuracy (+ the
length-normalized ``acc_norm`` lm-eval reports for piqa/hellaswag-style
tasks) and greedy-continuation accuracy (lambada-style).

When the real ``lm_eval`` IS importable, ``make_harness_lm`` subclasses
its LM instead, so the same adapter feeds either runner.

Task JSONL formats (one sample per line):
  multiple choice: {"query": str, "choices": [str, ...], "gold": int}
  greedy:          {"context": str, "continuation": str}
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

__all__ = ["LM", "Request", "load_task_jsonl", "evaluate_task"]


@dataclass(frozen=True)
class Request:
    """Mirror of the harness request object: payload rides in .args."""

    args: Tuple[Any, ...]


class LM:
    """Abstract scoring interface (mirror of ``lm_eval.api.model.LM``)."""

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        raise NotImplementedError

    def loglikelihood_rolling(self, requests) -> List[Tuple[float]]:
        raise NotImplementedError

    def generate_until(self, requests) -> List[str]:
        raise NotImplementedError


def load_task_jsonl(path: str) -> Dict[str, Any]:
    samples = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                samples.append(json.loads(line))
    if not samples:
        raise ValueError(f"empty task file {path}")
    kind = "multiple_choice" if "choices" in samples[0] else "greedy"
    return {"type": kind, "samples": samples}


def evaluate_task(lm: LM, task: Dict[str, Any]) -> Dict[str, float]:
    """Score a loaded task with an LM.  Returns the metric dict."""
    samples = task["samples"]
    if task["type"] == "multiple_choice":
        reqs, spans = [], []
        for s in samples:
            start = len(reqs)
            for ch in s["choices"]:
                reqs.append(Request(args=(s["query"], ch)))
            spans.append((start, len(reqs), s["gold"]))
        scores = lm.loglikelihood(reqs)
        n_acc = n_norm = 0
        for (start, end, gold), s in zip(spans, samples):
            lps = [scores[i][0] for i in range(start, end)]
            lens = [max(len(c), 1) for c in s["choices"]]
            if max(range(len(lps)), key=lambda i: lps[i]) == gold:
                n_acc += 1
            normed = [lp / L for lp, L in zip(lps, lens)]
            if max(range(len(normed)), key=lambda i: normed[i]) == gold:
                n_norm += 1
        n = len(samples)
        return {"acc": n_acc / n, "acc_norm": n_norm / n, "n": n}
    # greedy continuation
    reqs = [Request(args=(s["context"], s["continuation"]))
            for s in samples]
    scores = lm.loglikelihood(reqs)
    n_acc = sum(1 for _, greedy in scores if greedy)
    return {"acc": n_acc / len(samples), "n": len(samples)}
