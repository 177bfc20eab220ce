"""Evaluation (role of reference ``auto_round/eval/``).

The reference wraps lm-eval-harness; its task corpora need the network,
which this environment doesn't have, so the in-repo metric is perplexity /
token-NLL on a provided token batch — the same quantity the reference's
regression floors proxy (lambada/piqa floors, ``test/e2e``).  lm-eval can
be layered on later where a cache exists.
"""

from .ppl import lm_nll, perplexity

__all__ = ["perplexity", "lm_nll"]
