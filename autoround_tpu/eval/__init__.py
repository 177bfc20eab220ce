"""Evaluation (role of reference ``auto_round/eval/``).

The reference wraps lm-eval-harness; its task corpora need the network,
which this environment doesn't have, so the in-repo metric is perplexity /
token-NLL on a provided token batch — the same quantity the reference's
regression floors proxy (lambada/piqa floors, ``test/e2e``).  The
``lm_eval_adapter`` module provides the harness ``LM`` wrapper (batched
jitted loglikelihood / greedy / generate_until) for hosts where the
lm-eval package and its task data are available.
"""

from .lm_eval_adapter import (greedy_matches, make_harness_lm,
                              sequence_loglikelihood, simple_evaluate)
from .ppl import lm_nll, perplexity

__all__ = ["perplexity", "lm_nll", "sequence_loglikelihood",
           "greedy_matches", "make_harness_lm", "simple_evaluate"]
