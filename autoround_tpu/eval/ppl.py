"""Perplexity / NLL evaluation of llama-family params."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama

__all__ = ["lm_nll", "perplexity"]


def lm_nll(params: Dict[str, Any], cfg: llama.LlamaConfig,
           input_ids: jax.Array, mask: Optional[jax.Array] = None,
           batch: int = 4) -> float:
    """Mean next-token negative log-likelihood over a (N, S) token batch."""
    input_ids = jnp.asarray(input_ids)
    N, S = input_ids.shape

    from ..models.registry import get_model_fns
    model_fwd = get_model_fns(cfg).model_fwd

    # params MUST be a jit argument, not a closure capture: captured
    # params bake into the HLO as constants (GBs for real models — the
    # remote-compile payload then ships the whole model per compile)
    @jax.jit
    def nll_batch(p, ids, m):
        logits = model_fwd(p, ids[:, :-1], cfg).astype(jnp.float32)
        targets = ids[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        mm = m[:, 1:]
        return jnp.sum(tok_nll * mm), jnp.sum(mm)

    if mask is None:
        mask = jnp.ones((N, S), jnp.float32)
    tot, cnt = 0.0, 0.0
    for s in range(0, N, batch):
        t, c = nll_batch(params, input_ids[s:s + batch], mask[s:s + batch])
        tot += float(t)
        cnt += float(c)
    return tot / max(cnt, 1.0)


def perplexity(params, cfg, input_ids, mask=None, batch: int = 4) -> float:
    return float(np.exp(lm_nll(params, cfg, input_ids, mask, batch)))
