"""LFQ (last-block LM cross-entropy) loss tests."""

import jax
import numpy as np

from autoround_tpu import AutoRound
from autoround_tpu.models import llama

CFG = llama.CONFIG_PRESETS["tiny"]


def test_lfq_runs_and_quantizes():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    res = AutoRound((params, CFG), scheme="W4A16G32", iters=8, batch_size=4,
                    enable_lfq=True).quantize(ids)
    assert len(res.layers) == CFG.num_layers * 7
    # last block's loss trace is CE-scaled (not MSE*1000): starts near
    # ln(vocab) for a random model, and stays finite
    last = res.loss_traces[CFG.num_layers - 1]
    assert np.isfinite(last).all()
    assert last[0] < 20  # CE magnitude, not MSE*1000
    logits = llama.model_fwd(res.params, ids[:2], CFG)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_lfq_respects_mask():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    import jax.numpy as jnp
    mask = jnp.ones((8, 16)).at[:, 8:].set(0)
    res = AutoRound((params, CFG), scheme="W4A16G32", iters=4, batch_size=4,
                    enable_lfq=True).quantize(ids, mask=mask)
    assert np.isfinite(res.loss_traces[CFG.num_layers - 1]).all()
