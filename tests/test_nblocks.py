"""Joint multi-block (nblocks>1) tuning tests."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu import AutoRound
from autoround_tpu.models import llama

CFG = llama.CONFIG_PRESETS["tiny"]  # 2 blocks


def test_nblocks2_quantizes_all_layers():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    res = AutoRound((params, CFG), scheme="W2A16G64", iters=10,
                    batch_size=4, nblocks=2).quantize(ids)
    assert len(res.layers) == CFG.num_layers * 7
    for bi, trace in res.loss_traces.items():
        assert np.min(trace) <= trace[0] + 1e-9
    # quantized model still runs
    logits = llama.model_fwd(res.params, ids[:2], CFG)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_nblocks_beats_or_matches_single_block():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (16, 32), 0,
                             CFG.vocab_size)
    single = AutoRound((params, CFG), scheme="W2A16G64", iters=30,
                       batch_size=4, seed=0).quantize(ids)
    joint = AutoRound((params, CFG), scheme="W2A16G64", iters=30,
                      batch_size=4, seed=0, nblocks=2).quantize(ids)
    fp = np.asarray(llama.model_fwd(params, ids[:8], CFG), np.float32)
    e_s = float(np.mean((np.asarray(
        llama.model_fwd(single.params, ids[:8], CFG), np.float32) - fp) ** 2))
    e_j = float(np.mean((np.asarray(
        llama.model_fwd(joint.params, ids[:8], CFG), np.float32) - fp) ** 2))
    # joint tuning sees the end-of-group objective; allow modest slack
    assert e_j <= e_s * 1.5, (e_j, e_s)
