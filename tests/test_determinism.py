"""Determinism: same seed → bit-identical results (model of the
reference's determinism checks, ``base.py:334-352``)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu import AutoRound
from autoround_tpu.models import llama

CFG = llama.CONFIG_PRESETS["tiny"]


def _run(seed):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    return AutoRound((params, CFG), scheme="W2A16G64", iters=10,
                     batch_size=4, seed=seed).quantize(ids)


def test_same_seed_bitwise_identical():
    a = _run(7)
    b = _run(7)
    for name in a.layers:
        np.testing.assert_array_equal(
            np.asarray(a.layers[name].qdq, np.float32),
            np.asarray(b.layers[name].qdq, np.float32), err_msg=name)


def test_different_seed_differs():
    a = _run(7)
    b = _run(8)
    diff = any(
        not np.array_equal(np.asarray(a.layers[n].qdq, np.float32),
                           np.asarray(b.layers[n].qdq, np.float32))
        for n in a.layers)
    assert diff
