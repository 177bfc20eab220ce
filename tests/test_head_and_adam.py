"""Tuned lm_head quantization + AdamRound optimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.algorithms import TuneConfig, tune_block
from autoround_tpu.models import llama
from autoround_tpu.schemes import parse_scheme

CFG = llama.CONFIG_PRESETS["tiny"]


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    return params, ids


class TestLmHead:
    def test_tuned_head_quantized(self, setup):
        params, ids = setup
        res = AutoRound((params, CFG), scheme="W4A16G32", iters=5,
                        batch_size=4, quant_lm_head=True).quantize(ids)
        assert "lm_head" in res.layers
        # head weight in params must be the qdq version
        got = np.asarray(res.params["lm_head"], np.float32)
        want = np.asarray(res.layers["lm_head"].qdq, np.float32)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rtn_head(self, setup):
        params, ids = setup
        res = AutoRound((params, CFG), scheme="W4A16G32", iters=0,
                        quant_lm_head=True).quantize(ids)
        assert "lm_head" in res.layers


class TestAdamRound:
    def test_adam_loss_decreases(self):
        k = jax.random.PRNGKey(0)
        w = jax.random.normal(k, (32, 64)) * 0.1
        x = jax.random.normal(k, (16, 8, 64))
        ref = jnp.einsum("bsi,oi->bso", x, w)
        fwd = lambda ws, xb: jnp.einsum("bsi,oi->bso", xb, ws["w"])
        cfg = TuneConfig(iters=40, batch_size=8, optimizer="adam", lr=0.01)
        best, info = tune_block(fwd, {"w": w}, x, ref,
                                {"w": parse_scheme("W2A16G64")}, cfg)
        assert info["best_loss"] < info["first_loss"]

    def test_adam_pipeline(self, setup):
        params, ids = setup
        res = AutoRound((params, CFG), scheme="W4A16G32", iters=5,
                        batch_size=4, optimizer="adam",
                        lr=0.005).quantize(ids)
        assert len(res.layers) == CFG.num_layers * 7
