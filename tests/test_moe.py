"""MoE (Mixtral-family) quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import get_model_fns, mixtral
from autoround_tpu.utils.pytree import get_by_path, set_by_path

CFG = mixtral.CONFIG_PRESETS["tiny-moe"]


class TestPytreePaths:
    def test_get_set_nested(self):
        tree = {"blocks": [{"experts": [{"w1": 1}, {"w1": 2}]}]}
        assert get_by_path(tree, "blocks.0.experts.1.w1") == 2
        t2 = set_by_path(tree, "blocks.0.experts.1.w1", 9)
        assert get_by_path(t2, "blocks.0.experts.1.w1") == 9
        assert get_by_path(tree, "blocks.0.experts.1.w1") == 2  # original kept


class TestMixtralModel:
    def test_forward_shapes(self):
        params = mixtral.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                 CFG.vocab_size)
        logits = mixtral.model_fwd(params, ids, CFG)
        assert logits.shape == (2, 8, CFG.vocab_size)
        assert np.isfinite(np.asarray(logits, np.float32)).all()

    def test_topk_routing_sparsity(self):
        # with top_k == num_experts the output must equal dense mixture;
        # with top_k=1 only one expert contributes per token
        params = mixtral.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 4), 0,
                                 CFG.vocab_size)
        import dataclasses
        cfg1 = dataclasses.replace(CFG, top_k=1)
        l1 = mixtral.model_fwd(params, ids, cfg1)
        l2 = mixtral.model_fwd(params, ids, CFG)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))

    def test_linear_names_cover_experts(self):
        names = get_model_fns(CFG).block_linear_names(CFG)
        assert "experts.0.w1" in names and "experts.3.w2" in names
        assert len(names) == 4 + CFG.num_experts * 3


class TestMoEQuantize:
    def test_rtn_quantizes_every_expert(self):
        params = mixtral.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((params, CFG), scheme="W4A16", iters=0).quantize(ids)
        expected = CFG.num_layers * (4 + CFG.num_experts * 3)
        assert len(res.layers) == expected
        assert "blocks.0.experts.2.w2" in res.layers
        # router must NOT be quantized
        assert not any("router" in n for n in res.layers)

    def test_tuned_moe_loss_decreases(self):
        params = mixtral.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((params, CFG), scheme="W2A16G64", iters=15,
                        batch_size=4).quantize(ids)
        for bi, trace in res.loss_traces.items():
            assert np.min(trace) <= trace[0] + 1e-9

    def test_moe_quantized_model_runs(self):
        params = mixtral.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((params, CFG), scheme="W4A16", iters=3,
                        batch_size=4).quantize(ids)
        logits = mixtral.model_fwd(res.params, ids[:2], CFG)
        assert np.isfinite(np.asarray(logits, np.float32)).all()
