"""Sampled decoding: temperature / top-k / top-p across all three
engines (single-chip, continuous batching, TP).

Coverage model: distribution sanity for the primitive (`sample_token`),
determinism under a fixed key, and greedy-equivalence at temperature 0
(the prior behavior must be bit-preserved)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.serve import QuantizedLlama, SamplingParams
from autoround_tpu.serve.sampling import sample_token


class TestSampleToken:
    def test_greedy_default(self):
        logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.0]])
        tok = sample_token(logits, None, None)
        np.testing.assert_array_equal(np.asarray(tok), [1, 0])

    def test_temperature_distribution(self):
        # two-way distribution p = softmax([0, ln3]) = [0.25, 0.75]
        logits = jnp.tile(jnp.asarray([[0.0, np.log(3.0)]]), (4096, 1))
        tok = sample_token(logits, jax.random.PRNGKey(0),
                           SamplingParams(temperature=1.0))
        frac1 = float(jnp.mean((tok == 1).astype(jnp.float32)))
        assert 0.70 < frac1 < 0.80

    def test_low_temperature_approaches_greedy(self):
        logits = jnp.tile(jnp.asarray([[0.0, 1.0, 0.5]]), (256, 1))
        tok = sample_token(logits, jax.random.PRNGKey(1),
                           SamplingParams(temperature=0.05))
        assert float(jnp.mean((tok == 1).astype(jnp.float32))) > 0.99

    def test_top_k_masks_tail(self):
        logits = jnp.tile(jnp.asarray([[4.0, 3.9, -1.0, -2.0]]), (512, 1))
        tok = sample_token(logits, jax.random.PRNGKey(2),
                           SamplingParams(temperature=2.0, top_k=2))
        assert set(np.unique(np.asarray(tok))) <= {0, 1}

    def test_top_p_masks_tail_keeps_head(self):
        # probs ~ [0.665, 0.245, 0.09]; top_p=0.5 keeps only the head
        logits = jnp.tile(jnp.asarray([[2.0, 1.0, 0.0]]), (256, 1))
        tok = sample_token(logits, jax.random.PRNGKey(3),
                           SamplingParams(temperature=1.0, top_p=0.5))
        assert set(np.unique(np.asarray(tok))) == {0}
        # top_p=0.8 admits the second token too, never the third
        tok = sample_token(logits, jax.random.PRNGKey(4),
                           SamplingParams(temperature=1.0, top_p=0.8))
        assert set(np.unique(np.asarray(tok))) <= {0, 1}

    def test_deterministic_under_fixed_key(self):
        logits = jax.random.normal(jax.random.PRNGKey(7), (8, 64))
        sp = SamplingParams(temperature=0.8, top_k=16, top_p=0.9)
        a = sample_token(logits, jax.random.PRNGKey(5), sp)
        b = sample_token(logits, jax.random.PRNGKey(5), sp)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def engine():
    cfg = llama.CONFIG_PRESETS["tiny"]
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                             cfg.vocab_size)
    res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
    return QuantizedLlama.from_quantize_result(res, cfg, max_seq=64), cfg


class TestEngineSampling:
    def test_generate_seeded_deterministic(self, engine):
        qm, cfg = engine
        ids = jnp.asarray([[3, 5, 7, 11]])
        sp = SamplingParams(temperature=0.9, top_k=32, seed=42)
        a = np.asarray(qm.generate(ids, max_new_tokens=8, sampling=sp))
        b = np.asarray(qm.generate(ids, max_new_tokens=8, sampling=sp))
        np.testing.assert_array_equal(a, b)
        # a different seed must (overwhelmingly) diverge on a tiny model
        c = np.asarray(qm.generate(
            ids, max_new_tokens=8,
            sampling=SamplingParams(temperature=0.9, top_k=32, seed=43)))
        assert not np.array_equal(a, c)

    def test_generate_scan_matches_python_loop(self, engine):
        qm, cfg = engine
        ids = jnp.asarray([[3, 5, 7, 11]])
        sp = SamplingParams(temperature=0.7, top_p=0.95, seed=9)
        loop = np.asarray(qm.generate(ids, max_new_tokens=6, sampling=sp))
        scan = np.asarray(qm.generate_scan(ids, max_new_tokens=6,
                                           sampling=sp))
        np.testing.assert_array_equal(loop, scan)

    def test_temperature_zero_is_greedy(self, engine):
        qm, cfg = engine
        ids = jnp.asarray([[3, 5, 7, 11]])
        greedy = np.asarray(qm.generate(ids, max_new_tokens=6))
        zero = np.asarray(qm.generate(
            ids, max_new_tokens=6, sampling=SamplingParams(temperature=0)))
        np.testing.assert_array_equal(greedy, zero)

    def test_batcher_sampled_deterministic(self, engine):
        from autoround_tpu.serve.batching import ContinuousBatchingEngine
        qm, cfg = engine
        sp = SamplingParams(temperature=0.8, top_k=64, seed=13)
        outs = []
        for _ in range(2):
            e = ContinuousBatchingEngine(qm, max_batch=2, max_seq=64,
                                         prompt_buckets=(8,), sampling=sp)
            rid = e.submit([1, 2, 3], max_new_tokens=6)
            while e.pending():
                e.step()
            outs.append(e.result(rid))
        assert outs[0] == outs[1]

    def test_tp_engine_sampled_deterministic(self, engine):
        from autoround_tpu.parallel.mesh import make_mesh
        from autoround_tpu.serve import TPQuantizedLlama
        qm, cfg = engine
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        tpm = TPQuantizedLlama.from_engine(qm, make_mesh(4, dp=2, tp=2))
        ids = jnp.asarray([[3, 5, 7, 11], [1, 2, 3, 4]])
        sp = SamplingParams(temperature=0.9, seed=21)
        a = np.asarray(tpm.generate(ids, max_new_tokens=6, sampling=sp))
        b = np.asarray(tpm.generate(ids, max_new_tokens=6, sampling=sp))
        np.testing.assert_array_equal(a, b)
