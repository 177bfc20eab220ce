"""Continuous batching engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.serve import QuantizedLlama
from autoround_tpu.serve.batching import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def model():
    cfg = llama.CONFIG_PRESETS["tiny"]
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                             cfg.vocab_size)
    res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
    return QuantizedLlama.from_quantize_result(res, cfg, max_seq=64), cfg


class TestContinuousBatching:
    def test_single_request_matches_plain_generate(self, model):
        qm, cfg = model
        eng = ContinuousBatchingEngine(qm, max_batch=4, max_seq=64,
                                       prompt_buckets=(8, 16))
        prompt = [3, 5, 7, 11]
        rid = eng.submit(prompt, max_new_tokens=6)
        while eng.pending():
            eng.step()
        got = eng.result(rid)
        want = np.asarray(qm.generate(jnp.asarray([prompt]),
                                      max_new_tokens=6))[0]
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_interleaved_requests_independent(self, model):
        qm, cfg = model
        # run two prompts together vs separately — must match exactly
        p1, p2 = [1, 2, 3], [9, 8, 7, 6, 5]
        solo = {}
        for p in (p1, p2):
            e = ContinuousBatchingEngine(qm, max_batch=4, max_seq=64,
                                         prompt_buckets=(8, 16))
            rid = e.submit(p, max_new_tokens=5)
            while e.pending():
                e.step()
            solo[tuple(p)] = e.result(rid)

        eng = ContinuousBatchingEngine(qm, max_batch=4, max_seq=64,
                                       prompt_buckets=(8, 16))
        r1 = eng.submit(p1, max_new_tokens=5)
        r2 = eng.submit(p2, max_new_tokens=5)
        while eng.pending():
            eng.step()
        assert eng.result(r1) == solo[tuple(p1)]
        assert eng.result(r2) == solo[tuple(p2)]

    def test_slot_reuse_after_finish(self, model):
        qm, cfg = model
        eng = ContinuousBatchingEngine(qm, max_batch=2, max_seq=64,
                                       prompt_buckets=(8,))
        a = eng.submit([1, 2], max_new_tokens=2)
        b = eng.submit([3, 4], max_new_tokens=8)
        with pytest.raises(RuntimeError):
            eng.submit([5], max_new_tokens=2)  # batch full
        while len(eng.result(a)) < 2:
            eng.step()
        # a finished → slot free → new request joins while b still runs
        c = eng.submit([5, 6], max_new_tokens=3)
        while eng.pending():
            eng.step()
        assert len(eng.result(b)) == 8
        assert len(eng.result(c)) == 3

    def test_late_join_does_not_change_running_request(self, model):
        qm, cfg = model
        eng = ContinuousBatchingEngine(qm, max_batch=4, max_seq=64,
                                       prompt_buckets=(8,))
        r1 = eng.submit([2, 4, 6], max_new_tokens=8)
        for _ in range(3):
            eng.step()
        partial = list(eng.result(r1))
        eng.submit([7, 7, 7], max_new_tokens=4)  # joins mid-flight
        while eng.pending():
            eng.step()
        assert eng.result(r1)[: len(partial)] == partial
        # and the whole sequence equals the solo run
        solo = ContinuousBatchingEngine(qm, max_batch=4, max_seq=64,
                                        prompt_buckets=(8,))
        rs = solo.submit([2, 4, 6], max_new_tokens=8)
        while solo.pending():
            solo.step()
        assert eng.result(r1) == solo.result(rs)


class TestBatchingModelQuirks:
    """Continuous batching must inherit every arch quirk from the shared
    ``engine._block_with_cache`` block (qk_norm, sandwich norms, softcap,
    sliding window, norm offset) — round-1 regression: the engine had its
    own inline block with hardcoded silu that served Gemma2/Qwen3 wrong."""

    @pytest.mark.parametrize("preset", ["tiny-qwen3", "tiny-gemma2"])
    def test_quirky_arch_matches_plain_generate(self, preset):
        cfg = llama.CONFIG_PRESETS[preset]
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        qm = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        prompt = [3, 5, 7, 11, 2]
        eng = ContinuousBatchingEngine(qm, max_batch=2, max_seq=64,
                                       prompt_buckets=(8, 16))
        rid = eng.submit(prompt, max_new_tokens=8)
        while eng.pending():
            eng.step()
        want = np.asarray(qm.generate(jnp.asarray([prompt]),
                                      max_new_tokens=8))[0]
        np.testing.assert_array_equal(np.asarray(eng.result(rid)), want)
