"""lm-eval adapter scoring primitives (harness package not required)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.eval import greedy_matches, sequence_loglikelihood
from autoround_tpu.models import llama

CFG = llama.CONFIG_PRESETS["tiny"]


@pytest.fixture(scope="module")
def model():
    return llama.init_params(CFG, jax.random.PRNGKey(0))


class TestLoglikelihood:
    def test_matches_direct_computation(self, model):
        ctx = [[1, 2, 3], [7, 8]]
        cont = [[4, 5], [9, 10, 11]]
        res = sequence_loglikelihood(model, CFG, ctx, cont, batch=2)
        assert len(res) == 2
        # direct: logp of cont tokens given prefix
        for (lp, greedy), c, t in zip(res, ctx, cont):
            ids = jnp.asarray([c + t])
            logits = llama.model_fwd(model, ids[:, :-1], CFG)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            want = 0.0
            for j, tok in enumerate(t):
                want += float(logp[0, len(c) - 1 + j, tok])
            assert lp == pytest.approx(want, rel=1e-4, abs=1e-4)
            assert isinstance(greedy, bool)

    def test_greedy_flag_true_for_argmax_continuation(self, model):
        # construct a continuation BY greedy decoding → flag must be True
        ctx = [3, 1, 4]
        ids = list(ctx)
        for _ in range(3):
            logits = llama.model_fwd(model, jnp.asarray([ids]), CFG)
            ids.append(int(jnp.argmax(logits[0, -1])))
        cont = ids[len(ctx):]
        res = sequence_loglikelihood(model, CFG, [ctx], [cont], batch=1)
        assert res[0][1] is True
        # perturb one token → flag flips (pick a non-argmax token)
        bad = list(cont)
        bad[1] = (bad[1] + 1) % CFG.vocab_size
        res2 = sequence_loglikelihood(model, CFG, [ctx], [bad], batch=1)
        assert res2[0][1] is False

    def test_truncation_to_max_len(self, model):
        ctx = list(range(1, 30))
        cont = [5, 6]
        res = sequence_loglikelihood(model, CFG, [ctx], [cont], batch=1,
                                     max_len=16)
        assert np.isfinite(res[0][0])

    def test_greedy_matches_shape(self, model):
        ids = np.random.default_rng(0).integers(0, CFG.vocab_size, (3, 12))
        g = greedy_matches(model, CFG, ids)
        assert g.shape == (3,) and g.dtype == bool
