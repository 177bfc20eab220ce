"""AR_TRACE_DIR jax.profiler integration + MX stochastic rounding."""

import os

import jax
import jax.numpy as jnp
import numpy as np


class TestTrace:
    def test_trace_dir_written(self, tmp_path, monkeypatch):
        monkeypatch.setenv("AR_TRACE_DIR", str(tmp_path / "trace"))
        from autoround_tpu import AutoRound
        from autoround_tpu.models import llama
        cfg = llama.CONFIG_PRESETS["tiny"]
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0,
                                 cfg.vocab_size)
        AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        # profiler wrote a plugins/profile dump under the trace dir
        found = []
        for root, _, files in os.walk(tmp_path / "trace"):
            found += files
        assert found, "no trace files written"

    def test_noop_without_env(self, monkeypatch):
        monkeypatch.delenv("AR_TRACE_DIR", raising=False)
        from autoround_tpu.utils.profiling import maybe_trace
        with maybe_trace() as started:
            assert started is False


class TestMxStochastic:
    def test_unbiased_and_deterministic(self):
        from autoround_tpu.dtypes.mxfp import qdq_mx
        w = jax.random.normal(jax.random.PRNGKey(0), (8, 32)) * 0.5
        det = qdq_mx(w, "mx_fp4").qdq
        # same key -> identical
        a = qdq_mx(w, "mx_fp4", stochastic_key=jax.random.PRNGKey(1)).qdq
        b = qdq_mx(w, "mx_fp4", stochastic_key=jax.random.PRNGKey(1)).qdq
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # different keys -> differs somewhere
        c = qdq_mx(w, "mx_fp4", stochastic_key=jax.random.PRNGKey(2)).qdq
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0
        # expectation over keys approaches w much closer than one draw
        acc = np.zeros(w.shape, np.float64)
        n = 64
        for k in range(n):
            acc += np.asarray(
                qdq_mx(w, "mx_fp4",
                       stochastic_key=jax.random.PRNGKey(100 + k)).qdq,
                np.float64)
        mean_err = np.abs(acc / n - np.asarray(w, np.float64)).mean()
        det_err = np.abs(np.asarray(det, np.float64)
                         - np.asarray(w, np.float64)).mean()
        assert mean_err < det_err * 0.6

    def test_int_elements_stochastic(self):
        from autoround_tpu.dtypes.mxfp import qdq_mx
        w = jax.random.normal(jax.random.PRNGKey(3), (4, 32)) * 0.3
        a = qdq_mx(w, "mx_int8", stochastic_key=jax.random.PRNGKey(4)).qdq
        assert np.isfinite(np.asarray(a)).all()
