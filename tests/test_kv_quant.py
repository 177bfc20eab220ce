"""KV-cache quantization tests (int8 / fp8 storage, static scales)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.serve import QuantizedLlama


@pytest.fixture(scope="module")
def engine_inputs():
    cfg = llama.CONFIG_PRESETS["tiny"]
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             cfg.vocab_size)
    res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
    return cfg, res, ids


class TestKvQuant:
    @pytest.mark.parametrize("kv_quant", ["int8", "fp8"])
    def test_cache_storage_dtype(self, engine_inputs, kv_quant):
        cfg, res, ids = engine_inputs
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32,
                                                  kv_quant=kv_quant)
        logits, cache = eng.prefill(ids[:2, :8])
        want = jnp.int8 if kv_quant == "int8" else jnp.float8_e4m3fn
        assert cache.k.dtype == want and cache.v.dtype == want
        assert cache.k_scale is not None
        assert np.isfinite(np.asarray(logits, np.float32)).all()

    @pytest.mark.parametrize("kv_quant", ["int8", "fp8"])
    def test_decode_close_to_unquantized(self, engine_inputs, kv_quant):
        cfg, res, ids = engine_inputs
        base = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        quant = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32,
                                                    kv_quant=kv_quant)
        l0, c0 = base.prefill(ids[:1, :8])
        l1, c1 = quant.prefill(ids[:1, :8])
        # prefill logits identical (last-token path uses unquantized k/v)
        np.testing.assert_allclose(np.asarray(l0, np.float32),
                                   np.asarray(l1, np.float32),
                                   rtol=1e-2, atol=1e-2)
        tok = jnp.argmax(l0, -1).astype(jnp.int32)
        d0, _ = base.decode_step(tok, c0)
        d1, _ = quant.decode_step(tok, c1)
        rel = (np.abs(np.asarray(d0 - d1, np.float32)).max()
               / np.abs(np.asarray(d0, np.float32)).max())
        assert rel < 0.08, rel

    def test_generate_with_kv_quant(self, engine_inputs):
        cfg, res, ids = engine_inputs
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32,
                                                  kv_quant="int8")
        out = eng.generate(ids[:2, :4], max_new_tokens=6)
        assert out.shape == (2, 6)
        assert np.isfinite(np.asarray(out)).all()
