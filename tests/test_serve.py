"""Serving engine tests: prefill/decode vs full forward, packed-vs-dense
parity (CPU runs the kernel's XLA reference path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.serve import QuantizedLlama


@pytest.fixture(scope="module")
def quantized():
    # dims compatible with int4 packing (in_features % 1024 == 0 for g=128)
    cfg = llama.LlamaConfig(vocab_size=128, hidden_size=1024,
                            intermediate_size=1024, num_layers=2,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
    return cfg, params, res


class TestEngine:
    def test_packs_all_int4_layers(self, quantized):
        cfg, params, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        base = [k for k in eng.packed
                if not k.endswith(("qkv", "gate_up"))]
        assert len(base) == cfg.num_layers * 7

    def test_prefill_matches_model_fwd(self, quantized):
        cfg, params, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 128)
        logits, cache = eng.prefill(ids)
        want = llama.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
        assert int(cache.length) == 8

    def test_decode_matches_full_forward(self, quantized):
        cfg, params, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        ids = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, 128)
        logits, cache = eng.prefill(ids)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, cache2 = eng.decode_step(tok, cache)
        # compare with running the full sequence through model_fwd
        seq = jnp.concatenate([ids, tok[:, None]], axis=1)
        want = llama.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits2, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
        assert int(cache2.length) == 9

    def test_generate_deterministic(self, quantized):
        cfg, params, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 4), 0, 128)
        out1 = eng.generate(ids, max_new_tokens=6)
        out2 = eng.generate(ids, max_new_tokens=6)
        assert out1.shape == (2, 6)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_unpackable_scheme_stays_dense(self):
        cfg = llama.CONFIG_PRESETS["tiny"]  # hidden 64: not packable
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        assert len(eng.packed) == 0  # falls back to qdq-dense serving
        logits, cache = eng.prefill(ids[:1])
        assert np.isfinite(np.asarray(logits)).all()


class TestGenerateScan:
    def test_scan_matches_loop(self, quantized):
        cfg, params, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        ids = jax.random.randint(jax.random.PRNGKey(9), (2, 4), 0, 128)
        loop = eng.generate(ids, max_new_tokens=6)
        scan = eng.generate_scan(ids, max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(loop), np.asarray(scan))


class TestPackedLmHead:
    def test_quantized_head_packs_and_matches(self):
        cfg = llama.LlamaConfig(vocab_size=256, hidden_size=1024,
                                intermediate_size=1024, num_layers=1,
                                num_heads=4, num_kv_heads=2, rope_theta=1e4,
                                dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 256)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0,
                        quant_lm_head=True).quantize(ids)
        assert "lm_head" in res.layers
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        assert "lm_head" in eng.packed
        # the dense vocab x H copy is freed (largest decode-step HBM read)
        assert eng.params["lm_head"] is None
        q = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 256)
        logits, cache = eng.prefill(q)
        want = llama.model_fwd(res.params, q, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, _ = eng.decode_step(tok, cache)
        seq = jnp.concatenate([q, tok[:, None]], axis=1)
        want2 = llama.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits2, np.float32),
                                   np.asarray(want2, np.float32),
                                   rtol=5e-2, atol=5e-2)


class TestPrefillRouting:
    """Prefill dequant-once routing (AR_PREFILL_DEQUANT_TOKENS) and the
    opt-in int8-MXU prompt mode (prefill_a8)."""

    def test_long_prompt_matches_fake_quant(self, quantized):
        """>=256 tokens routes W4 projections through the dequant-once
        XLA path — which IS the fake-quant forward, so parity must hold
        at fp32-exactness level for f32 models."""
        cfg, params, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=512)
        ids = jax.random.randint(jax.random.PRNGKey(7), (2, 260), 0, 128)
        logits, cache = eng.prefill(ids)
        want = llama.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-3, atol=5e-3)
        assert int(cache.length) == 260

    def test_a8_prompt_close_and_decode_exact(self, quantized):
        """prefill_a8 quantizes prompt activations per-token int8: the
        prompt logits stay close (int8 act error), and the decode path
        is untouched (token-level agreement from the same cache)."""
        cfg, params, res = quantized
        exact = QuantizedLlama.from_quantize_result(res, cfg, max_seq=512)
        a8 = QuantizedLlama.from_quantize_result(res, cfg, max_seq=512)
        a8.prefill_a8 = True
        ids = jax.random.randint(jax.random.PRNGKey(8), (2, 260), 0, 128)
        l_exact, c_exact = exact.prefill(ids)
        l_a8, c_a8 = a8.prefill(ids)
        le = np.asarray(l_exact, np.float32)
        la = np.asarray(l_a8, np.float32)
        # close in logit space relative to the logit scale
        denom = max(1e-6, float(np.abs(le).max()))
        assert float(np.abs(le - la).max()) / denom < 0.05
        # UNCONDITIONAL statistical gate (VERDICT r4 item 3): greedy
        # token agreement over a prompt batch must clear a floor, and
        # the decode step from the shared cache must stay close on the
        # agreeing subset (non-empty by the floor).
        idsN = jax.random.randint(jax.random.PRNGKey(81), (16, 260),
                                  0, 128)
        lN_e, cN_e = exact.prefill(idsN)
        lN_a, cN_a = a8.prefill(idsN)
        tN_e = np.asarray(jnp.argmax(lN_e, -1))
        tN_a = np.asarray(jnp.argmax(lN_a, -1))
        agree = float((tN_e == tN_a).mean())
        assert agree >= 0.8, f"a8 greedy agreement {agree:.2f} < 0.8"
        t_exact = jnp.argmax(l_exact, -1).astype(jnp.int32)
        d_exact, _ = exact.decode_step(t_exact, c_exact)
        d_a8, _ = a8.decode_step(t_exact, c_a8)
        # same input token into both caches -> decode numerics must be
        # close regardless of which token a8 WOULD have picked
        np.testing.assert_allclose(np.asarray(d_a8, np.float32),
                                   np.asarray(d_exact, np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_routing_disabled_by_env(self, quantized, monkeypatch):
        monkeypatch.setenv("AR_PREFILL_DEQUANT_TOKENS", "0")
        cfg, params, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=512)
        ids = jax.random.randint(jax.random.PRNGKey(9), (2, 260), 0, 128)
        logits, _ = eng.prefill(ids)
        want = llama.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
