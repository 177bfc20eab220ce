"""GPT-OSS family: attention sinks + sliding window + clamped-SwiGLU MoE
+ YaRN rope — logit parity vs transformers, fused-expert checkpoint
splitting, and end-to-end quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import gptoss
from autoround_tpu.utils.hf_loader import load_hf_checkpoint


def _make_hf(tmp_path, yarn: bool):
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM
    torch.manual_seed(0)
    rope_scaling = (dict(rope_type="yarn", factor=2.0, beta_fast=32.0,
                         beta_slow=1.0, truncate=False,
                         original_max_position_embeddings=16)
                    if yarn else None)
    hf_cfg = GptOssConfig(
        vocab_size=256, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, rope_scaling=rope_scaling,
        attn_implementation="eager")
    model = GptOssForCausalLM(hf_cfg).float().eval()
    with torch.no_grad():
        # nonzero sinks exercise the sink-softmax path
        for layer in model.model.layers:
            layer.self_attn.sinks.normal_(0, 1.0)
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


class TestLogitParity:
    @pytest.mark.parametrize("yarn", [False, True])
    def test_parity_vs_transformers(self, tmp_path, yarn):
        import torch
        model = _make_hf(tmp_path, yarn)
        params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        assert isinstance(cfg, gptoss.GptOssConfig)
        assert (cfg.yarn_factor > 0) == yarn
        # per-expert split happened (fused gate_up interleave undone)
        assert params["blocks"][0]["experts"][0]["gate_proj"].shape == (64, 64)
        # S > sliding_window so even layers exercise the window mask
        ids = np.random.default_rng(0).integers(0, 256, (2, 12))
        ours = np.asarray(
            gptoss.model_fwd(params, jnp.asarray(ids), cfg), np.float32)
        with torch.no_grad():
            want = model(torch.tensor(ids, dtype=torch.long)
                         ).logits.float().numpy()
        np.testing.assert_allclose(ours, want, rtol=3e-2, atol=3e-2)


class TestQuantize:
    def test_quantize_tiny_gptoss(self):
        cfg = gptoss.CONFIG_PRESETS["tiny-gptoss"]
        params = gptoss.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=2,
                        batch_size=4).quantize(ids)
        assert "blocks.0.experts.0.gate_proj" in res.layers
        assert "blocks.1.o_proj" in res.layers
        out = gptoss.model_fwd(res.params, ids[:1], cfg)
        assert np.isfinite(np.asarray(out)).all()


class TestGptOssServing:
    @pytest.fixture(scope="class")
    def quantized(self):
        cfg = gptoss.CONFIG_PRESETS["tiny-gptoss"]
        params = gptoss.init_params(cfg, jax.random.PRNGKey(0))
        # nonzero sinks so the sink-softmax path actually matters
        for b in params["blocks"]:
            b["sinks"] = jax.random.normal(jax.random.PRNGKey(7),
                                           (cfg.num_heads,), jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        return cfg, res

    @pytest.mark.parametrize("kv_quant", [None, "int8"])
    def test_prefill_decode_match_model_fwd(self, quantized, kv_quant):
        from autoround_tpu.serve import QuantizedLlama
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32,
                                                  kv_quant=kv_quant)
        # S=12 > sliding_window=8: even layers exercise the window
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 256)
        logits, cache = eng.prefill(ids)
        want = gptoss.model_fwd(res.params, ids, cfg)[:, -1]
        tol = 5e-2 if kv_quant is None else 2e-1  # int8 KV rounding
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=tol, atol=tol)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, _ = eng.decode_step(tok, cache)
        seq = jnp.concatenate([ids, tok[:, None]], axis=1)
        want2 = gptoss.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits2, np.float32),
                                   np.asarray(want2, np.float32),
                                   rtol=tol, atol=tol)

    def test_continuous_batching(self, quantized):
        from autoround_tpu.serve import QuantizedLlama
        from autoround_tpu.serve.batching import ContinuousBatchingEngine
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        cb = ContinuousBatchingEngine(eng, max_batch=2, max_seq=64,
                                      prompt_buckets=(16,))
        prompts = [[3, 5, 7, 2, 9, 11, 1, 8, 6, 4], [12, 4, 9]]
        rids = [cb.submit(p, max_new_tokens=4) for p in prompts]
        while cb.pending():
            cb.step()
        for p, rid in zip(prompts, rids):
            want = np.asarray(eng.generate(
                jnp.asarray([p], jnp.int32), max_new_tokens=4))[0]
            np.testing.assert_array_equal(np.asarray(cb.result(rid)), want)


class TestGroupedExpertServing:
    """GPT-OSS experts (with per-expert biases) stack into the grouped
    MoE kernel payload; biases stack separately and add to the slab."""

    @pytest.fixture(scope="class")
    def engine(self):
        from autoround_tpu.serve import QuantizedLlama
        # kernel-sized dims (K % 1024 == 0, O % 256 == 0): the tiny
        # preset's 64-wide layers fall below the packing constraints
        cfg = gptoss.GptOssConfig(
            vocab_size=128, hidden_size=1024, intermediate_size=1024,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            rope_theta=1e4, attn_bias=True, sliding_window=8,
            num_experts=4, top_k=2, dtype=jnp.float32)
        params = gptoss.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        return cfg, res, eng

    def test_experts_stacked(self, engine):
        cfg, res, eng = engine
        stacked = sorted(k for k in eng.packed if "experts_stack" in k)
        assert len(stacked) == 3 * cfg.num_layers
        assert not any(".experts." in k for k in eng.packed)

    def test_grouped_parity(self, engine):
        cfg, res, eng = engine
        ids = jax.random.randint(jax.random.PRNGKey(5), (2, 12), 0,
                                  cfg.vocab_size)
        logits, _ = eng.prefill(ids)
        want = gptoss.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_capacity_dispatch(self, engine, monkeypatch):
        from autoround_tpu import envs
        cfg, res, eng = engine
        monkeypatch.setattr(envs, "AR_MOE_CAPACITY_FACTOR", 4.0)
        ids = jax.random.randint(jax.random.PRNGKey(6), (2, 12), 0,
                                  cfg.vocab_size)
        logits, cache = jax.jit(eng._prefill_impl)(eng.params, eng.packed,
                                                   ids)
        want = gptoss.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
