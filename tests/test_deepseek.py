"""DeepSeek V2/V3 family: MLA + DeepSeek-MoE logit parity vs transformers,
HF checkpoint loading, and end-to-end quantization over heterogeneous
blocks (dense first_k layers + MoE rest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import deepseek
from autoround_tpu.utils.hf_loader import load_hf_checkpoint, \
    save_hf_checkpoint


def _hf_logits(model, ids):
    import torch
    with torch.no_grad():
        out = model(torch.tensor(np.asarray(ids), dtype=torch.long))
    return out.logits.float().numpy()


class TestLogitParity:
    @pytest.mark.parametrize("ver", ["v3", "v2"])
    def test_parity_vs_transformers(self, tmp_path, ver):
        import torch
        torch.manual_seed(0)
        common = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=4,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, n_routed_experts=8, num_experts_per_tok=2,
            first_k_dense_replace=1, rope_scaling=None,
            attention_bias=False, attn_implementation="eager")
        if ver == "v3":
            from transformers import DeepseekV3Config, DeepseekV3ForCausalLM
            hf_cfg = DeepseekV3Config(
                q_lora_rank=32, n_shared_experts=1,
                routed_scaling_factor=2.5, n_group=2, topk_group=1,
                norm_topk_prob=True, **common)
            model = DeepseekV3ForCausalLM(hf_cfg)
            # nonzero aux-free bias exercises the noaux_tc selection path
            with torch.no_grad():
                for layer in model.model.layers[1:]:
                    layer.mlp.gate.e_score_correction_bias.normal_(0, 0.5)
        else:
            from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
            hf_cfg = DeepseekV2Config(
                q_lora_rank=None, n_shared_experts=2,
                routed_scaling_factor=1.0, topk_method="greedy",
                n_group=1, topk_group=1, norm_topk_prob=False, **common)
            model = DeepseekV2ForCausalLM(hf_cfg)
        model = model.float().eval()
        model.save_pretrained(str(tmp_path), safe_serialization=True)
        params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        assert isinstance(cfg, deepseek.DeepseekConfig)
        assert (cfg.q_lora_rank > 0) == (ver == "v3")
        ids = np.random.default_rng(0).integers(0, 256, (2, 12))
        ours = np.asarray(
            deepseek.model_fwd(params, jnp.asarray(ids), cfg), np.float32)
        want = _hf_logits(model, ids)
        np.testing.assert_allclose(ours, want, rtol=3e-2, atol=3e-2)


class TestRoundTrip:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = deepseek.CONFIG_PRESETS["tiny-deepseek"]
        params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
        save_hf_checkpoint(params, cfg, str(tmp_path))
        params2, cfg2 = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        assert cfg2.scoring_func == "sigmoid"
        assert cfg2.n_group == cfg.n_group
        ids = np.random.default_rng(1).integers(0, 256, (1, 8))
        a = deepseek.model_fwd(params, jnp.asarray(ids), cfg)
        b = deepseek.model_fwd(params2, jnp.asarray(ids), cfg2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


class TestQuantize:
    def test_quantize_heterogeneous_blocks(self):
        cfg = deepseek.CONFIG_PRESETS["tiny-deepseek"]
        params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=2,
                        batch_size=4).quantize(ids)
        # dense first block quantizes its MLP; MoE blocks their experts
        assert "blocks.0.gate_proj" in res.layers
        assert "blocks.1.experts.0.gate_proj" in res.layers
        assert "blocks.1.shared_experts.down_proj" in res.layers
        assert not any(k.startswith("blocks.0.experts") for k in res.layers)
        assert "blocks.0.kv_b_proj" in res.layers  # MLA projections tune
        # qdq model still runs and quantization damage is bounded
        ours = deepseek.model_fwd(res.params, ids[:1], cfg)
        ref = deepseek.model_fwd(params, ids[:1], cfg)
        rms = float(jnp.sqrt(jnp.mean(
            (ours.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2)))
        scale = float(jnp.sqrt(jnp.mean(ref.astype(jnp.float32) ** 2)))
        assert rms < 0.5 * scale

    def test_tuning_improves_loss(self):
        cfg = deepseek.CONFIG_PRESETS["tiny-deepseek-v2"]
        params = deepseek.init_params(cfg, jax.random.PRNGKey(2))
        ids = jax.random.randint(jax.random.PRNGKey(3), (8, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W2A16G64", iters=20,
                        batch_size=4).quantize(ids)
        assert res.layers


class TestMlaServing:
    @pytest.fixture(scope="class")
    def quantized(self):
        cfg = deepseek.CONFIG_PRESETS["tiny-deepseek"]
        params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        return cfg, res

    def test_compressed_cache_shape(self, quantized):
        from autoround_tpu.serve import QuantizedLlama
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 256)
        logits, cache = eng.prefill(ids)
        # latent cache: (L, B, T, 1, r) + (L, B, T, 1, dr)
        assert cache.k.shape == (cfg.num_layers, 2, 32, 1, cfg.kv_lora_rank)
        assert cache.v.shape == (cfg.num_layers, 2, 32, 1,
                                 cfg.qk_rope_head_dim)

    def test_prefill_and_decode_match_model_fwd(self, quantized):
        from autoround_tpu.serve import QuantizedLlama
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, 256)
        logits, cache = eng.prefill(ids)
        want = deepseek.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
        # absorbed-latent decode step vs full forward over the extended seq
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, cache2 = eng.decode_step(tok, cache)
        seq = jnp.concatenate([ids, tok[:, None]], axis=1)
        want2 = deepseek.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits2, np.float32),
                                   np.asarray(want2, np.float32),
                                   rtol=5e-2, atol=5e-2)
        assert int(cache2.length) == 9

    def test_generate_scan(self, quantized):
        from autoround_tpu.serve import QuantizedLlama
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 4), 0, 256)
        out = eng.generate_scan(ids, max_new_tokens=6)
        out2 = eng.generate(ids, max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    @pytest.mark.parametrize("kv_quant", ["int8", "fp8"])
    def test_quantized_latent_cache(self, quantized, kv_quant):
        from autoround_tpu.serve import QuantizedLlama
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32,
                                                  kv_quant=kv_quant)
        ids = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0, 256)
        logits, cache = eng.prefill(ids)
        assert cache.k.dtype == (jnp.int8 if kv_quant == "int8"
                                 else jnp.float8_e4m3fn)
        want = deepseek.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=3e-1, atol=3e-1)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, _ = eng.decode_step(tok, cache)
        seq = jnp.concatenate([ids, tok[:, None]], axis=1)
        want2 = deepseek.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits2, np.float32),
                                   np.asarray(want2, np.float32),
                                   rtol=3e-1, atol=3e-1)
        # greedy decisions should survive int8 latents on this tiny model
        assert (jnp.argmax(logits2, -1) == jnp.argmax(want2, -1)).all()


class TestCapacityDispatch:
    def test_capacity_matches_dense_at_high_factor(self, monkeypatch):
        """With capacity >= all routed tokens, dispatch equals
        dense-then-mask exactly (no drops)."""
        from autoround_tpu.models.deepseek import _moe_mlp
        cfg = deepseek.CONFIG_PRESETS["tiny-deepseek"]
        params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
        w = params["blocks"][1]
        h = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 64),
                              jnp.float32)
        lf = lambda name, x, ww, b=None: jnp.einsum("...i,oi->...o", x, ww)
        dense = _moe_mlp(w, h, cfg, lf)
        cap = _moe_mlp(w, h, cfg, lf, capacity_factor=8.0)
        np.testing.assert_allclose(np.asarray(cap), np.asarray(dense),
                                   rtol=1e-4, atol=1e-5)


class TestMlaContinuousBatching:
    def test_slots_match_single_requests(self):
        from autoround_tpu.serve import QuantizedLlama
        from autoround_tpu.serve.batching import ContinuousBatchingEngine
        cfg = deepseek.CONFIG_PRESETS["tiny-deepseek"]
        params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        cb = ContinuousBatchingEngine(eng, max_batch=4, max_seq=64,
                                      prompt_buckets=(8, 16))
        # compressed latent cache in the slot buffer
        assert cb.cache.k.shape[-1] == cfg.kv_lora_rank
        prompts = [[3, 5, 7], [11, 2, 9, 4, 1]]
        rids = [cb.submit(p, max_new_tokens=5) for p in prompts]
        while cb.pending():
            cb.step()
        for p, rid in zip(prompts, rids):
            want = np.asarray(eng.generate(
                jnp.asarray([p], jnp.int32), max_new_tokens=5))[0]
            got = np.asarray(cb.result(rid))
            np.testing.assert_array_equal(got, want)
