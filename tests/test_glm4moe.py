"""GLM-4.5 (Glm4Moe): GQA with partial rotary + qk-norm + DeepSeek-style
MoE — logit parity vs transformers, quantization, and serving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import glm4moe
from autoround_tpu.utils.hf_loader import load_hf_checkpoint, \
    save_hf_checkpoint


class TestLogitParity:
    def test_parity_vs_transformers(self, tmp_path):
        import torch
        from transformers import Glm4MoeConfig, Glm4MoeForCausalLM
        torch.manual_seed(0)
        hf_cfg = Glm4MoeConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            partial_rotary_factor=0.5, use_qk_norm=True,
            attention_bias=True, n_routed_experts=8,
            num_experts_per_tok=2, n_shared_experts=1,
            first_k_dense_replace=1, routed_scaling_factor=1.5,
            n_group=2, topk_group=1, norm_topk_prob=True,
            rope_scaling=None, attn_implementation="eager")
        model = Glm4MoeForCausalLM(hf_cfg).float().eval()
        with torch.no_grad():
            for layer in model.model.layers[1:]:
                layer.mlp.gate.e_score_correction_bias.normal_(0, 0.5)
        model.save_pretrained(str(tmp_path), safe_serialization=True)
        params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        assert isinstance(cfg, glm4moe.Glm4MoeConfig)
        assert cfg.qk_norm and cfg.partial_rotary_factor == 0.5
        ids = np.random.default_rng(0).integers(0, 256, (2, 12))
        ours = np.asarray(
            glm4moe.model_fwd(params, jnp.asarray(ids), cfg), np.float32)
        with torch.no_grad():
            want = model(torch.tensor(ids, dtype=torch.long)
                         ).logits.float().numpy()
        np.testing.assert_allclose(ours, want, rtol=3e-2, atol=3e-2)


class TestRoundTripAndQuantize:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = glm4moe.CONFIG_PRESETS["tiny-glm4moe"]
        params = glm4moe.init_params(cfg, jax.random.PRNGKey(0))
        save_hf_checkpoint(params, cfg, str(tmp_path))
        params2, cfg2 = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        assert isinstance(cfg2, glm4moe.Glm4MoeConfig)
        assert cfg2.qk_norm and cfg2.kv_lora_rank == 0
        ids = np.random.default_rng(1).integers(0, 256, (1, 8))
        a = glm4moe.model_fwd(params, jnp.asarray(ids), cfg)
        b = glm4moe.model_fwd(params2, jnp.asarray(ids), cfg2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_quantize_and_serve(self):
        from autoround_tpu.serve import QuantizedLlama
        cfg = glm4moe.CONFIG_PRESETS["tiny-glm4moe"]
        params = glm4moe.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        assert "blocks.1.experts.0.gate_proj" in res.layers
        assert "blocks.0.gate_proj" in res.layers
        # serves through the llama cache path (kv_lora_rank=0 → no MLA)
        # with the DeepSeek-style router dispatched by the "gate" key
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        q = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 256)
        logits, cache = eng.prefill(q)
        assert cache.k.shape == (cfg.num_layers, 2, 32, cfg.num_kv_heads,
                                 cfg.hd)
        want = glm4moe.model_fwd(res.params, q, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, _ = eng.decode_step(tok, cache)
        seq = jnp.concatenate([q, tok[:, None]], axis=1)
        want2 = glm4moe.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits2, np.float32),
                                   np.asarray(want2, np.float32),
                                   rtol=5e-2, atol=5e-2)


class TestGlmMoeLite:
    """GLM-4.6-Lite (``Glm4MoeLiteForCausalLM``): DeepSeek-V2
    architecture with GLM vocab — the reference's GGUF converter exports
    it as DEEPSEEK2 (``conversion/glm.py:204``) and its MoE spec is the
    V3 routing verbatim (``unfused_moe/glm_moe_light.py``)."""

    def test_dispatches_through_deepseek(self):
        from autoround_tpu.models import deepseek
        from autoround_tpu.models.glm4moe import GlmMoeLiteConfig
        from autoround_tpu.models.registry import get_model_fns
        cfg = glm4moe.CONFIG_PRESETS["tiny-glmlite"]
        assert isinstance(cfg, GlmMoeLiteConfig)
        assert get_model_fns(cfg).model_fwd is deepseek.model_fwd

    def test_quantize_and_serve_mla(self):
        from autoround_tpu.models import deepseek
        from autoround_tpu.serve import QuantizedLlama
        cfg = glm4moe.CONFIG_PRESETS["tiny-glmlite"]
        params = deepseek.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        assert "blocks.1.experts.0.gate_proj" in res.layers
        assert "blocks.0.q_a_proj" in res.layers
        # kv_lora_rank > 0 → the MLA latent-cache serving path
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        q = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 256)
        logits, cache = eng.prefill(q)
        want = deepseek.model_fwd(res.params, q, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, _ = eng.decode_step(tok, cache)
        seq = jnp.concatenate([q, tok[:, None]], axis=1)
        want2 = deepseek.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits2, np.float32),
                                   np.asarray(want2, np.float32),
                                   rtol=5e-2, atol=5e-2)
