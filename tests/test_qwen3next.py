"""Qwen3-Next: hybrid GatedDeltaNet linear attention + gated full
attention + Qwen-MoE — logit parity vs transformers and quantization
over the hybrid stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import qwen3next
from autoround_tpu.utils.hf_loader import load_hf_checkpoint


class TestLogitParity:
    def test_parity_vs_transformers(self, tmp_path):
        import torch
        from transformers import Qwen3NextConfig, Qwen3NextForCausalLM
        torch.manual_seed(0)
        hf_cfg = Qwen3NextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            partial_rotary_factor=0.25, rope_theta=10000.0,
            layer_types=["linear_attention", "linear_attention",
                         "linear_attention", "full_attention"],
            linear_num_key_heads=2, linear_num_value_heads=4,
            linear_key_head_dim=16, linear_value_head_dim=16,
            linear_conv_kernel_dim=4,
            num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
            shared_expert_intermediate_size=64, norm_topk_prob=True,
            mlp_only_layers=[], attn_implementation="eager")
        model = Qwen3NextForCausalLM(hf_cfg).float().eval()
        model.save_pretrained(str(tmp_path), safe_serialization=True)
        params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        assert isinstance(cfg, qwen3next.Qwen3NextConfig)
        assert cfg.layer_types[:2] == ("linear_attention",
                                       "linear_attention")
        assert params["blocks"][0]["conv1d"].shape == (
            2 * 2 * 16 + 4 * 16, 4)
        assert "in_proj_qkvz" in params["blocks"][0]
        assert "q_proj" in params["blocks"][3]
        ids = np.random.default_rng(0).integers(0, 256, (2, 20))
        ours = np.asarray(
            qwen3next.model_fwd(params, jnp.asarray(ids), cfg),
            np.float32)
        with torch.no_grad():
            want = model(torch.tensor(ids, dtype=torch.long)
                         ).logits.float().numpy()
        np.testing.assert_allclose(ours, want, rtol=3e-2, atol=3e-2)


class TestQuantize:
    def test_quantize_hybrid_stack(self):
        cfg = qwen3next.CONFIG_PRESETS["tiny-qwen3next"]
        params = qwen3next.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=2,
                        batch_size=4).quantize(ids)
        # linear-attention projections quantize alongside experts and
        # the full-attention layer's q/k/v/o
        assert "blocks.0.in_proj_qkvz" in res.layers
        assert "blocks.0.out_proj" in res.layers
        assert "blocks.0.in_proj_ba" not in res.layers  # gates stay FP
        assert "blocks.3.q_proj" in res.layers
        assert "blocks.0.experts.0.w1" in res.layers
        assert not any(k.startswith("blocks.0.q_proj") for k in res.layers)
        ours = qwen3next.model_fwd(res.params, ids[:1], cfg)
        ref = qwen3next.model_fwd(params, ids[:1], cfg)
        rms = float(jnp.sqrt(jnp.mean(
            (ours.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2)))
        scale = float(jnp.sqrt(jnp.mean(ref.astype(jnp.float32) ** 2)))
        # looser bound than the attention-only families: the delta-rule
        # recurrence compounds weight perturbations across the sequence
        # on this random-init tiny model (smoke bound, not accuracy)
        assert rms < 0.6 * scale

    def test_delta_rule_chunk_invariance(self):
        """The chunked gated delta rule must not depend on the chunk
        size (pure algebraic reformulation of the recurrence)."""
        key = jax.random.PRNGKey(0)
        B, S, H, dk, dv = 2, 24, 3, 8, 8
        q = jax.random.normal(key, (B, S, H, dk), jnp.float32)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, dk))
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, H, dv))
        g = -jax.nn.softplus(
            jax.random.normal(jax.random.fold_in(key, 3), (B, S, H)))
        beta = jax.nn.sigmoid(
            jax.random.normal(jax.random.fold_in(key, 4), (B, S, H)))
        y8 = qwen3next.chunk_gated_delta_rule(q, k, v, g, beta, chunk=8)
        y4 = qwen3next.chunk_gated_delta_rule(q, k, v, g, beta, chunk=4)
        y24 = qwen3next.chunk_gated_delta_rule(q, k, v, g, beta, chunk=24)
        np.testing.assert_allclose(np.asarray(y8), np.asarray(y4),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(y8), np.asarray(y24),
                                   rtol=2e-4, atol=2e-4)


class TestServing:
    @pytest.fixture(scope="class")
    def quantized(self):
        cfg = qwen3next.CONFIG_PRESETS["tiny-qwen3next"]
        params = qwen3next.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        return cfg, res

    def test_prefill_decode_match_model_fwd(self, quantized):
        from autoround_tpu.serve import QuantizedLlama
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 256)
        logits, cache = eng.prefill(ids)
        # hybrid cache: 1 full layer KV buffer, 3 linear states
        assert cache.k.shape[0] == 1 and cache.state.shape[0] == 3
        assert cache.conv.shape[2] == cfg.linear_conv_kernel_dim - 1
        want = qwen3next.model_fwd(res.params, ids, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)
        # O(1) recurrent decode steps track the full forward
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq = ids
        for _ in range(3):
            logits, cache = eng.decode_step(tok, cache)
            seq = jnp.concatenate([seq, tok[:, None]], axis=1)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        want2 = qwen3next.model_fwd(res.params, seq, cfg)[:, -1]
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(want2, np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_generate_scan(self, quantized):
        from autoround_tpu.serve import QuantizedLlama
        cfg, res = quantized
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 4), 0, 256)
        out = eng.generate_scan(ids, max_new_tokens=6)
        out2 = eng.generate(ids, max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
