"""Gemma3: dual rope (local base freq on sliding layers + linear-scaled
global), arbitrary sliding patterns via layer_types, Gemma-style q/k
norms — logit parity vs transformers, quantization, serving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.utils.hf_loader import load_hf_checkpoint


class TestLogitParity:
    def test_parity_vs_transformers(self, tmp_path):
        import torch
        from transformers import Gemma3ForCausalLM, Gemma3TextConfig
        torch.manual_seed(0)
        hf_cfg = Gemma3TextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            query_pre_attn_scalar=16, sliding_window=8,
            layer_types=["sliding_attention", "sliding_attention",
                         "full_attention"],
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
            rope_scaling={"rope_type": "linear", "factor": 8.0},
            attn_implementation="eager")
        model = Gemma3ForCausalLM(hf_cfg).float().eval()
        model.save_pretrained(str(tmp_path), safe_serialization=True)
        params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        assert cfg.rope_local_theta == 10000.0
        assert cfg.rope_scaling_factor == 8.0
        assert cfg.layer_types == ("sliding_attention",
                                   "sliding_attention", "full_attention")
        assert cfg.qk_norm and cfg.sandwich_norms
        # S=12 > window=8: sliding layers exercise both the mask AND the
        # local rope tables
        ids = np.random.default_rng(0).integers(0, 256, (2, 12))
        ours = np.asarray(
            llama.model_fwd(params, jnp.asarray(ids), cfg), np.float32)
        with torch.no_grad():
            want = model(torch.tensor(ids, dtype=torch.long)
                         ).logits.float().numpy()
        np.testing.assert_allclose(ours, want, rtol=3e-2, atol=3e-2)


class TestQuantizeAndServe:
    def test_quantize_and_serve(self):
        from autoround_tpu.serve import QuantizedLlama
        cfg = llama.CONFIG_PRESETS["tiny-gemma3"]
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=2,
                        batch_size=4).quantize(ids)
        assert res.layers
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        q = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, 256)
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

    def test_continuous_batching(self):
        from autoround_tpu.serve import QuantizedLlama
        from autoround_tpu.serve.batching import ContinuousBatchingEngine
        cfg = llama.CONFIG_PRESETS["tiny-gemma3"]
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 256)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        cb = ContinuousBatchingEngine(eng, max_batch=2, max_seq=64,
                                      prompt_buckets=(16,))
        prompts = [[3, 5, 7, 2, 9, 11, 1, 8, 6, 4],
                   [12, 4, 9]]
        rids = [cb.submit(p, max_new_tokens=4) for p in prompts]
        while cb.pending():
            cb.step()
        for p, rid in zip(prompts, rids):
            want = np.asarray(eng.generate(
                jnp.asarray([p], jnp.int32), max_new_tokens=4))[0]
            np.testing.assert_array_equal(np.asarray(cb.result(rid)), want)
