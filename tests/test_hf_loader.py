"""HF checkpoint loader round-trip tests (fabricated checkpoints — no
network in this container)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu.models import llama
from autoround_tpu.utils.hf_loader import (
    config_from_hf,
    load_hf_checkpoint,
    save_hf_checkpoint,
)


class TestHfRoundtrip:
    def test_save_load_llama(self, tmp_path):
        cfg = llama.CONFIG_PRESETS["tiny"]
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        p = save_hf_checkpoint(params, cfg, str(tmp_path / "ckpt"))
        loaded, cfg2 = load_hf_checkpoint(p, dtype=cfg.dtype)
        assert cfg2.num_layers == cfg.num_layers
        assert cfg2.num_kv_heads == cfg.num_kv_heads
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                 cfg.vocab_size)
        l0 = llama.model_fwd(params, ids, cfg)
        l1 = llama.model_fwd(loaded, ids, cfg2)
        np.testing.assert_allclose(np.asarray(l0, np.float32),
                                   np.asarray(l1, np.float32), atol=1e-5)

    def test_save_load_qwen_bias(self, tmp_path):
        cfg = llama.CONFIG_PRESETS["tiny-qwen"]
        params = llama.init_params(cfg, jax.random.PRNGKey(2))
        # give the biases real values so the round-trip is meaningful
        for b in params["blocks"]:
            b["q_bias"] = jax.random.normal(jax.random.PRNGKey(3),
                                            b["q_bias"].shape, cfg.dtype)
        p = save_hf_checkpoint(params, cfg, str(tmp_path / "qwen"))
        loaded, cfg2 = load_hf_checkpoint(p, dtype=cfg.dtype)
        assert cfg2.attn_bias
        np.testing.assert_allclose(
            np.asarray(loaded["blocks"][0]["q_bias"], np.float32),
            np.asarray(params["blocks"][0]["q_bias"], np.float32))

    def test_tied_embeddings(self, tmp_path):
        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=32,
                                intermediate_size=64, num_layers=1,
                                num_heads=2, num_kv_heads=1,
                                tie_embeddings=True, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        assert "lm_head" not in params
        p = save_hf_checkpoint(params, cfg, str(tmp_path / "tied"))
        loaded, cfg2 = load_hf_checkpoint(p, dtype=cfg.dtype)
        assert cfg2.tie_embeddings and "lm_head" not in loaded

    def test_config_from_hf_qwen_detection(self):
        cfg = config_from_hf({
            "model_type": "qwen2", "vocab_size": 100, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "rope_theta": 1e6,
        })
        assert cfg.attn_bias and cfg.num_kv_heads == 4
