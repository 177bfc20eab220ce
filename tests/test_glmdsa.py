"""GLM-5 ``GlmMoeDsa`` family: DSA lightning-indexer sparse attention
over the DeepSeek MLA/MoE base (ref ``modeling/unfused_moe/
glm_moe_dsa.py``, ``algorithms/block_runner.py:81`` prev_topk_indices
chaining, ``special_model_handler.py`` glm5 ignore rules).

No public transformers modeling exists to lock logit parity against;
the numeric anchor is the dense-equivalence property: with
``index_topk >= S`` the DSA mask reduces to pure causal and the block
must match ``deepseek.block_fwd`` exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu import AutoRound
from autoround_tpu.models import deepseek, glmdsa
from autoround_tpu.models.glmdsa import CONFIG_PRESETS

CFG = CONFIG_PRESETS["tiny-glmdsa"]


class TestDsaSemantics:
    def test_dense_equivalence_at_full_topk(self):
        """index_topk >= S ⇒ every causal token selected ⇒ exactly the
        dense MLA block."""
        cfg = dataclasses.replace(CFG, index_topk=64)
        p = glmdsa.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64),
                              jnp.float32)
        cos, sin = deepseek.rope_tables(cfg, 16)
        y_dsa = glmdsa.block_fwd(p["blocks"][1], x, cos, sin, cfg)
        y_dense = deepseek.block_fwd(p["blocks"][1], x, cos, sin, cfg)
        np.testing.assert_allclose(np.asarray(y_dsa), np.asarray(y_dense),
                                   rtol=1e-5, atol=1e-5)

    def test_sparse_differs_from_dense(self):
        p = glmdsa.init_params(CFG, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64),
                              jnp.float32)
        cos, sin = deepseek.rope_tables(CFG, 32)
        y_dsa = glmdsa.block_fwd(p["blocks"][1], x, cos, sin, CFG)
        y_dense = deepseek.block_fwd(p["blocks"][1], x, cos, sin, CFG)
        assert not np.allclose(np.asarray(y_dsa), np.asarray(y_dense),
                               atol=1e-5)

    def test_mask_keeps_topk_and_diagonal(self):
        sc = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))
        m = np.asarray(glmdsa.dsa_mask(sc, 4))[0, 0]   # (S, T)
        kept = m == 0.0
        # causal: nothing above the diagonal
        assert not np.triu(kept, k=1).any()
        # the diagonal always survives
        assert np.diag(kept).all()
        # per query at most topk + 1 kept (+1: forced diagonal)
        assert (kept.sum(axis=1) <= 5).all()
        # late queries keep exactly topk (no unused budget)
        assert kept[-1].sum() >= 4

    def test_index_layer_sharing(self):
        """Shared layers carry a copy of the governing indexer and
        model_fwd threads the governing layer's indices."""
        cfg = dataclasses.replace(CFG, index_layers=(0,))
        p = glmdsa.init_params(cfg, jax.random.PRNGKey(0))
        for n in ("q_proj", "k_proj", "weights_proj"):
            assert n in p["blocks"][1]["indexer"]
            np.testing.assert_array_equal(
                np.asarray(p["blocks"][0]["indexer"][n]),
                np.asarray(p["blocks"][1]["indexer"][n]))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256)
        y = glmdsa.model_fwd(p, ids, cfg)
        assert np.isfinite(np.asarray(y)).all()


class TestQuantize:
    def test_quantize_e2e(self):
        p = glmdsa.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((p, CFG), scheme={"bits": 4, "group_size": 16},
                        iters=2, batch_size=2).quantize(ids)
        names = set(res.layers)
        assert "blocks.1.indexer.q_proj" in names
        assert "blocks.1.experts.0.gate_proj" in names
        # weights_proj is NEVER quantized (reference glm5 ignore rule)
        assert not any("weights_proj" in n for n in names)
        y = glmdsa.model_fwd(res.params, ids, CFG)
        assert np.isfinite(np.asarray(y)).all()


class TestConfigFromHf:
    def test_glm_moe_dsa_mapping(self):
        from autoround_tpu.utils.hf_loader import config_from_hf
        from autoround_tpu.models.glmdsa import GlmMoeDsaConfig
        cfg = config_from_hf({
            "model_type": "glm_moe_dsa", "vocab_size": 128,
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 3, "num_attention_heads": 4,
            "q_lora_rank": 32, "kv_lora_rank": 32,
            "qk_nope_head_dim": 16, "qk_rope_head_dim": 8,
            "v_head_dim": 16, "n_routed_experts": 8,
            "num_experts_per_tok": 2, "moe_intermediate_size": 32,
            "n_shared_experts": 1, "first_k_dense_replace": 1,
            "routed_scaling_factor": 1.8, "n_group": 2, "topk_group": 1,
            "norm_topk_prob": True,
            "index_n_heads": 2, "index_head_dim": 16, "index_topk": 64,
        })
        assert isinstance(cfg, GlmMoeDsaConfig)
        assert cfg.index_n_heads == 2 and cfg.index_topk == 64
        assert cfg.kv_lora_rank == 32

    def test_glm4_moe_lite_mapping(self):
        from autoround_tpu.utils.hf_loader import config_from_hf
        from autoround_tpu.models.glm4moe import GlmMoeLiteConfig
        cfg = config_from_hf({
            "model_type": "glm4_moe_lite", "vocab_size": 128,
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 3, "num_attention_heads": 4,
            "q_lora_rank": 0, "kv_lora_rank": 32,
            "qk_nope_head_dim": 16, "qk_rope_head_dim": 8,
            "v_head_dim": 16, "n_routed_experts": 8,
            "num_experts_per_tok": 2, "moe_intermediate_size": 32,
            "n_shared_experts": 1})
        assert isinstance(cfg, GlmMoeLiteConfig)
        assert cfg.kv_lora_rank == 32


class TestServe:
    def test_serve_warns_dense_attention(self, caplog):
        """The engine serves DSA models with dense MLA attention and
        must say so loudly (the reference is quantize/export-only for
        this family)."""
        import logging
        from autoround_tpu.serve import QuantizedLlama
        p = glmdsa.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 256)
        res = AutoRound((p, CFG), scheme="W4A16", iters=0).quantize(ids)
        with caplog.at_level(logging.WARNING, logger="autoround_tpu"):
            eng = QuantizedLlama.from_quantize_result(res, CFG,
                                                      max_seq=32)
        assert any("DENSE MLA" in r.message for r in caplog.records)
        out = eng.generate(ids, max_new_tokens=4)
        assert out.shape == (2, 4)


class TestCheckpointLoading:
    def test_indexer_keys_and_propagation(self, tmp_path):
        """hf_loader maps self_attn.indexer.* keys and propagates the
        governing indexer into shared-index layers."""
        import json as _json
        from safetensors.numpy import save_file
        from autoround_tpu.utils.hf_loader import load_hf_checkpoint
        cfg = dataclasses.replace(CFG, index_layers=(0,))
        p0 = glmdsa.init_params(cfg, jax.random.PRNGKey(0))
        t = {"model.embed_tokens.weight": np.asarray(p0["embed_tokens"]),
             "model.norm.weight": np.asarray(p0["norm"]),
             "lm_head.weight": np.asarray(p0["lm_head"])}
        from autoround_tpu.utils.hf_loader import _DS_ATTN_MAP
        inv = {v: k for k, v in _DS_ATTN_MAP.items()}
        for li, b in enumerate(p0["blocks"]):
            pre = f"model.layers.{li}."
            for ours, arr in b.items():
                if ours == "indexer":
                    if cfg.layer_has_indexer(li):
                        for n, w in arr.items():
                            t[pre + f"self_attn.indexer.{n}.weight"] = \
                                np.asarray(w)
                elif ours == "experts":
                    for e, ew in enumerate(arr):
                        for wn, w in ew.items():
                            t[pre + f"mlp.experts.{e}.{wn}.weight"] = \
                                np.asarray(w)
                elif ours == "shared_experts":
                    for wn, w in arr.items():
                        t[pre + f"mlp.shared_experts.{wn}.weight"] = \
                            np.asarray(w)
                elif ours == "gate":
                    t[pre + "mlp.gate.weight"] = np.asarray(arr)
                elif ours == "e_score_correction_bias":
                    t[pre + "mlp.gate.e_score_correction_bias"] = \
                        np.asarray(arr)
                elif ours in inv:
                    t[pre + inv[ours]] = np.asarray(arr)
        d = tmp_path / "dsa"
        d.mkdir()
        save_file(t, str(d / "model.safetensors"))
        _json.dump({
            "model_type": "glm_moe_dsa", "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "q_lora_rank": cfg.q_lora_rank,
            "kv_lora_rank": cfg.kv_lora_rank,
            "qk_nope_head_dim": cfg.qk_nope_head_dim,
            "qk_rope_head_dim": cfg.qk_rope_head_dim,
            "v_head_dim": cfg.v_head_dim,
            "n_routed_experts": cfg.n_routed_experts,
            "num_experts_per_tok": cfg.num_experts_per_tok,
            "moe_intermediate_size": cfg.moe_intermediate_size,
            "n_shared_experts": cfg.n_shared_experts,
            "first_k_dense_replace": cfg.first_k_dense,
            "routed_scaling_factor": cfg.routed_scaling_factor,
            "n_group": cfg.n_group, "topk_group": cfg.topk_group,
            "norm_topk_prob": cfg.norm_topk_prob,
            "index_n_heads": cfg.index_n_heads,
            "index_head_dim": cfg.index_head_dim,
            "index_topk": cfg.index_topk,
            "index_layers": list(cfg.index_layers),
            "rms_norm_eps": cfg.rms_eps,
            "rope_theta": cfg.rope_theta,
            "tie_word_embeddings": False}, open(d / "config.json", "w"))
        loaded, cfg2 = load_hf_checkpoint(str(d), dtype=jnp.float32)
        assert cfg2.index_layers == (0,)
        # layer 0 owns the indexer; layer 1/2 carry propagated copies
        for li in range(cfg.num_layers):
            assert "indexer" in loaded["blocks"][li], li
            np.testing.assert_array_equal(
                np.asarray(loaded["blocks"][li]["indexer"]["q_proj"]),
                np.asarray(p0["blocks"][0]["indexer"]["q_proj"]))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                                 cfg.vocab_size)
        y0 = glmdsa.model_fwd(p0, ids, cfg)
        y1 = glmdsa.model_fwd(loaded, ids, cfg2)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-5, atol=1e-5)
