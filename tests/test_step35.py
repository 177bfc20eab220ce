"""Step-3.5 family: hybrid full/sliding attention with per-type head
counts, dual rope theta + per-type rotary fraction, per-head sigmoid
attention output gate, clamped-SwiGLU MoE with router bias (ref
``modeling/fused_moe/step3_5_moe.py``, ``export_to_gguf/conversion/
step3.py:98``, ``special_model_handler.py`` step3p5 rules).

No public transformers modeling in-container (the reference spec pins
transformers>=5.2); structure and quantization are tested directly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu import AutoRound
from autoround_tpu.models import llama, step35
from autoround_tpu.models.step35 import CONFIG_PRESETS

CFG = CONFIG_PRESETS["tiny-step35"]


class TestStructure:
    def test_fwd_finite(self):
        p = step35.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256)
        y = step35.model_fwd(p, ids, CFG)
        assert y.shape == (2, 16, 256)
        assert np.isfinite(np.asarray(y)).all()

    def test_per_type_head_counts(self):
        cfg = dataclasses.replace(CFG, swa_num_heads=2, swa_num_kv_heads=1)
        p = step35.init_params(cfg, jax.random.PRNGKey(0))
        hd = cfg.hd
        # layer 0 full (4 heads), layer 1 sliding (2 heads)
        assert p["blocks"][0]["q_proj"].shape == (4 * hd, 64)
        assert p["blocks"][1]["q_proj"].shape == (2 * hd, 64)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256)
        y = step35.model_fwd(p, ids, cfg)
        assert np.isfinite(np.asarray(y)).all()

    def test_rotary_fraction_per_type(self):
        """Full layers rotate half the head, sliding layers all of it."""
        cos_full, _ = llama.rope_tables(CFG, 8)
        cos_swa, _ = llama.rope_tables(CFG, 8, local=True)
        assert cos_full.shape[-1] == CFG.hd // 2
        assert cos_swa.shape[-1] == CFG.hd

    def test_swiglu_clamp_binds(self):
        """With a tiny limit the expert output must differ from the
        unclamped one."""
        cfg_unc = dataclasses.replace(CFG, swiglu_limit=0.0,
                                      swiglu_limit_shared=0.0)
        p = step35.init_params(CFG, jax.random.PRNGKey(0))
        h = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 64),
                              jnp.float32) * 50.0
        lf = llama._plain_linear
        tight = dataclasses.replace(CFG, swiglu_limit_shared=0.01)
        y_t = step35._clamped_mlp(p["blocks"][0], h, tight, lf,
                                  tight.swiglu_limit_shared)
        y_u = step35._clamped_mlp(p["blocks"][0], h, cfg_unc, lf, 0.0)
        assert not np.allclose(np.asarray(y_t), np.asarray(y_u))

    def test_router_bias_steers_selection(self):
        """A large router bias on one expert must change the top-k
        selection but NOT the mixing weights' source (unbiased probs)."""
        p = step35.init_params(CFG, jax.random.PRNGKey(0))
        b = dict(p["blocks"][1])
        h = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 64),
                              jnp.float32)
        topi0, _ = step35._route(h, b, CFG)
        b["router_bias"] = b["router_bias"] + 1e3 * jax.nn.one_hot(
            5, CFG.moe_num_experts)
        topi1, topw1 = step35._route(h, b, CFG)
        assert (np.asarray(topi1) == 5).any(axis=-1).all()
        assert not np.array_equal(np.asarray(topi0), np.asarray(topi1))
        # weights renormalize to scaling factor
        np.testing.assert_allclose(
            np.asarray(topw1).sum(-1),
            CFG.moe_router_scaling_factor, rtol=1e-5)

    def test_registry(self):
        from autoround_tpu.models.registry import get_model_fns
        fns = get_model_fns(CFG)
        assert fns.model_fwd is step35.model_fwd
        assert fns.block_fwd_for(CFG, 1) is step35._swa_block_fwd
        assert fns.block_fwd_for(CFG, 0) is step35.block_fwd


class TestQuantize:
    def test_quantize_e2e(self):
        p = step35.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((p, CFG), scheme={"bits": 4, "group_size": 16},
                        iters=2, batch_size=2).quantize(ids)
        names = set(res.layers)
        assert "blocks.0.q_proj" in names
        assert "blocks.1.experts.0.gate_proj" in names
        assert "blocks.1.shared_expert.down_proj" in names
        # g_proj and the router stay FP (reference step3p5 ignore rule)
        assert not any("g_proj" in n for n in names)
        y = step35.model_fwd(res.params, ids, CFG)
        assert np.isfinite(np.asarray(y)).all()


class TestConfigFromHf:
    def test_step3p5_mapping(self):
        from autoround_tpu.utils.hf_loader import config_from_hf
        cfg = config_from_hf({
            "model_type": "step3p5", "vocab_size": 128, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 4,
            "num_attention_heads": 4, "num_attention_groups": 2,
            "head_dim": 16, "rope_theta": [100000.0, 10000.0],
            "sliding_window": 8,
            "layer_types": ["full_attention", "sliding_attention",
                            "full_attention", "sliding_attention"],
            "partial_rotary_factors": [0.5, 1.0, 0.5, 1.0],
            "attention_other_setting": {"num_attention_heads": 2,
                                        "num_attention_groups": 1},
            "moe_layers_enum": "1,2,3", "moe_num_experts": 8,
            "moe_top_k": 2, "moe_intermediate_size": 32,
            "share_expert_dim": 64, "moe_router_scaling_factor": 1.5,
            "use_moe_router_bias": True,
            "swiglu_limits": [None, 7.0, 7.0, 7.0],
            "swiglu_limits_shared": [7.0, 7.0, 7.0, 7.0],
            "num_nextn_predict_layers": 1,
        })
        assert isinstance(cfg, step35.Step35Config)
        assert cfg.rope_theta == 100000.0
        assert cfg.rope_local_theta == 10000.0
        assert cfg.swa_num_heads == 2 and cfg.swa_num_kv_heads == 1
        assert cfg.moe_layers == (1, 2, 3)
        assert cfg.swiglu_limit == 7.0
        assert cfg.partial_rotary_factor == 0.5
        assert cfg.partial_rotary_factor_local == 1.0
        assert cfg.norm_offset == 1.0
        assert cfg.use_moe_router_bias
