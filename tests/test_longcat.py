"""LongCat-Flash family: HF logit parity (ScMoE shortcut, zero-
computation experts, MLA lora scales) and quantization e2e (ref
``compressors/mllm/template.py:130`` longcat_next)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import longcat
from autoround_tpu.models.longcat import CONFIG_PRESETS

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-longcat"]


@pytest.fixture(scope="module")
def pair():
    from transformers.models.longcat_flash.configuration_longcat_flash \
        import LongcatFlashConfig
    from transformers.models.longcat_flash.modeling_longcat_flash import (
        LongcatFlashForCausalLM)
    hc = LongcatFlashConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        ffn_hidden_size=CFG.intermediate_size,
        expert_ffn_hidden_size=CFG.moe_intermediate_size,
        num_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        n_routed_experts=CFG.n_routed_experts,
        zero_expert_num=CFG.zero_expert_num,
        moe_topk=CFG.num_experts_per_tok,
        routed_scaling_factor=CFG.routed_scaling_factor,
        q_lora_rank=CFG.q_lora_rank, kv_lora_rank=CFG.kv_lora_rank,
        qk_nope_head_dim=CFG.qk_nope_head_dim,
        qk_rope_head_dim=CFG.qk_rope_head_dim,
        v_head_dim=CFG.v_head_dim, head_dim=CFG.qk_rope_head_dim,
        rope_theta=CFG.rope_theta,
        rms_norm_eps=CFG.rms_eps, tie_word_embeddings=False,
        pad_token_id=0)
    torch.manual_seed(0)
    hf = LongcatFlashForCausalLM._from_config(
        hc, attn_implementation="eager").eval().float()
    # randomize correction bias (selection steering is part of the arch)
    for lay in hf.model.layers:
        lay.mlp.router.e_score_correction_bias.data = (
            torch.randn(CFG.total_experts) * 0.1)

    params = longcat.init_params(CFG, jax.random.PRNGKey(0))

    def j(t):
        return jnp.asarray(t.detach().float().numpy())

    params["embed_tokens"] = j(hf.model.embed_tokens.weight)
    params["norm"] = j(hf.model.norm.weight)
    params["lm_head"] = j(hf.lm_head.weight)
    for li in range(CFG.num_layers):
        lay = hf.model.layers[li]
        b = params["blocks"][li]
        for si in (0, 1):
            s = f"_{si}"
            b[f"input_layernorm{s}"] = j(lay.input_layernorm[si].weight)
            b[f"post_attention_layernorm{s}"] = j(
                lay.post_attention_layernorm[si].weight)
            at = lay.self_attn[si]
            b[f"q_a_proj{s}"] = j(at.q_a_proj.weight)
            b[f"q_a_layernorm{s}"] = j(at.q_a_layernorm.weight)
            b[f"q_b_proj{s}"] = j(at.q_b_proj.weight)
            b[f"kv_a_proj_with_mqa{s}"] = j(at.kv_a_proj_with_mqa.weight)
            b[f"kv_a_layernorm{s}"] = j(at.kv_a_layernorm.weight)
            b[f"kv_b_proj{s}"] = j(at.kv_b_proj.weight)
            b[f"o_proj{s}"] = j(at.o_proj.weight)
            for w in ("gate_proj", "up_proj", "down_proj"):
                b[w + s] = j(getattr(lay.mlps[si], w).weight)
        b["router"] = j(lay.mlp.router.classifier.weight)
        b["e_score_correction_bias"] = j(
            lay.mlp.router.e_score_correction_bias)
        for e in range(CFG.n_routed_experts):
            for w in ("gate_proj", "up_proj", "down_proj"):
                b["experts"][e][w] = j(getattr(lay.mlp.experts[e], w)
                                       .weight)
    return hf, params


class TestParity:
    def test_logits_match(self, pair):
        hf, params = pair
        ids = np.random.default_rng(4).integers(
            2, CFG.vocab_size, (2, 10)).astype(np.int64)
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(longcat.model_fwd(
            params, jnp.asarray(ids, jnp.int32), CFG), np.float32)
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


class TestStructure:
    def test_zero_experts_are_identity(self):
        """Routing everything to zero experts must reduce the MoE output
        to (sum of weights) * h."""
        params = longcat.init_params(CFG, jax.random.PRNGKey(1))
        b = params["blocks"][0]
        bias = np.zeros(CFG.total_experts, np.float32)
        bias[CFG.n_routed_experts:] = 100.0    # force zero experts
        b["e_score_correction_bias"] = jnp.asarray(bias)
        h = jax.random.normal(jax.random.PRNGKey(2), (1, 4, CFG.hidden_size))
        from autoround_tpu.models.longcat import _sc_moe
        from autoround_tpu.models.llama import _plain_linear
        out = _sc_moe(b, h, CFG, _plain_linear)
        # out = h * (w_z1 + w_z2): proportional to h per position
        ratio = np.asarray(out) / np.asarray(h)
        assert np.allclose(ratio, ratio[..., :1], atol=1e-5)

    def test_registry(self):
        from autoround_tpu.models.registry import ALL_PRESETS, get_model_fns
        assert "tiny-longcat" in ALL_PRESETS
        assert get_model_fns(CFG).model_fwd is longcat.model_fwd


class TestQuantize:
    def test_quantize_e2e(self):
        params = longcat.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((params, CFG), scheme={"bits": 4, "group_size": 32},
                        iters=2, batch_size=2).quantize(ids)
        names = set(res.layers)
        assert "blocks.0.q_b_proj_0" in names
        assert "blocks.0.kv_b_proj_1" in names
        assert "blocks.0.experts.0.gate_proj" in names
        y = longcat.model_fwd(res.params, ids, CFG)
        assert np.isfinite(np.asarray(y)).all()
