"""Ernie 4.5 MoE family: HF logit parity (bias-steered router, interval
MoE gating, shared experts) and quantization e2e (VERDICT r3 missing #4;
ref ``modeling/unfused_moe/ernie4_5_moe.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import ernie45
from autoround_tpu.models.ernie45 import CONFIG_PRESETS, layer_is_moe

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-ernie45"]


@pytest.fixture(scope="module")
def pair():
    from transformers.models.ernie4_5_moe.configuration_ernie4_5_moe import (
        Ernie4_5_MoeConfig)
    from transformers.models.ernie4_5_moe.modeling_ernie4_5_moe import (
        Ernie4_5_MoeForCausalLM)
    hc = Ernie4_5_MoeConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        moe_intermediate_size=CFG.moe_intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        moe_num_experts=CFG.moe_num_experts, moe_k=CFG.moe_k,
        moe_num_shared_experts=CFG.moe_num_shared_experts,
        moe_layer_start_index=CFG.moe_layer_start_index,
        moe_layer_interval=CFG.moe_layer_interval,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps,
        use_bias=False, tie_word_embeddings=True, pad_token_id=0)
    torch.manual_seed(0)
    hf = Ernie4_5_MoeForCausalLM._from_config(
        hc, attn_implementation="eager").eval()
    # randomize the correction bias — selection-steering is the family's
    # distinctive router feature and bias 0 would hide it
    for li in range(CFG.num_layers):
        mlp = hf.model.layers[li].mlp
        if hasattr(mlp, "moe_statics"):
            mlp.moe_statics.e_score_correction_bias.data = (
                torch.randn(1, CFG.moe_num_experts) * 0.15)

    params = ernie45.init_params(CFG, jax.random.PRNGKey(0))

    def j(t):
        return jnp.asarray(t.detach().float().numpy())

    params["embed_tokens"] = j(hf.model.embed_tokens.weight)
    params["norm"] = j(hf.model.norm.weight)
    for li in range(CFG.num_layers):
        lay = hf.model.layers[li]
        b = params["blocks"][li]
        b["input_layernorm"] = j(lay.input_layernorm.weight)
        b["post_attention_layernorm"] = j(lay.post_attention_layernorm.weight)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            b[n] = j(getattr(lay.self_attn, n).weight)
        if layer_is_moe(CFG, li):
            b["router"] = j(lay.mlp.gate.weight)
            b["e_score_correction_bias"] = j(
                lay.mlp.moe_statics.e_score_correction_bias)[0]
            for e in range(CFG.moe_num_experts):
                for n in ("gate_proj", "up_proj", "down_proj"):
                    b["experts"][e][n] = j(getattr(lay.mlp.experts[e], n)
                                           .weight)
            for n in ("gate_proj", "up_proj", "down_proj"):
                b["shared_experts"][n] = j(
                    getattr(lay.mlp.shared_experts, n).weight)
        else:
            for n in ("gate_proj", "up_proj", "down_proj"):
                b[n] = j(getattr(lay.mlp, n).weight)
    return hf, params


class TestStructure:
    def test_interval_gating(self):
        assert not layer_is_moe(CFG, 0)      # start_index = 1
        assert layer_is_moe(CFG, 1) and layer_is_moe(CFG, 2)
        assert "experts" not in ernie45.init_params(
            CFG, jax.random.PRNGKey(0))["blocks"][0]

    def test_registry(self):
        from autoround_tpu.models.registry import ALL_PRESETS, get_model_fns
        assert "tiny-ernie45" in ALL_PRESETS
        fns = get_model_fns(CFG)
        assert fns.model_fwd is ernie45.model_fwd

    def test_bias_steers_selection_not_weights(self):
        """A large bias on a cold expert must route tokens to it while
        the combine weight still uses the ORIGINAL softmax prob."""
        params = ernie45.init_params(CFG, jax.random.PRNGKey(1))
        b = params["blocks"][1]
        bias = np.zeros(CFG.moe_num_experts, np.float32)
        bias[3] = 10.0                      # force expert 3 into top-k
        b["e_score_correction_bias"] = jnp.asarray(bias)
        h = jax.random.normal(jax.random.PRNGKey(2), (1, 4, CFG.hidden_size))
        from autoround_tpu.models.llama import _plain_linear
        logits = _plain_linear("router", h.astype(jnp.float32),
                               b["router"].astype(jnp.float32))
        probs = jax.nn.softmax(logits, -1)
        biased = probs + jnp.asarray(bias)
        _, topi = jax.lax.top_k(biased, CFG.moe_k)
        assert bool(jnp.all(jnp.any(topi == 3, axis=-1)))
        topv = jnp.take_along_axis(probs, topi, axis=-1)
        # combine weights are the original probs — bounded by softmax
        assert float(jnp.max(topv)) <= 1.0


class TestHFParity:
    def test_logits_match(self, pair):
        hf, params = pair
        ids = np.random.default_rng(5).integers(
            2, CFG.vocab_size, (2, 12)).astype(np.int64)
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(ernie45.model_fwd(
            params, jnp.asarray(ids, jnp.int32), CFG), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestQuantize:
    def test_quantize_e2e_prunes_dense_blocks(self):
        params = ernie45.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((params, CFG), scheme="W4A16G32", iters=2,
                        batch_size=2).quantize(ids)
        names = set(res.layers)
        assert "blocks.0.gate_proj" in names          # dense block
        assert "blocks.1.experts.0.gate_proj" in names
        assert "blocks.1.shared_experts.up_proj" in names
        assert not any(n.startswith("blocks.0.experts") for n in names)
        y = ernie45.model_fwd(res.params, ids, CFG)
        assert np.isfinite(np.asarray(y)).all()
