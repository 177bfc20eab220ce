"""Qwen2.5-Omni (thinker) family: audio-tower parity vs HF
``Qwen2_5OmniAudioEncoder`` (conv1d stack, per-chunk positions,
block-diag chunk attention, avg-pool tail), audio splice, quantize e2e
(ref ``compressors/mllm/template.py:122``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import qwen25omni
from autoround_tpu.models.qwen25omni import CONFIG_PRESETS

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-qwen25omni"]


@pytest.fixture(scope="module")
def audio_pair():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni \
        import Qwen2_5OmniAudioEncoderConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni \
        import Qwen2_5OmniAudioEncoder
    hc = Qwen2_5OmniAudioEncoderConfig(
        d_model=CFG.a_d_model, encoder_layers=CFG.a_layers,
        encoder_attention_heads=CFG.a_heads, encoder_ffn_dim=CFG.a_ffn,
        num_mel_bins=CFG.n_mels, max_source_positions=CFG.a_max_positions,
        scale_embedding=False, activation_function="gelu",
        output_dim=CFG.hidden_size, n_window=CFG.a_n_window,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    torch.manual_seed(0)
    hf = Qwen2_5OmniAudioEncoder._from_config(
        hc, attn_implementation="eager").eval().float()

    at = dict(qwen25omni.init_params(CFG, jax.random.PRNGKey(0))
              ["audio_tower"])

    def j(t):
        return jnp.asarray(t.detach().numpy())

    sd = hf.state_dict()
    at["conv1"], at["conv1_b"] = j(sd["conv1.weight"]), j(sd["conv1.bias"])
    at["conv2"], at["conv2_b"] = j(sd["conv2.weight"]), j(sd["conv2.bias"])
    at["ln_post_g"] = j(sd["ln_post.weight"])
    at["ln_post_b"] = j(sd["ln_post.bias"])
    at["proj"], at["proj_b"] = j(sd["proj.weight"]), j(sd["proj.bias"])
    blocks = []
    for li in range(CFG.a_layers):
        p = f"layers.{li}."
        blocks.append({
            "ln1_g": j(sd[p + "self_attn_layer_norm.weight"]),
            "ln1_b": j(sd[p + "self_attn_layer_norm.bias"]),
            "q_proj": j(sd[p + "self_attn.q_proj.weight"]),
            "q_b": j(sd[p + "self_attn.q_proj.bias"]),
            "k_proj": j(sd[p + "self_attn.k_proj.weight"]),
            # whisper-lineage attention: k_proj has no bias
            "k_b": jnp.zeros((CFG.a_d_model,), jnp.float32),
            "v_proj": j(sd[p + "self_attn.v_proj.weight"]),
            "v_b": j(sd[p + "self_attn.v_proj.bias"]),
            "out_proj": j(sd[p + "self_attn.out_proj.weight"]),
            "out_b": j(sd[p + "self_attn.out_proj.bias"]),
            "ln2_g": j(sd[p + "final_layer_norm.weight"]),
            "ln2_b": j(sd[p + "final_layer_norm.bias"]),
            "fc1": j(sd[p + "fc1.weight"]), "fc1_b": j(sd[p + "fc1.bias"]),
            "fc2": j(sd[p + "fc2.weight"]), "fc2_b": j(sd[p + "fc2.bias"]),
        })
    at["blocks"] = blocks
    return hf, at


class TestAudioParity:
    @pytest.mark.parametrize("n_chunks", [1, 3])
    def test_tower_matches_hf(self, audio_pair, n_chunks):
        hf, at = audio_pair
        T = n_chunks * CFG.a_chunk
        rng = np.random.default_rng(2 + n_chunks)
        mel = rng.standard_normal((T, CFG.n_mels)).astype(np.float32)
        with torch.no_grad():
            want = hf(torch.from_numpy(mel.T),
                      feature_lens=torch.tensor([T]),
                      aftercnn_lens=torch.tensor([T // 2])
                      ).last_hidden_state.numpy()
        got = np.asarray(qwen25omni.audio_fwd(at, jnp.asarray(mel), CFG))
        assert got.shape == want.shape == (CFG.a_tokens_for(T),
                                           CFG.hidden_size)
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


class TestStructure:
    def test_audio_splice_and_registry(self):
        params = qwen25omni.init_params(CFG, jax.random.PRNGKey(0))
        T = CFG.a_chunk
        n_aud = CFG.a_tokens_for(T)
        rng = np.random.default_rng(0)
        S = n_aud + 6
        ids = rng.integers(12, CFG.vocab_size, (1, S)).astype(np.int32)
        ids[0, 2:2 + n_aud] = CFG.audio_token_id
        mel = rng.standard_normal((1, T, CFG.n_mels)).astype(np.float32)
        inputs = {"input_ids": jnp.asarray(ids),
                  "input_features": jnp.asarray(mel)}
        x = qwen25omni.embed_fwd(params, inputs, CFG)
        from autoround_tpu.models import llama
        plain = llama.embed_fwd(params, jnp.asarray(ids), CFG)
        aud = ids[0] == CFG.audio_token_id
        assert not np.allclose(np.asarray(x)[0][aud],
                               np.asarray(plain)[0][aud])
        from autoround_tpu.models.registry import ALL_PRESETS, get_model_fns
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        assert "tiny-qwen25omni" in ALL_PRESETS
        assert get_model_fns(CFG).embed_fwd is qwen25omni.embed_fwd
        assert get_vlm_template(CFG).model_type == "qwen2_5_omni"


class TestQuantize:
    def test_omni_calibration_e2e(self):
        params = qwen25omni.init_params(CFG, jax.random.PRNGKey(0))
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch
        inputs, mask = get_mllm_calib_batch(CFG, nsamples=4, seqlen=24)
        assert (inputs["input_ids"] == CFG.audio_token_id).any()
        assert (inputs["input_ids"] == CFG.image_token_id).any()
        res = AutoRound((params, CFG), scheme={"bits": 4, "group_size": 16},
                        iters=2, batch_size=2,
                        donate_params=False).quantize(inputs, mask=mask)
        assert "blocks.0.q_proj" in res.layers
        y = qwen25omni.model_fwd(res.params, inputs, CFG)
        assert np.isfinite(np.asarray(y)).all()


class TestStateDictLoader:
    """``utils/vlm_loader._audio_tower_from_state`` builds the audio
    tower from the REAL encoder state dict; output must match HF
    (VERDICT r4 item 8 — omni loader path)."""

    def test_audio_tower_from_state(self, audio_pair):
        from autoround_tpu.utils.vlm_loader import _audio_tower_from_state
        hf, _ = audio_pair
        sd = {k: v.detach().float().numpy()
              for k, v in hf.state_dict().items()}
        at = _audio_tower_from_state(sd, CFG, jnp.float32, v3=False)
        assert at is not None
        T = CFG.a_chunk
        rng = np.random.default_rng(11)
        mel = rng.standard_normal((T, CFG.n_mels)).astype(np.float32)
        with torch.no_grad():
            want = hf(torch.from_numpy(mel.T),
                      feature_lens=torch.tensor([T]),
                      aftercnn_lens=torch.tensor([T // 2])
                      ).last_hidden_state.numpy()
        got = np.asarray(qwen25omni.audio_fwd(at, jnp.asarray(mel), CFG))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_full_params_from_state_prefixes(self):
        """thinker.* prefixed keys route to decoder + audio tower."""
        from autoround_tpu.utils.vlm_loader import (
            qwen25omni_params_from_state)
        p0 = qwen25omni.init_params(CFG, jax.random.PRNGKey(3))
        state = {}
        state["thinker.model.embed_tokens.weight"] = np.asarray(
            p0["embed_tokens"])
        state["thinker.model.norm.weight"] = np.asarray(p0["norm"])
        state["thinker.lm_head.weight"] = np.asarray(p0["lm_head"])
        for li, b in enumerate(p0["blocks"]):
            pre = f"thinker.model.layers.{li}."
            for hf_n, ours in (("self_attn.q_proj.weight", "q_proj"),
                               ("self_attn.k_proj.weight", "k_proj"),
                               ("self_attn.v_proj.weight", "v_proj"),
                               ("self_attn.o_proj.weight", "o_proj"),
                               ("mlp.gate_proj.weight", "gate_proj"),
                               ("mlp.up_proj.weight", "up_proj"),
                               ("mlp.down_proj.weight", "down_proj"),
                               ("input_layernorm.weight",
                                "input_layernorm"),
                               ("post_attention_layernorm.weight",
                                "post_attention_layernorm")):
                state[pre + hf_n] = np.asarray(b[ours])
        params = qwen25omni_params_from_state(state, CFG, jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(params["blocks"][0]["q_proj"]),
            np.asarray(p0["blocks"][0]["q_proj"]))
        assert "embed_tokens" in params
