"""Qwen3-Omni (thinker) family: audio-tower parity vs HF
``Qwen3OmniMoeAudioEncoder`` (chunked conv2d downsampling, windowed
block-diag attention, Whisper sinusoid positions) plus audio-splice
structure and quantization e2e — the zoo's first AUDIO family (ref
``modeling/fused_moe/qwen3_omni.py``, templates qwen2_5_omni /
qwen3_omni_moe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import qwen3omni
from autoround_tpu.models.qwen3omni import CONFIG_PRESETS

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-qwen3omni"]


@pytest.fixture(scope="module")
def audio_pair():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe \
        import Qwen3OmniMoeAudioEncoderConfig
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe \
        import Qwen3OmniMoeAudioEncoder
    hc = Qwen3OmniMoeAudioEncoderConfig(
        d_model=CFG.a_d_model, encoder_layers=CFG.a_layers,
        encoder_attention_heads=CFG.a_heads,
        encoder_ffn_dim=CFG.a_ffn, num_mel_bins=CFG.n_mels,
        max_source_positions=CFG.a_max_positions, scale_embedding=False,
        activation_function="gelu", output_dim=CFG.hidden_size,
        downsample_hidden_size=CFG.a_downsample_hidden,
        n_window=CFG.a_n_window, n_window_infer=CFG.a_n_window_infer,
        conv_chunksize=500, attention_dropout=0.0, dropout=0.0,
        activation_dropout=0.0)
    torch.manual_seed(0)
    hf = Qwen3OmniMoeAudioEncoder._from_config(
        hc, attn_implementation="eager").eval().float()

    at = dict(qwen3omni.init_params(CFG, jax.random.PRNGKey(0))
              ["audio_tower"])

    def j(t):
        return jnp.asarray(t.detach().numpy())

    sd = hf.state_dict()
    at["conv1"], at["conv1_b"] = j(sd["conv2d1.weight"]), j(sd["conv2d1.bias"])
    at["conv2"], at["conv2_b"] = j(sd["conv2d2.weight"]), j(sd["conv2d2.bias"])
    at["conv3"], at["conv3_b"] = j(sd["conv2d3.weight"]), j(sd["conv2d3.bias"])
    at["conv_out"] = j(sd["conv_out.weight"])
    at["ln_post_g"], at["ln_post_b"] = j(sd["ln_post.weight"]), j(
        sd["ln_post.bias"])
    at["proj1"], at["proj1_b"] = j(sd["proj1.weight"]), j(sd["proj1.bias"])
    at["proj2"], at["proj2_b"] = j(sd["proj2.weight"]), j(sd["proj2.bias"])
    blocks = []
    for li in range(CFG.a_layers):
        p = f"layers.{li}."
        blocks.append({
            "ln1_g": j(sd[p + "self_attn_layer_norm.weight"]),
            "ln1_b": j(sd[p + "self_attn_layer_norm.bias"]),
            "q_proj": j(sd[p + "self_attn.q_proj.weight"]),
            "q_b": j(sd[p + "self_attn.q_proj.bias"]),
            "k_proj": j(sd[p + "self_attn.k_proj.weight"]),
            "k_b": j(sd[p + "self_attn.k_proj.bias"]),
            "v_proj": j(sd[p + "self_attn.v_proj.weight"]),
            "v_b": j(sd[p + "self_attn.v_proj.bias"]),
            "out_proj": j(sd[p + "self_attn.out_proj.weight"]),
            "out_b": j(sd[p + "self_attn.out_proj.bias"]),
            "ln2_g": j(sd[p + "final_layer_norm.weight"]),
            "ln2_b": j(sd[p + "final_layer_norm.bias"]),
            "fc1": j(sd[p + "fc1.weight"]),
            "fc1_b": j(sd[p + "fc1.bias"]),
            "fc2": j(sd[p + "fc2.weight"]),
            "fc2_b": j(sd[p + "fc2.bias"]),
        })
    at["blocks"] = blocks
    return hf, at


class TestAudioParity:
    @pytest.mark.parametrize("n_chunks", [1, 2])
    def test_tower_matches_hf(self, audio_pair, n_chunks):
        """1 chunk (single window) and 2 chunks (one infer window) —
        where HF's EAGER path (which ignores cu_seqlens; only FA2
        honors them) coincides with the windowed architecture."""
        hf, at = audio_pair
        T = n_chunks * CFG.a_chunk
        rng = np.random.default_rng(2 + n_chunks)
        mel = rng.standard_normal((T, CFG.n_mels)).astype(np.float32)
        with torch.no_grad():
            want = hf(torch.from_numpy(mel.T),
                      feature_lens=torch.tensor([T])
                      ).last_hidden_state.numpy()
        got = np.asarray(qwen3omni.audio_fwd(at, jnp.asarray(mel), CFG))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


    def test_window_independence(self, audio_pair):
        """4 chunks = two infer windows: block-diag attention means
        window 0's tokens are INVARIANT to window 1's content (the
        architectural property HF's FA2 cu_seqlens path implements)."""
        _, at = audio_pair
        T = 4 * CFG.a_chunk
        rng = np.random.default_rng(9)
        mel = rng.standard_normal((T, CFG.n_mels)).astype(np.float32)
        mel2 = mel.copy()
        mel2[2 * CFG.a_chunk:] = rng.standard_normal(
            (2 * CFG.a_chunk, CFG.n_mels))
        y1 = np.asarray(qwen3omni.audio_fwd(at, jnp.asarray(mel), CFG))
        y2 = np.asarray(qwen3omni.audio_fwd(at, jnp.asarray(mel2), CFG))
        half = CFG.a_tokens_for(2 * CFG.a_chunk)
        np.testing.assert_allclose(y1[:half], y2[:half], rtol=1e-6)
        assert not np.allclose(y1[half:], y2[half:])


class TestStructure:
    def test_audio_splice(self):
        params = qwen3omni.init_params(CFG, jax.random.PRNGKey(0))
        T = CFG.a_chunk
        n_aud = CFG.a_tokens_for(T)
        rng = np.random.default_rng(0)
        S = n_aud + 6
        ids = rng.integers(10, CFG.vocab_size, (1, S)).astype(np.int32)
        ids[0, 2:2 + n_aud] = CFG.audio_token_id
        mel = rng.standard_normal((1, T, CFG.n_mels)).astype(np.float32)
        inputs = {"input_ids": jnp.asarray(ids),
                  "input_features": jnp.asarray(mel)}
        x = qwen3omni.embed_fwd(params, inputs, CFG)
        from autoround_tpu.models import llama
        plain = llama.embed_fwd(params, jnp.asarray(ids), CFG)
        xa, pa = np.asarray(x)[0], np.asarray(plain)[0]
        aud = ids[0] == CFG.audio_token_id
        assert not np.allclose(xa[aud], pa[aud])
        np.testing.assert_allclose(xa[~aud], pa[~aud], rtol=1e-6)

    def test_registry_and_template(self):
        from autoround_tpu.models.registry import ALL_PRESETS, get_model_fns
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        assert "tiny-qwen3omni" in ALL_PRESETS
        fns = get_model_fns(CFG)
        assert fns.embed_fwd is qwen3omni.embed_fwd
        assert get_vlm_template(CFG).model_type == "qwen3_omni_moe"


class TestQuantize:
    def test_omni_calibration_e2e(self):
        """Image + audio calibration batch through the MoE decoder."""
        params = qwen3omni.init_params(CFG, jax.random.PRNGKey(0))
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch
        inputs, mask = get_mllm_calib_batch(CFG, nsamples=4, seqlen=24)
        assert (inputs["input_ids"] == CFG.audio_token_id).any()
        res = AutoRound((params, CFG), scheme={"bits": 4, "group_size": 16},
                        iters=2, batch_size=2,
                        donate_params=False).quantize(inputs, mask=mask)
        assert "blocks.0.experts.0.w1" in res.layers
        y = qwen3omni.model_fwd(res.params, inputs, CFG)
        assert np.isfinite(np.asarray(y)).all()


class TestStateDictLoader:
    """``_audio_tower_from_state(v3=True)`` against the REAL Qwen3-Omni
    audio encoder state dict (VERDICT r4 item 8)."""

    def test_audio_tower_from_state(self, audio_pair):
        from autoround_tpu.utils.vlm_loader import _audio_tower_from_state
        hf, at_ref = audio_pair
        sd = {k: v.detach().float().numpy()
              for k, v in hf.state_dict().items()}
        at = _audio_tower_from_state(sd, CFG, jnp.float32, v3=True)
        assert at is not None
        for k in at_ref:
            if k == "blocks":
                continue
            np.testing.assert_array_equal(np.asarray(at[k]),
                                          np.asarray(at_ref[k]), err_msg=k)
        for li, (b, br) in enumerate(zip(at["blocks"], at_ref["blocks"])):
            for k in br:
                np.testing.assert_array_equal(
                    np.asarray(b[k]), np.asarray(br[k]),
                    err_msg=f"blocks.{li}.{k}")
