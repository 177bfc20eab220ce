"""Gemma3-VL family: logit parity vs HF transformers (eager) and
quantization e2e.

Parity covers: SigLIP tower (no class token, biased qkv/proj/fc,
gelu-tanh MLP, post layernorm), the avg-pool + Gemma-RMSNorm + bias-free
projection of Gemma3MultiModalProjector, image-token splicing AFTER the
embed normalizer, and the gemma3 decoder (sandwich norms, qk-norm, dual
local/global rope, sliding pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import gemma3vl
from autoround_tpu.models.gemma3vl import CONFIG_PRESETS

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-gemma3vl"]


def _hf_model(seed=0):
    from transformers import (Gemma3Config, Gemma3ForConditionalGeneration,
                              Gemma3TextConfig)
    tc = Gemma3TextConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads, head_dim=CFG.hd,
        rope_theta=CFG.rope_theta,
        rope_local_base_freq=CFG.rope_local_theta,
        rope_scaling={"rope_type": "linear",
                      "factor": CFG.rope_scaling_factor},
        rms_norm_eps=CFG.rms_eps,
        query_pre_attn_scalar=float(CFG.attn_scale) ** 2,
        sliding_window=CFG.sliding_window,
        layer_types=list(CFG.layer_types),
        tie_word_embeddings=True)
    vc = dict(hidden_size=CFG.v_hidden, intermediate_size=CFG.v_intermediate,
              num_hidden_layers=CFG.v_layers,
              num_attention_heads=CFG.v_heads,
              image_size=CFG.image_size, patch_size=CFG.patch_size,
              layer_norm_eps=CFG.v_eps)
    hf_cfg = Gemma3Config(text_config=tc, vision_config=vc,
                          mm_tokens_per_image=CFG.mm_tokens_per_image,
                          image_token_index=CFG.image_token_id,
                          boi_token_index=253, eoi_token_index=254,
                          attn_implementation="eager")
    torch.manual_seed(seed)
    m = Gemma3ForConditionalGeneration(hf_cfg).eval().float()
    return m


@pytest.fixture(scope="module")
def pair():
    m = _hf_model()
    from autoround_tpu.utils.vlm_loader import gemma3vl_params_from_state
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = gemma3vl_params_from_state(state, CFG, jnp.float32)
    return m, params


def _mm_batch(n_text=6, seed=1, bs=1):
    """One image per row: <boi> soft_token*T <eoi> surrounded by text."""
    rng = np.random.default_rng(seed)
    T = CFG.mm_tokens_per_image
    text = rng.integers(2, 250, (bs, 2 * n_text))
    ids = np.concatenate([
        text[:, :n_text], np.full((bs, 1), 253),
        np.full((bs, T), CFG.image_token_id), np.full((bs, 1), 254),
        text[:, n_text:]], axis=1).astype(np.int64)
    pixels = rng.standard_normal(
        (bs, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    return ids, pixels


class TestParity:
    def test_text_only_logits(self, pair):
        m, params = pair
        ids = np.arange(10, 26, dtype=np.int64)[None]
        with torch.no_grad():
            ref = m(input_ids=torch.from_numpy(ids)).logits.numpy()
        ours = np.asarray(gemma3vl.model_fwd(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)

    def test_sliding_beyond_window_logits(self, pair):
        m, params = pair
        S = CFG.sliding_window + 6   # exercise the sliding mask
        ids = np.random.default_rng(3).integers(
            2, 250, (1, S)).astype(np.int64)
        with torch.no_grad():
            ref = m(input_ids=torch.from_numpy(ids)).logits.numpy()
        ours = np.asarray(gemma3vl.model_fwd(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)

    def test_multimodal_logits(self, pair):
        m, params = pair
        ids, pixels = _mm_batch()
        # HF expects NCHW pixels
        pt_pixels = torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        with torch.no_grad():
            ref = m(input_ids=torch.from_numpy(ids),
                    pixel_values=pt_pixels).logits.numpy()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(pixels)}
        ours = np.asarray(gemma3vl.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


class TestTemplate:
    def test_registry_dispatch(self):
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        tpl = get_vlm_template(CFG)
        assert tpl.model_type == "gemma3"

    def test_calib_inputs_expand_soft_tokens(self):
        from autoround_tpu.utils.vlm_templates import build_calib_inputs
        img = np.zeros((32, 32, 3), np.uint8)

        def tok(text):
            return [min(ord(c), 200) for c in text]

        out = build_calib_inputs(
            CFG, tok, [{"role": "user", "content": "look <image> ok"}],
            [img], seqlen=64,
            image_token_text_map={"<image_soft_token>": CFG.image_token_id})
        ids = out["input_ids"][0]
        assert (ids == CFG.image_token_id).sum() == CFG.mm_tokens_per_image
        assert out["pixel_values"].shape == (
            1, CFG.image_size, CFG.image_size, 3)


class TestQuantize:
    def test_multimodal_calibration_e2e(self):
        params = gemma3vl.init_params(CFG, jax.random.PRNGKey(0))
        ids, pixels = _mm_batch(n_text=4, bs=4)
        batch = {"input_ids": jnp.asarray(ids.astype(np.int32)),
                 "pixel_values": jnp.asarray(pixels)}
        res = AutoRound((params, CFG), scheme="W4A16", iters=4,
                        batch_size=2, donate_params=False).quantize(batch)
        assert len(res.layers) == CFG.num_layers * 7
        out = gemma3vl.model_fwd(res.params, {
            "input_ids": jnp.asarray(ids[:1].astype(np.int32)),
            "pixel_values": jnp.asarray(pixels[:1])}, CFG)
        assert np.isfinite(np.asarray(out)).all()

    def test_synthetic_calib_batch(self):
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch
        batch, mask = get_mllm_calib_batch(CFG, nsamples=2, seqlen=16)
        assert (batch["input_ids"][0] == CFG.image_token_id).sum() == \
            CFG.mm_tokens_per_image
        params = gemma3vl.init_params(CFG, jax.random.PRNGKey(0))
        out = gemma3vl.model_fwd(
            params, {k: jnp.asarray(v) for k, v in batch.items()}, CFG)
        assert np.isfinite(np.asarray(out)).all()
