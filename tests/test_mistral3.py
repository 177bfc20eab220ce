"""Mistral-3 / Pixtral family: HF logit parity (interleaved-h/w 2-D
rope, RMSNorm ViT, unfold patch merger) and quantization e2e (ref
``compressors/mllm/template.py:127-128`` mistral3 / mistral3_2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import mistral3
from autoround_tpu.models.mistral3 import CONFIG_PRESETS

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-mistral3"]


def _hf_model(seed=0):
    from transformers import Mistral3Config as HFConfig
    from transformers import Mistral3ForConditionalGeneration
    vc = dict(model_type="pixtral", hidden_size=CFG.v_hidden,
              intermediate_size=CFG.v_intermediate,
              num_hidden_layers=CFG.v_layers,
              num_attention_heads=CFG.v_heads,
              image_size=CFG.v_image_size, patch_size=CFG.patch_size,
              rope_theta=CFG.v_rope_theta, hidden_act="silu",
              attention_dropout=0.0)
    tc = dict(model_type="mistral", vocab_size=CFG.vocab_size,
              hidden_size=CFG.hidden_size,
              intermediate_size=CFG.intermediate_size,
              num_hidden_layers=CFG.num_layers,
              num_attention_heads=CFG.num_heads,
              num_key_value_heads=CFG.num_kv_heads,
              rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps,
              sliding_window=None, tie_word_embeddings=False)
    hf_cfg = HFConfig(vision_config=vc, text_config=tc,
                      image_token_index=CFG.image_token_id,
                      spatial_merge_size=CFG.spatial_merge_size,
                      vision_feature_layer=-1,
                      multimodal_projector_bias=False,
                      projector_hidden_act="gelu")
    torch.manual_seed(seed)
    return Mistral3ForConditionalGeneration._from_config(
        hf_cfg, attn_implementation="eager").eval().float()


def _port(hf):
    params = mistral3.init_params(CFG, jax.random.PRNGKey(0))

    def j(t):
        return jnp.asarray(t.detach().float().numpy())

    lm = hf.model.language_model
    params["embed_tokens"] = j(lm.embed_tokens.weight)
    params["norm"] = j(lm.norm.weight)
    params["lm_head"] = j(hf.lm_head.weight)
    for li in range(CFG.num_layers):
        lay = lm.layers[li]
        b = params["blocks"][li]
        b["input_layernorm"] = j(lay.input_layernorm.weight)
        b["post_attention_layernorm"] = j(lay.post_attention_layernorm.weight)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            b[n] = j(getattr(lay.self_attn, n).weight)
        for n in ("gate_proj", "up_proj", "down_proj"):
            b[n] = j(getattr(lay.mlp, n).weight)
    vt = hf.model.vision_tower
    vis = params["visual"]
    w = vt.patch_conv.weight.detach().numpy()
    vis["patch_embed"] = jnp.asarray(w.reshape(w.shape[0], -1))
    vis["ln_pre"] = j(vt.ln_pre.weight)
    for li in range(CFG.v_layers):
        lay = vt.transformer.layers[li]
        vb = vis["blocks"][li]
        vb["attn_norm"] = j(lay.attention_norm.weight)
        vb["ffn_norm"] = j(lay.ffn_norm.weight)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            vb[n] = j(getattr(lay.attention, n).weight)
        vb["gate_proj"] = j(lay.feed_forward.gate_proj.weight)
        vb["up_proj"] = j(lay.feed_forward.up_proj.weight)
        vb["down_proj"] = j(lay.feed_forward.down_proj.weight)
    proj = hf.model.multi_modal_projector
    vis["proj_norm"] = j(proj.norm.weight)
    vis["merge"] = j(proj.patch_merger.merging_layer.weight)
    vis["fc1"] = j(proj.linear_1.weight)
    vis["fc2"] = j(proj.linear_2.weight)
    return params


@pytest.fixture(scope="module")
def pair():
    hf = _hf_model()
    return hf, _port(hf)


def _mm_batch(grid=(4, 4), n_text=5, seed=1):
    rng = np.random.default_rng(seed)
    h, w = grid
    ps = CFG.patch_size
    m = CFG.spatial_merge_size
    n_img = h * w // (m * m)
    image = rng.standard_normal((3, h * ps, w * ps)).astype(np.float32)
    # row-major conv-order patches: (C, ps, ps) flattened per patch
    patches = np.stack([
        image[:, i * ps:(i + 1) * ps, j * ps:(j + 1) * ps].reshape(-1)
        for i in range(h) for j in range(w)])
    text = rng.integers(12, CFG.vocab_size, (2 * n_text,))
    ids = np.concatenate([text[:n_text],
                          np.full((n_img,), CFG.image_token_id),
                          text[n_text:]]).astype(np.int64)[None]
    return ids, image, patches, [grid]


class TestParity:
    def test_text_only_logits(self, pair):
        hf, params = pair
        ids = np.arange(20, 34, dtype=np.int64)[None]
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(mistral3.model_fwd(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_multimodal_logits(self, pair):
        hf, params = pair
        ids, image, patches, grid = _mm_batch()
        h, w = grid[0]
        ps = CFG.patch_size
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids),
                      pixel_values=torch.from_numpy(image[None]),
                      image_sizes=torch.tensor([[h * ps, w * ps]])
                      ).logits.numpy()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(patches),
                  "grid_hw": [tuple(g) for g in grid]}
        got = np.asarray(mistral3.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


class TestQuantize:
    def test_multimodal_calibration_e2e(self):
        params = mistral3.init_params(CFG, jax.random.PRNGKey(0))
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch
        inputs, mask = get_mllm_calib_batch(CFG, nsamples=4, seqlen=16)
        res = AutoRound((params, CFG), scheme={"bits": 4, "group_size": 16},
                        iters=2, batch_size=2,
                        donate_params=False).quantize(inputs, mask=mask)
        assert "blocks.0.q_proj" in res.layers
        y = mistral3.model_fwd(res.params, inputs, CFG)
        assert np.isfinite(np.asarray(y)).all()

    def test_registry_and_template(self):
        from autoround_tpu.models.registry import ALL_PRESETS, get_model_fns
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        assert "tiny-mistral3" in ALL_PRESETS
        assert get_model_fns(CFG).model_fwd is mistral3.model_fwd
        assert get_vlm_template(CFG).model_type == "mistral3"


class TestStateDictLoader:
    """``utils/vlm_loader.mistral3_params_from_state`` against the REAL
    HF state dict (VERDICT r4 item 8)."""

    def test_matches_hf_logits(self, pair):
        from autoround_tpu.utils.vlm_loader import mistral3_params_from_state
        hf, _ = pair
        state = {k: v.detach().float().numpy()
                 for k, v in hf.state_dict().items()}
        params = mistral3_params_from_state(state, CFG, jnp.float32)
        ids = np.arange(20, 34, dtype=np.int64)[None]
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(mistral3.model_fwd(
            params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_multimodal_matches_hf(self, pair):
        from autoround_tpu.utils.vlm_loader import mistral3_params_from_state
        hf, _ = pair
        state = {k: v.detach().float().numpy()
                 for k, v in hf.state_dict().items()}
        params = mistral3_params_from_state(state, CFG, jnp.float32)
        ids, image, patches, grid = _mm_batch()
        h, w = grid[0]
        ps = CFG.patch_size
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids),
                      pixel_values=torch.from_numpy(image[None]),
                      image_sizes=torch.tensor([[h * ps, w * ps]])
                      ).logits.numpy()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(patches),
                  "grid_hw": [tuple(g) for g in grid]}
        got = np.asarray(mistral3.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
