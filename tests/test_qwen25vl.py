"""Qwen2.5-VL family: HF logit parity (window attention + full-attn
blocks, RMSNorm/SwiGLU ViT, window permutation round-trip) and
quantization e2e (ref ``compressors/mllm/template.py:121``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import qwen25vl
from autoround_tpu.models.qwen25vl import CONFIG_PRESETS

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-qwen25vl"]


def _hf_model(seed=0):
    from transformers import Qwen2_5_VLConfig as HFConfig
    from transformers import Qwen2_5_VLForConditionalGeneration
    vc = dict(depth=CFG.v_layers, hidden_size=CFG.v_embed_dim,
              intermediate_size=CFG.v_intermediate,
              num_heads=CFG.v_heads, in_channels=3,
              patch_size=CFG.patch_size,
              spatial_merge_size=CFG.spatial_merge_size,
              temporal_patch_size=CFG.temporal_patch_size,
              window_size=CFG.window_size,
              fullatt_block_indexes=list(CFG.fullatt_block_indexes),
              out_hidden_size=CFG.hidden_size, hidden_act="silu",
              tokens_per_second=4)
    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps,
        image_token_id=CFG.image_token_id, video_token_id=6,
        vision_start_token_id=7, vision_config=vc,
        rope_scaling={"type": "mrope",
                      "mrope_section": list(CFG.mrope_section)},
        tie_word_embeddings=False)
    torch.manual_seed(seed)
    return Qwen2_5_VLForConditionalGeneration._from_config(
        hf_cfg, attn_implementation="eager").eval().float()


def _port(hf):
    params = qwen25vl.init_params(CFG, jax.random.PRNGKey(0))

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
        for n, bn in (("q_proj", "q_bias"), ("k_proj", "k_bias"),
                      ("v_proj", "v_bias")):
            b[bn] = j(getattr(lay.self_attn, n).bias)
        for n in ("gate_proj", "up_proj", "down_proj"):
            b[n] = j(getattr(lay.mlp, n).weight)
    vt = hf.model.visual
    vis = params["visual"]
    w = vt.patch_embed.proj.weight.detach().numpy()
    vis["patch_embed"] = jnp.asarray(w.reshape(w.shape[0], -1))
    for li in range(CFG.v_layers):
        blk = vt.blocks[li]
        vb = vis["blocks"][li]
        vb["norm1"] = j(blk.norm1.weight)
        vb["norm2"] = j(blk.norm2.weight)
        vb["qkv"] = j(blk.attn.qkv.weight)
        vb["qkv_b"] = j(blk.attn.qkv.bias)
        vb["proj"] = j(blk.attn.proj.weight)
        vb["proj_b"] = j(blk.attn.proj.bias)
        vb["gate_proj"] = j(blk.mlp.gate_proj.weight)
        vb["gate_b"] = j(blk.mlp.gate_proj.bias)
        vb["up_proj"] = j(blk.mlp.up_proj.weight)
        vb["up_b"] = j(blk.mlp.up_proj.bias)
        vb["down_proj"] = j(blk.mlp.down_proj.weight)
        vb["down_b"] = j(blk.mlp.down_proj.bias)
    mg = vis["merger"]
    mg["ln_q"] = j(vt.merger.ln_q.weight)
    mg["fc1"] = j(vt.merger.mlp[0].weight)
    mg["fc1_b"] = j(vt.merger.mlp[0].bias)
    mg["fc2"] = j(vt.merger.mlp[2].weight)
    mg["fc2_b"] = j(vt.merger.mlp[2].bias)
    return params


@pytest.fixture(scope="module")
def pair():
    hf = _hf_model()
    return hf, _port(hf)


def _mm_batch(grid=(1, 8, 8), n_text=5, seed=1):
    """8x8 patch grid = 4x4 merged = 2x2 windows of 2x2 units — the
    window permutation is non-trivial AND a full-attn block mixes
    across windows."""
    rng = np.random.default_rng(seed)
    t, h, w = grid
    n_patch = t * h * w
    n_img = n_patch // (CFG.spatial_merge_size ** 2)
    pixels = rng.standard_normal((n_patch, CFG.patch_dim)).astype(np.float32)
    text = rng.integers(9, CFG.vocab_size, (2 * n_text,))
    ids = np.concatenate([text[:n_text], [7],
                          np.full((n_img,), CFG.image_token_id), [8],
                          text[n_text:]]).astype(np.int64)[None]
    return ids, pixels, [grid]


class TestParity:
    def test_text_only_logits(self, pair):
        hf, params = pair
        ids = np.arange(10, 26, dtype=np.int64)[None]
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(qwen25vl.model_fwd(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_multimodal_logits_with_windows(self, pair):
        hf, params = pair
        ids, pixels, grid = _mm_batch()
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids),
                      pixel_values=torch.from_numpy(pixels),
                      image_grid_thw=torch.tensor(grid)).logits.numpy()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(pixels),
                  "grid_thw": [tuple(g) for g in grid]}
        got = np.asarray(qwen25vl.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    def test_window_index_matches_hf(self, pair):
        hf, _ = pair
        grid = [(1, 8, 12)]
        want_idx, want_cu = hf.model.visual.get_window_index(
            torch.tensor(grid))
        from autoround_tpu.models.qwen25vl import _window_index
        got_idx, got_units = _window_index(CFG, grid)
        np.testing.assert_array_equal(got_idx, want_idx.numpy())
        mu = CFG.spatial_merge_size ** 2
        cu = np.concatenate([[0], np.cumsum(got_units * mu)])
        want_cu = np.unique(np.asarray(want_cu))
        np.testing.assert_array_equal(cu, want_cu)


class TestQuantize:
    def test_multimodal_calibration_e2e(self):
        params = qwen25vl.init_params(CFG, jax.random.PRNGKey(0))
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch
        inputs, mask = get_mllm_calib_batch(CFG, nsamples=4, seqlen=16)
        res = AutoRound((params, CFG), scheme={"bits": 4, "group_size": 16},
                        iters=2, batch_size=2,
                        donate_params=False).quantize(inputs, mask=mask)
        assert "blocks.0.q_proj" in res.layers
        y = qwen25vl.model_fwd(res.params, inputs, CFG)
        assert np.isfinite(np.asarray(y)).all()

    def test_registry_and_template(self):
        from autoround_tpu.models.registry import ALL_PRESETS, get_model_fns
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        assert "tiny-qwen25vl" in ALL_PRESETS
        assert get_model_fns(CFG).model_fwd is qwen25vl.model_fwd
        assert get_vlm_template(CFG).model_type == "qwen2_5_vl"
