"""GLM-4.5V family: HF logit parity (bicubic pos resample, RMSNorm ViT,
stride-m downsample conv, chunked partial m-rope over the GLM-4.5 MoE
decoder) and quantization e2e (ref glm_image template,
``compressors/mllm/template.py:124``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import glm4vmoe
from autoround_tpu.models.glm4vmoe import CONFIG_PRESETS

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-glm4vmoe"]


def _hf_model(seed=0):
    from transformers.models.glm4v_moe.configuration_glm4v_moe import (
        Glm4vMoeConfig as HFConfig)
    from transformers.models.glm4v_moe.modeling_glm4v_moe import (
        Glm4vMoeForConditionalGeneration)
    vc = dict(depth=CFG.v_layers, hidden_size=CFG.v_embed_dim,
              num_heads=CFG.v_heads, patch_size=CFG.patch_size,
              temporal_patch_size=CFG.temporal_patch_size,
              spatial_merge_size=CFG.spatial_merge_size,
              out_hidden_size=CFG.out_hidden_size,
              image_size=CFG.v_image_size, in_channels=3,
              intermediate_size=CFG.intermediate_size,
              rms_norm_eps=CFG.v_rms_eps, attention_bias=True,
              hidden_act="silu", attention_dropout=0.0)
    tc = dict(vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
              intermediate_size=CFG.intermediate_size,
              num_hidden_layers=CFG.num_layers,
              num_attention_heads=CFG.num_heads,
              num_key_value_heads=CFG.num_kv_heads, head_dim=CFG.hd,
              partial_rotary_factor=CFG.partial_rotary_factor,
              n_routed_experts=CFG.n_routed_experts,
              num_experts_per_tok=CFG.num_experts_per_tok,
              moe_intermediate_size=CFG.moe_intermediate_size,
              n_shared_experts=CFG.n_shared_experts,
              first_k_dense_replace=CFG.first_k_dense,
              routed_scaling_factor=CFG.routed_scaling_factor,
              norm_topk_prob=CFG.norm_topk_prob, n_group=1, topk_group=1,
              rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps,
              attention_bias=True, use_qk_norm=False,
              rope_scaling={"rope_type": "default",
                            "mrope_section": list(CFG.mrope_section)})
    hf_cfg = HFConfig(vision_config=vc, text_config=tc,
                      image_token_id=CFG.image_token_id,
                      video_token_id=8, image_start_token_id=9,
                      image_end_token_id=10, tie_word_embeddings=False)
    torch.manual_seed(seed)
    return Glm4vMoeForConditionalGeneration._from_config(
        hf_cfg, attn_implementation="eager").eval().float()


def _port(hf):
    params = glm4vmoe.init_params(CFG, jax.random.PRNGKey(0))

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
        mlp = lay.mlp
        if hasattr(mlp, "experts"):
            b["gate"] = j(mlp.gate.weight)
            b["e_score_correction_bias"] = j(
                mlp.gate.e_score_correction_bias)
            for e in range(CFG.n_routed_experts):
                for n in ("gate_proj", "up_proj", "down_proj"):
                    b["experts"][e][n] = j(getattr(mlp.experts[e], n)
                                           .weight)
            for n in ("gate_proj", "up_proj", "down_proj"):
                b["shared_experts"][n] = j(
                    getattr(mlp.shared_experts, n).weight)
        else:
            for n in ("gate_proj", "up_proj", "down_proj"):
                b[n] = j(getattr(mlp, n).weight)
    vi = hf.model.visual
    vt = params["visual"]
    w = vi.patch_embed.proj.weight.detach().numpy()
    vt["patch_embed"] = jnp.asarray(w.reshape(w.shape[0], -1))
    vt["patch_embed_b"] = j(vi.patch_embed.proj.bias)
    vt["post_conv_ln_g"] = j(vi.post_conv_layernorm.weight)
    vt["pos_embed"] = j(vi.embeddings.position_embedding.weight)
    for li in range(CFG.v_layers):
        blk = vi.blocks[li]
        vb = vt["blocks"][li]
        vb["ln1"] = j(blk.norm1.weight)
        vb["ln2"] = j(blk.norm2.weight)
        vb["qkv"] = j(blk.attn.qkv.weight)
        if blk.attn.qkv.bias is not None:
            vb["qkv_b"] = j(blk.attn.qkv.bias)
        vb["proj"] = j(blk.attn.proj.weight)
        for n in ("gate_proj", "up_proj", "down_proj"):
            vb[n] = j(getattr(blk.mlp, n).weight)
    vt["post_ln_g"] = j(vi.post_layernorm.weight)
    vt["downsample"] = j(vi.downsample.weight)
    vt["downsample_b"] = j(vi.downsample.bias)
    mg = vt["merger"]
    mg["proj"] = j(vi.merger.proj.weight)
    mg["ln_g"] = j(vi.merger.post_projection_norm.weight)
    mg["ln_b"] = j(vi.merger.post_projection_norm.bias)
    for n in ("gate_proj", "up_proj", "down_proj"):
        mg[n] = j(getattr(vi.merger, n).weight)
    return params


@pytest.fixture(scope="module")
def pair():
    hf = _hf_model()
    return hf, _port(hf)


def _mm_batch(grid=(1, 4, 4), n_text=5, seed=1):
    rng = np.random.default_rng(seed)
    t, h, w = grid
    n_patch = t * h * w
    n_img = n_patch // (CFG.spatial_merge_size ** 2)
    pixels = rng.standard_normal((n_patch, CFG.patch_dim)).astype(np.float32)
    text = rng.integers(11, CFG.vocab_size, (2 * n_text,))
    ids = np.concatenate([text[:n_text], [9],
                          np.full((n_img,), CFG.image_token_id), [10],
                          text[n_text:]]).astype(np.int64)[None]
    return ids, pixels, [grid]


class TestParity:
    def test_text_only_logits(self, pair):
        hf, params = pair
        ids = np.arange(20, 34, dtype=np.int64)[None]
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(glm4vmoe.model_fwd(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_multimodal_logits(self, pair):
        """Full path: bicubic pos resample, RMSNorm ViT, downsample
        conv, merger, chunked partial m-rope decoder."""
        hf, params = pair
        ids, pixels, grid = _mm_batch()
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids),
                      pixel_values=torch.from_numpy(pixels),
                      image_grid_thw=torch.tensor(grid)).logits.numpy()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(pixels),
                  "grid_thw": [tuple(g) for g in grid]}
        got = np.asarray(glm4vmoe.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


class TestQuantize:
    def test_multimodal_calibration_e2e(self):
        params = glm4vmoe.init_params(CFG, jax.random.PRNGKey(0))
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch
        inputs, mask = get_mllm_calib_batch(CFG, nsamples=4, seqlen=16)
        res = AutoRound((params, CFG), scheme={"bits": 4, "group_size": 16},
                        iters=2, batch_size=2,
                        donate_params=False).quantize(inputs, mask=mask)
        assert "blocks.1.experts.0.gate_proj" in res.layers
        y = glm4vmoe.model_fwd(res.params, inputs, CFG)
        assert np.isfinite(np.asarray(y)).all()

    def test_registry_and_template(self):
        from autoround_tpu.models.registry import ALL_PRESETS, get_model_fns
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        assert "tiny-glm4vmoe" in ALL_PRESETS
        assert get_model_fns(CFG).model_fwd is glm4vmoe.model_fwd
        assert get_vlm_template(CFG).model_type == "glm_image"


class TestStateDictLoader:
    """The flat state-dict loader (``utils/vlm_loader.
    glm4vmoe_params_from_state``) must reproduce the module-ported
    params from the REAL HF state dict (VERDICT r4 item 8)."""

    def test_matches_hf_logits(self, pair):
        from autoround_tpu.utils.vlm_loader import glm4vmoe_params_from_state
        hf, _ = pair
        state = {k: v.detach().float().numpy()
                 for k, v in hf.state_dict().items()}
        params = glm4vmoe_params_from_state(state, CFG, jnp.float32)
        ids = np.arange(20, 34, dtype=np.int64)[None]
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(glm4vmoe.model_fwd(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_multimodal_matches_hf(self, pair):
        from autoround_tpu.utils.vlm_loader import glm4vmoe_params_from_state
        hf, _ = pair
        state = {k: v.detach().float().numpy()
                 for k, v in hf.state_dict().items()}
        params = glm4vmoe_params_from_state(state, CFG, jnp.float32)
        ids, pixels, grid = _mm_batch()
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids),
                      pixel_values=torch.from_numpy(pixels),
                      image_grid_thw=torch.tensor(grid)).logits.numpy()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(pixels),
                  "grid_thw": [tuple(g) for g in grid]}
        got = np.asarray(glm4vmoe.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
