"""Qwen3-VL-MoE family: HF logit parity (deepstack ViT, interleaved
m-rope, qk-norm MoE decoder) and quantization e2e with chain-extras
calibration (VERDICT r3 missing #2/#4; ref
``modeling/fused_moe/qwen3_vl_moe.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import qwen3vlmoe
from autoround_tpu.models.qwen3vlmoe import CONFIG_PRESETS

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-qwen3vlmoe"]


def _hf_model(seed=0):
    from transformers.models.qwen3_vl_moe.configuration_qwen3_vl_moe import (
        Qwen3VLMoeConfig as HFConfig)
    from transformers.models.qwen3_vl_moe.modeling_qwen3_vl_moe import (
        Qwen3VLMoeForConditionalGeneration)
    vc = dict(depth=CFG.v_layers, hidden_size=CFG.v_embed_dim,
              intermediate_size=CFG.v_intermediate, num_heads=CFG.v_heads,
              patch_size=CFG.patch_size,
              temporal_patch_size=CFG.temporal_patch_size,
              spatial_merge_size=CFG.spatial_merge_size,
              out_hidden_size=CFG.hidden_size,
              num_position_embeddings=CFG.num_position_embeddings,
              deepstack_visual_indexes=list(CFG.deepstack_visual_indexes),
              in_channels=3)
    tc = dict(vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
              intermediate_size=96,  # dense width, unused (all-MoE)
              num_hidden_layers=CFG.num_layers,
              num_attention_heads=CFG.num_heads,
              num_key_value_heads=CFG.num_kv_heads, head_dim=CFG.hd,
              num_experts=CFG.num_experts,
              num_experts_per_tok=CFG.top_k,
              moe_intermediate_size=CFG.intermediate_size,
              rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps,
              rope_scaling={"rope_type": "default",
                            "mrope_section": list(CFG.mrope_section),
                            "mrope_interleaved": True})
    hf_cfg = HFConfig(vision_config=vc, text_config=tc,
                      image_token_id=CFG.image_token_id, video_token_id=6,
                      vision_start_token_id=7, vision_end_token_id=8,
                      tie_word_embeddings=False)
    torch.manual_seed(seed)
    return Qwen3VLMoeForConditionalGeneration._from_config(
        hf_cfg, attn_implementation="eager").eval().float()


@pytest.fixture(scope="module")
def pair():
    m = _hf_model()
    from autoround_tpu.utils.vlm_loader import qwen3vlmoe_params_from_state
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = qwen3vlmoe_params_from_state(state, CFG, jnp.float32)
    return m, params


def _mm_batch(grid=(1, 4, 4), n_text=5, seed=1):
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
        m, params = pair
        ids = np.arange(10, 24, dtype=np.int64)[None]
        with torch.no_grad():
            ref = m(input_ids=torch.from_numpy(ids)).logits.numpy()
        ours = np.asarray(qwen3vlmoe.model_fwd(params, jnp.asarray(ids),
                                               CFG))
        np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)

    def test_multimodal_logits_with_deepstack(self, pair):
        """Full path: pos-embed interpolation, deepstack mergers, the
        decoder injections, interleaved m-rope."""
        m, params = pair
        ids, pixels, grid = _mm_batch()
        with torch.no_grad():
            ref = m(input_ids=torch.from_numpy(ids),
                    pixel_values=torch.from_numpy(pixels),
                    image_grid_thw=torch.tensor(grid)).logits.numpy()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(pixels),
                  "grid_thw": [tuple(g) for g in grid]}
        ours = np.asarray(qwen3vlmoe.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)

    def test_deepstack_injections_nonzero(self, pair):
        _, params = pair
        ids, pixels, grid = _mm_batch()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(pixels),
                  "grid_thw": [tuple(g) for g in grid]}
        extras = qwen3vlmoe.chain_extras(params, inputs, CFG)
        assert set(extras) == set(
            range(len(CFG.deepstack_visual_indexes)))
        is_img = np.asarray(ids[0]) == CFG.image_token_id
        for e in extras.values():
            e = np.asarray(e)[0]
            assert np.abs(e[is_img]).max() > 0
            assert np.abs(e[~is_img]).max() == 0


class TestQuantize:
    def test_multimodal_calibration_e2e(self):
        """Chain-extras calibration: the orchestrator applies deepstack
        injections to both chains; expert + attention layers quantize."""
        params = qwen3vlmoe.init_params(CFG, jax.random.PRNGKey(0))
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch
        inputs, mask = get_mllm_calib_batch(CFG, nsamples=4, seqlen=16)
        res = AutoRound((params, CFG), scheme={"bits": 4, "group_size": 16}, iters=2,
                        batch_size=2, donate_params=False
                        ).quantize(inputs, mask=mask)
        names = set(res.layers)
        assert "blocks.0.experts.0.w1" in names
        assert "blocks.0.q_proj" in names
        y = qwen3vlmoe.model_fwd(res.params, inputs, CFG)
        assert np.isfinite(np.asarray(y)).all()

    def test_registry_and_template(self):
        from autoround_tpu.models.registry import ALL_PRESETS, get_model_fns
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        assert "tiny-qwen3vlmoe" in ALL_PRESETS
        fns = get_model_fns(CFG)
        assert fns.chain_extras is qwen3vlmoe.chain_extras
        assert get_vlm_template(CFG).model_type == "qwen3_vl_moe"
