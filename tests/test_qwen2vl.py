"""Qwen2-VL family: logit parity vs HF transformers (eager) and
quantization e2e.

Parity covers: 2D-rotary ViT (merge-block patch order, quick_gelu,
bias'd qkv/proj), the 2x2 patch merger, m-rope position derivation
(get_rope_index) and section-mixed decoder rope, image-token splicing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import qwen2vl
from autoround_tpu.models.qwen2vl import CONFIG_PRESETS, Qwen2VLConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = CONFIG_PRESETS["tiny-qwen2vl"]


def _hf_model(seed=0):
    from transformers import Qwen2VLConfig as HFConfig
    from transformers import Qwen2VLForConditionalGeneration
    vc = dict(depth=CFG.v_layers, embed_dim=CFG.v_embed_dim,
              hidden_size=CFG.hidden_size, num_heads=CFG.v_heads,
              in_channels=3, patch_size=CFG.patch_size,
              spatial_merge_size=CFG.spatial_merge_size,
              temporal_patch_size=CFG.temporal_patch_size,
              mlp_ratio=CFG.v_mlp_ratio)
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
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(seed)
    m = Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    return m


@pytest.fixture(scope="module")
def pair():
    m = _hf_model()
    from autoround_tpu.utils.vlm_loader import qwen2vl_params_from_state
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = qwen2vl_params_from_state(state, CFG, jnp.float32)
    return m, params


def _mm_batch(grid=(1, 8, 8), n_text=6, seed=1):
    """One image of grid (t,h,w) patches + surrounding text, in the HF
    prompt convention: <|vision_start|>(7) <image_pad>*n <|vision_end|>(8)
    — get_rope_index locates images via the vision_start token."""
    rng = np.random.default_rng(seed)
    t, h, w = grid
    n_patch = t * h * w
    n_img = n_patch // (CFG.spatial_merge_size ** 2)
    patch_dim = CFG.patch_dim
    pixels = rng.standard_normal((n_patch, patch_dim)).astype(np.float32)
    text = rng.integers(9, CFG.vocab_size, (2 * n_text,))
    ids = np.concatenate([text[:n_text], [7],
                          np.full((n_img,), CFG.image_token_id), [8],
                          text[n_text:]]).astype(np.int64)[None]
    return ids, pixels, [grid]


class TestParity:
    def test_text_only_logits(self, pair):
        m, params = pair
        ids = np.arange(10, 26, dtype=np.int64)[None]
        with torch.no_grad():
            ref = m(input_ids=torch.from_numpy(ids)).logits.numpy()
        ours = np.asarray(qwen2vl.model_fwd(params, jnp.asarray(ids), CFG))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_multimodal_logits(self, pair):
        m, params = pair
        ids, pixels, grid = _mm_batch()
        with torch.no_grad():
            ref = m(input_ids=torch.from_numpy(ids),
                    pixel_values=torch.from_numpy(pixels),
                    image_grid_thw=torch.tensor(grid)).logits.numpy()
        inputs = {"input_ids": jnp.asarray(ids),
                  "pixel_values": jnp.asarray(pixels),
                  "grid_thw": [tuple(g) for g in grid]}
        ours = np.asarray(qwen2vl.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)

    def test_mrope_positions_match_hf(self, pair):
        m, _ = pair
        ids, _, grid = _mm_batch(grid=(1, 4, 6), n_text=5)
        want, _ = m.model.get_rope_index(
            torch.from_numpy(ids), torch.tensor(grid), None)
        got = qwen2vl.get_mrope_positions(ids, [tuple(g) for g in grid],
                                          CFG)
        np.testing.assert_array_equal(got, want.numpy())


class TestQuantize:
    def test_multimodal_calibration_e2e(self):
        params = qwen2vl.init_params(CFG, jax.random.PRNGKey(0))
        ids, pixels, grid = _mm_batch(grid=(1, 4, 4), n_text=4)
        ids = np.repeat(ids, 4, axis=0)
        pixels = np.tile(pixels, (4, 1))
        batch = {"input_ids": jnp.asarray(ids),
                 "pixel_values": jnp.asarray(pixels),
                 "grid_thw": [grid[0]] * 4}
        res = AutoRound((params, CFG), scheme="W4A16", iters=4,
                        batch_size=2, donate_params=False).quantize(batch)
        assert len(res.layers) == CFG.num_layers * 7
        # quantized model still runs the multimodal forward
        t, h, w = grid[0]
        out = qwen2vl.model_fwd(res.params, {
            "input_ids": jnp.asarray(ids[:1]),
            "pixel_values": jnp.asarray(pixels[:t * h * w]),
            "grid_thw": [grid[0]]}, CFG)
        assert np.isfinite(np.asarray(out)).all()
