"""MLLM (llava-style) model + multimodal quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llava
from autoround_tpu.quantize.calib_data import get_mllm_calib_batch

CFG = llava.CONFIG_PRESETS["tiny-llava"]


@pytest.fixture(scope="module")
def setup():
    params = llava.init_params(CFG, jax.random.PRNGKey(0))
    batch, mask = get_mllm_calib_batch(CFG, nsamples=8, seqlen=32)
    return params, batch, mask


class TestLlavaModel:
    def test_forward_shapes(self, setup):
        params, batch, _ = setup
        logits = llava.model_fwd(params, batch, CFG)
        assert logits.shape == (8, 32, CFG.vocab_size)
        assert np.isfinite(np.asarray(logits, np.float32)).all()

    def test_image_changes_output(self, setup):
        params, batch, _ = setup
        l0 = llava.model_fwd(params, batch, CFG)
        batch2 = dict(batch)
        batch2["pixel_values"] = batch["pixel_values"] + 1.0
        l1 = llava.model_fwd(params, batch2, CFG)
        # image-token positions (and downstream) must differ
        assert not np.allclose(np.asarray(l0), np.asarray(l1))

    def test_text_only_path(self, setup):
        params, batch, _ = setup
        ids = np.asarray(batch["input_ids"]).copy()
        ids[:, : CFG.num_patches] = 5  # no image tokens
        l = llava.model_fwd(params, jnp.asarray(ids), CFG)
        assert np.isfinite(np.asarray(l, np.float32)).all()

    def test_patch_count(self):
        assert CFG.num_patches == (32 // 8) ** 2 == 16


class TestLlavaQuantize:
    def test_multimodal_rtn(self, setup):
        params, batch, mask = setup
        res = AutoRound((params, CFG), scheme="W4A16", iters=0).quantize(
            batch, mask=mask)
        assert len(res.layers) == CFG.num_layers * 7
        # vision tower untouched
        assert "vision_tower" in res.params

    def test_multimodal_tuned(self, setup):
        params, batch, mask = setup
        res = AutoRound((params, CFG), scheme="W2A16G64", iters=8,
                        batch_size=4).quantize(batch, mask=mask)
        for bi, trace in res.loss_traces.items():
            assert np.min(trace) <= trace[0] + 1e-9
        logits = llava.model_fwd(res.params, batch, CFG)
        assert np.isfinite(np.asarray(logits, np.float32)).all()

    def test_autoscheme_rejects_multimodal(self, setup):
        params, batch, mask = setup
        from autoround_tpu.quantize.auto_scheme import AutoScheme
        ar = AutoRound((params, CFG),
                       scheme=AutoScheme(avg_bits=3.0,
                                         options=("W2A16", "W4A16G32")))
        with pytest.raises(NotImplementedError):
            ar.quantize(batch)
