"""MMDiT (joint text-image attention) family tests: augmented-cache
chaining equivalence, denoise-loop capture, quantization e2e, sampler
fidelity ordering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import mmdit
from autoround_tpu.models.mmdit import CONFIG_PRESETS, euler_sample
from autoround_tpu.quantize.calib_data import get_diffusion_calib_batch

CFG = CONFIG_PRESETS["tiny-mmdit"]


@pytest.fixture(scope="module")
def setup():
    params = mmdit.init_params(CFG, jax.random.PRNGKey(0))
    batch = get_diffusion_calib_batch(CFG, nsamples=8)
    return params, batch


class TestModel:
    def test_block_chain_matches_model_fwd(self, setup):
        # the orchestrator chains block_fwd on the augmented cache; that
        # composition must equal model_fwd exactly
        params, batch = setup
        x = mmdit.embed_fwd(params, batch, CFG)
        for b in params["blocks"]:
            x = mmdit.block_fwd(b, x, None, None, CFG)
        out = mmdit.final_fwd(params, x, CFG)
        want = mmdit.model_fwd(params, batch, CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_text_conditioning_changes_image_stream(self, setup):
        # joint attention: perturbing the TEXT stream must change the
        # predicted image noise (the cross-modal path exists)
        params, batch = setup
        out1 = mmdit.model_fwd(params, batch, CFG)
        b2 = dict(batch)
        b2["encoder_states"] = batch["encoder_states"] + 1.0
        out2 = mmdit.model_fwd(params, b2, CFG)
        assert float(np.abs(np.asarray(out1 - out2)).max()) > 1e-6

    def test_unpatchify_roundtrip(self):
        rng = np.random.default_rng(0)
        lat = rng.standard_normal(
            (2, CFG.image_size, CFG.image_size, CFG.in_channels)
        ).astype(np.float32)
        g, P = CFG.image_size // CFG.patch_size, CFG.patch_size
        x = lat.reshape(2, g, P, g, P, CFG.in_channels)
        patches = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            2, g * g, CFG.patch_dim)
        back = np.asarray(mmdit.unpatchify(jnp.asarray(patches), CFG))
        np.testing.assert_allclose(back, lat, rtol=1e-6)

    def test_denoise_loop_capture(self, setup):
        params, _ = setup
        enc = jnp.zeros((2, CFG.text_len, CFG.text_dim))
        pooled = jnp.zeros((2, CFG.pooled_dim))
        captured = []
        euler_sample(params, CFG, enc, pooled, jax.random.PRNGKey(1),
                     steps=4, capture=lambda d: captured.append(d))
        assert len(captured) == 4
        ts = [float(np.asarray(c["timesteps"])[0]) for c in captured]
        assert ts[0] > ts[-1]          # descending sigma schedule
        assert captured[0]["pixel_values"].shape == (
            2, CFG.image_size, CFG.image_size, CFG.in_channels)


class TestQuantize:
    def test_e2e_quantize_and_sample(self, setup):
        params, batch = setup
        res = AutoRound((params, CFG), scheme="W4A16G32", iters=4,
                        batch_size=4, donate_params=False).quantize(batch)
        assert len(res.layers) == CFG.num_layers * len(mmdit.LINEAR_KEYS)
        enc = jnp.asarray(batch["encoder_states"][:2])
        pooled = jnp.asarray(batch["pooled"][:2])
        lat = euler_sample(res.params, CFG, enc, pooled,
                           jax.random.PRNGKey(2), steps=3)
        assert np.isfinite(np.asarray(lat)).all()

    def test_w2_tuning_reduces_block_loss(self, setup):
        # random-init MMDiT outputs are near-zero, so end-to-end MSE
        # ordering is noise; the robust signal is the per-block tuned
        # loss trace (best must improve on iter0 for the worst block)
        params, batch = setup
        tuned = AutoRound((params, CFG), scheme="W2A16G64", iters=20,
                          batch_size=4, donate_params=False).quantize(batch)
        improved = 0
        for bi, tr in tuned.loss_traces.items():
            tr = np.asarray(tr, np.float64)
            assert tr.min() <= tr[0] + 1e-12
            if tr.min() < tr[0] * 0.999:
                improved += 1
        assert improved >= 1
