"""Diffusion (DiT) model + quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import dit
from autoround_tpu.quantize.calib_data import get_diffusion_calib_batch

CFG = dit.CONFIG_PRESETS["tiny-dit"]


@pytest.fixture(scope="module")
def setup():
    params = dit.init_params(CFG, jax.random.PRNGKey(0))
    batch = get_diffusion_calib_batch(CFG, nsamples=8)
    return params, batch


class TestDiTModel:
    def test_forward_shapes(self, setup):
        params, batch = setup
        out = dit.model_fwd(params, batch, CFG)
        assert out.shape == (8, CFG.num_tokens, CFG.patch_dim)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_timestep_conditioning_matters(self, setup):
        params, batch = setup
        o0 = dit.model_fwd(params, batch, CFG)
        b2 = dict(batch)
        b2["timesteps"] = batch["timesteps"] + 500
        o1 = dit.model_fwd(params, b2, CFG)
        assert not np.allclose(np.asarray(o0), np.asarray(o1))

    def test_conditioning_survives_block_chain(self, setup):
        # the augmented-cache trick: c must be identical after every block
        params, batch = setup
        x = dit.embed_fwd(params, batch, CFG)
        c0 = np.asarray(x[:, -1])
        for b in params["blocks"]:
            x = dit.block_fwd(b, x, None, None, CFG)
            np.testing.assert_allclose(np.asarray(x[:, -1]), c0, atol=1e-6)


class TestDiTQuantize:
    def test_rtn(self, setup):
        params, batch = setup
        res = AutoRound((params, CFG), scheme="W8A16", iters=0).quantize(
            batch)
        assert len(res.layers) == CFG.num_layers * 4
        out = dit.model_fwd(res.params, batch, CFG)
        fp = dit.model_fwd(params, batch, CFG)
        rel = (np.abs(np.asarray(out - fp, np.float32)).max()
               / max(np.abs(np.asarray(fp, np.float32)).max(), 1e-9))
        assert rel < 0.2

    def test_tuned_beats_rtn(self, setup):
        params, batch = setup
        rtn = AutoRound((params, CFG), scheme="W2A16G64",
                        iters=0).quantize(batch)
        tuned = AutoRound((params, CFG), scheme="W2A16G64", iters=20,
                          batch_size=4, seed=0).quantize(batch)
        fp = np.asarray(dit.model_fwd(params, batch, CFG), np.float32)
        e_r = float(np.mean((np.asarray(
            dit.model_fwd(rtn.params, batch, CFG), np.float32) - fp) ** 2))
        e_t = float(np.mean((np.asarray(
            dit.model_fwd(tuned.params, batch, CFG), np.float32) - fp) ** 2))
        assert e_t < e_r, (e_t, e_r)
