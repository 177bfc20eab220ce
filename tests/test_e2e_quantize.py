"""End-to-end: quantize a tiny random llama, check accuracy ordering and
save/load round-trips.

Model of the reference's e2e tier (``test/e2e/test_cpu/
test_llm_quantize_accuracy.py``): real pipeline on a tiny model with loose
floors — here the "floor" is that tuned W2 must beat RTN W2 on calib-data
perplexity proxy, and W4 must be close to FP.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.export import load_fake, save_quantized
from autoround_tpu.models import llama
from autoround_tpu.quantize import QuantizeConfig, quantize_model, resolve_layer_schemes
from autoround_tpu.schemes import parse_scheme


CFG = llama.CONFIG_PRESETS["tiny"]


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (16, 32), 0, CFG.vocab_size)
    return params, ids


def logits_mse(params_a, params_b, ids):
    la = llama.model_fwd(params_a, ids, CFG)
    lb = llama.model_fwd(params_b, ids, CFG)
    return float(jnp.mean((la.astype(jnp.float32) - lb.astype(jnp.float32)) ** 2))


class TestE2E:
    def test_rtn_path(self, setup):
        params, ids = setup
        ar = AutoRound((params, CFG), scheme="W4A16", iters=0)
        res = ar.quantize(ids)
        assert len(res.layers) == CFG.num_layers * 7
        err = logits_mse(params, res.params, ids[:4])
        base = float(jnp.mean(
            llama.model_fwd(params, ids[:4], CFG).astype(jnp.float32) ** 2))
        assert err < base  # quantized logits still correlated

    def test_mxfp6_preset(self, setup):
        # MXFP6 (reference schemes.py:631): e2m3 elements, group 32,
        # pow-2 shared scale; must quantize e2e and beat MXFP4 on error
        params, ids = setup
        r6 = AutoRound((params, CFG), scheme="MXFP6", iters=0,
                       donate_params=False).quantize(ids)
        r4 = AutoRound((params, CFG), scheme="MXFP4", iters=0,
                       donate_params=False).quantize(ids)
        s = next(iter(r6.layers.values())).scheme
        assert s.bits == 6 and s.data_type == "mx_fp" and s.group_size == 32
        e6 = logits_mse(params, r6.params, ids[:4])
        e4 = logits_mse(params, r4.params, ids[:4])
        assert e6 < e4

    def test_tuned_beats_rtn_w2(self, setup):
        params, ids = setup
        rtn = AutoRound((params, CFG), scheme="W2A16G64", iters=0).quantize(ids)
        tuned = AutoRound((params, CFG), scheme="W2A16G64", iters=30,
                          batch_size=4, seed=0).quantize(ids)
        err_rtn = logits_mse(params, rtn.params, ids[:8])
        err_tuned = logits_mse(params, tuned.params, ids[:8])
        assert err_tuned < err_rtn, (err_tuned, err_rtn)

    def test_loss_decreases_per_block(self, setup):
        params, ids = setup
        res = AutoRound((params, CFG), scheme="W2A16G64", iters=30,
                        batch_size=4).quantize(ids)
        for bi, trace in res.loss_traces.items():
            assert np.min(trace) <= trace[0] + 1e-9

    def test_layer_config_overrides(self, setup):
        params, ids = setup
        ar = AutoRound((params, CFG), scheme="W4A16", iters=0,
                       layer_config={"down_proj": {"bits": 8}},
                       ignore_layers=["blocks.0.q_proj"])
        res = ar.quantize(ids)
        assert "blocks.0.q_proj" not in res.layers
        assert res.layers["blocks.0.down_proj"].scheme.bits == 8
        assert res.layers["blocks.0.up_proj"].scheme.bits == 4

    def test_fake_save_load_roundtrip(self, setup, tmp_path):
        params, ids = setup
        ar = AutoRound((params, CFG), scheme="W4A16", iters=0)
        res = ar.quantize(ids)
        out = ar.save_quantized(str(tmp_path / "ckpt"), format="fake")
        loaded, qcfg = load_fake(out)
        assert qcfg["quant_method"] == "auto-round"
        l0 = llama.model_fwd(res.params, ids[:2], CFG)
        l1 = llama.model_fwd(loaded, ids[:2], CFG)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   rtol=1e-5, atol=1e-5)

    def test_autoround_packed_export(self, setup, tmp_path):
        params, ids = setup
        ar = AutoRound((params, CFG), scheme="W4A16G32", iters=0)
        res = ar.quantize(ids)
        out = ar.save_quantized(str(tmp_path / "packed"), format="autoround")
        from safetensors.numpy import load_file
        t = load_file(os.path.join(out, "model.safetensors"))
        assert "blocks.0.q_proj.qweight" in t
        assert "blocks.0.q_proj.scales" in t
        # round-trip: unpack and compare dequant vs qdq
        from autoround_tpu.export.packing import unpack_quantized
        ql = res.layers["blocks.0.q_proj"]
        O, I = ql.qdq.shape
        payload = {k.split(".")[-1]: t[f"blocks.0.q_proj.{k.split('.')[-1]}"]
                   for k in ["qweight", "qzeros", "scales"]}
        q, s, zp = unpack_quantized(payload, 4, O, I)
        g = 32
        dq = (q.astype(np.float32)
              - np.repeat(zp, g, 1)[:, :I]) * np.repeat(s, g, 1)[:, :I]
        np.testing.assert_allclose(dq, np.asarray(ql.qdq, np.float32),
                                   rtol=1e-2, atol=1e-3)

    def test_disable_quanted_input(self, setup):
        params, ids = setup
        res = AutoRound((params, CFG), scheme="W4A16", iters=5, batch_size=4,
                        enable_quanted_input=False).quantize(ids)
        assert len(res.layers) == CFG.num_layers * 7

    def test_qwen_bias_variant(self):
        cfg = llama.CONFIG_PRESETS["tiny-qwen"]
        params = llama.init_params(cfg, jax.random.PRNGKey(2))
        ids = jax.random.randint(jax.random.PRNGKey(3), (8, 16), 0, cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="W4A16", iters=5,
                        batch_size=4).quantize(ids)
        assert len(res.layers) == cfg.num_layers * 7
