"""Host-offload quantization: params stay in host RAM, one block in HBM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig(vocab_size=64, hidden_size=256,
                            intermediate_size=256, num_layers=3,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 64)
    return cfg, params, ids


class TestOffloadParams:
    def test_matches_on_device_run(self, setup):
        cfg, params, ids = setup
        r0 = AutoRound((params, cfg), scheme="W4A16G32", iters=3,
                       seed=7).quantize(ids)
        r1 = AutoRound((params, cfg), scheme="W4A16G32", iters=3,
                       seed=7, offload_params=True).quantize(ids)
        for name in r0.layers:
            np.testing.assert_allclose(
                np.asarray(r0.layers[name].qdq, np.float32),
                np.asarray(r1.layers[name].qdq, np.float32),
                rtol=1e-6, atol=1e-6, err_msg=name)

    def test_result_blocks_are_host_arrays(self, setup):
        cfg, params, ids = setup
        r = AutoRound((params, cfg), scheme="W4A16G32", iters=0,
                      offload_params=True).quantize(ids)
        leaf = r.params["blocks"][0]["q_proj"]
        assert isinstance(leaf, np.ndarray)
        assert isinstance(r.layers["blocks.0.q_proj"].qdq, np.ndarray)

    def test_save_and_serve_from_offloaded_result(self, setup, tmp_path):
        cfg, params, ids = setup
        ar = AutoRound((params, cfg), scheme="W4A16", iters=0,
                       offload_params=True)
        res = ar.quantize(ids)
        ar.save_quantized(str(tmp_path / "m"), format="fake")
        # forward on the mixed host/device pytree still runs
        logits = llama.model_fwd(res.params, ids[:1, :4], cfg)
        assert jnp.isfinite(logits).all()

    def test_caller_params_not_mutated(self, setup):
        cfg, params, ids = setup
        before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
        AutoRound((params, cfg), scheme="W4A16G32", iters=0,
                  offload_params=True).quantize(ids)
        after = jax.tree.map(lambda x: np.asarray(x), params)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)


class TestOffloadPackedPull:
    """W4-sym offload transfers packed codes + scales (4.5x fewer
    host-link bytes) and reconstructs qdq host-side — must be EXACT
    against the on-device run in the model dtype."""

    def test_bf16_model_exact(self):
        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=256,
                                intermediate_size=512, num_layers=2,
                                num_heads=4, num_kv_heads=2,
                                rope_theta=1e4, dtype=jnp.bfloat16)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 64)
        host = jax.tree.map(np.asarray, params)
        r0 = AutoRound((params, cfg), scheme="W4A16G32", iters=3,
                       seed=7).quantize(ids)
        r1 = AutoRound((host, cfg), scheme="W4A16G32", iters=3,
                       seed=7, offload_params=True).quantize(ids)
        n_pack = 0
        for name in r0.layers:
            s0 = np.asarray(r0.layers[name].scale, np.float32)
            s1 = np.asarray(r1.layers[name].scale, np.float32)
            np.testing.assert_array_equal(s0, s1, err_msg=name)
            q1 = r1.layers[name].qdq
            # contract: offload qdq == model-dtype cast of the dev qdq
            q0 = np.asarray(r0.layers[name].qdq).astype(q1.dtype)
            np.testing.assert_array_equal(
                q0.astype(np.float32), np.asarray(q1, np.float32),
                err_msg=name)
            g = r0.layers[name].scheme.group_size
            if np.asarray(q0).shape[1] % (8 * g) == 0:
                n_pack += 1
        assert n_pack > 0  # the packed-pull path must actually trigger


class TestPackedW4Reuse:
    """The offload pull retains the exact W4 nibble planes
    (``QuantizedLayer.packed_w4``); the serving engine must ship them
    verbatim and produce an engine IDENTICAL to the recompute path
    (round-5 pack-time optimization — 0.5 byte/weight host->HBM)."""

    def test_engine_identical_with_and_without(self, setup):
        from autoround_tpu.serve import QuantizedLlama
        cfg, params, ids = setup
        r = AutoRound((params, cfg), scheme="W4A16G32", iters=0,
                      offload_params=True).quantize(ids)
        assert any(ql.packed_w4 is not None for ql in r.layers.values())
        e1 = QuantizedLlama.from_quantize_result(r, cfg, max_seq=32)
        for ql in r.layers.values():
            ql.packed_w4 = None
        e2 = QuantizedLlama.from_quantize_result(r, cfg, max_seq=32)
        assert set(e1.packed) == set(e2.packed)
        for k in e1.packed:
            for a, b in zip(e1.packed[k], e2.packed[k]):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b), err_msg=k)
        q = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)
        l1, _ = e1.prefill(q)
        l2, _ = e2.prefill(q)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_profile_populated(self, setup, monkeypatch):
        cfg, params, ids = setup
        monkeypatch.setenv("AR_PROFILE_PHASES", "1")
        r = AutoRound((params, cfg), scheme="W4A16G32", iters=2,
                      offload_params=True).quantize(ids)
        assert r.profile and "tune" in r.profile and "pull" in r.profile
        assert all(v >= 0 for v in r.profile.values())
