"""Joint multi-block (nblocks>1) tuning tests."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu import AutoRound
from autoround_tpu.models import llama

CFG = llama.CONFIG_PRESETS["tiny"]  # 2 blocks


def test_nblocks2_quantizes_all_layers():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    res = AutoRound((params, CFG), scheme="W2A16G64", iters=10,
                    batch_size=4, nblocks=2).quantize(ids)
    assert len(res.layers) == CFG.num_layers * 7
    for bi, trace in res.loss_traces.items():
        assert np.min(trace) <= trace[0] + 1e-9
    # quantized model still runs
    logits = llama.model_fwd(res.params, ids[:2], CFG)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_nblocks_beats_or_matches_single_block():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (16, 32), 0,
                             CFG.vocab_size)
    single = AutoRound((params, CFG), scheme="W2A16G64", iters=30,
                       batch_size=4, seed=0).quantize(ids)
    joint = AutoRound((params, CFG), scheme="W2A16G64", iters=30,
                      batch_size=4, seed=0, nblocks=2).quantize(ids)
    fp = np.asarray(llama.model_fwd(params, ids[:8], CFG), np.float32)
    e_s = float(np.mean((np.asarray(
        llama.model_fwd(single.params, ids[:8], CFG), np.float32) - fp) ** 2))
    e_j = float(np.mean((np.asarray(
        llama.model_fwd(joint.params, ids[:8], CFG), np.float32) - fp) ** 2))
    # joint tuning sees the end-of-group objective; allow modest slack
    assert e_j <= e_s * 1.5, (e_j, e_s)


class TestNblocksAux:
    """Resume / immediate-save / AWQ with nblocks>1 (round-1 weak #10:
    they used to vanish with a warning)."""

    def _cfg4(self):
        import dataclasses
        return dataclasses.replace(CFG, num_layers=4)

    def test_resume_bitwise_identical(self, tmp_path, monkeypatch):
        from autoround_tpu.quantize import (QuantizeConfig, quantize_model,
                                            resolve_layer_schemes)
        from autoround_tpu.utils.resume import ResumeState
        cfg4 = self._cfg4()
        params = llama.init_params(cfg4, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 cfg4.vocab_size)
        plan = resolve_layer_schemes(cfg4.num_layers,
                                     llama.block_linear_names(cfg4),
                                     "W4A16G32")
        qc = lambda **kw: QuantizeConfig(iters=4, batch_size=4, nblocks=2,
                                         **kw)
        base = quantize_model(params, cfg4, plan, ids, qc())

        rdir = str(tmp_path / "r")
        orig = ResumeState.mark_block_done
        calls = {"n": 0}

        class Crash(Exception):
            pass

        def crashing(self, i, payload, x_fp, x_q):
            orig(self, i, payload, x_fp, x_q)
            calls["n"] += 1
            if calls["n"] == 2:   # first group (2 blocks) fully marked
                raise Crash()

        monkeypatch.setattr(ResumeState, "mark_block_done", crashing)
        import pytest as _pytest
        with _pytest.raises(Crash):
            quantize_model(params, cfg4, plan, ids, qc(resume_dir=rdir))
        monkeypatch.setattr(ResumeState, "mark_block_done", orig)

        res = quantize_model(params, cfg4, plan, ids, qc(resume_dir=rdir))
        for name, ql in base.layers.items():
            np.testing.assert_array_equal(
                np.asarray(ql.qdq, np.float32),
                np.asarray(res.layers[name].qdq, np.float32),
                err_msg=name)

    def test_immediate_save_writes_shards(self, tmp_path):
        import os
        d = str(tmp_path / "imm")
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        AutoRound((params, CFG), scheme="W4A16G32", iters=2, batch_size=4,
                  nblocks=2, immediate_save_dir=d).quantize(ids)
        from safetensors import safe_open
        shards = [f for f in os.listdir(d) if f.endswith(".safetensors")]
        assert shards
        keys = set()
        for s in shards:
            with safe_open(os.path.join(d, s), framework="numpy") as f:
                keys |= set(f.keys())
        assert any(k.endswith(".qweight") for k in keys)
        assert "embed_tokens" in keys

    def test_awq_raises(self):
        import pytest as _pytest
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        with _pytest.raises(ValueError, match="nblocks"):
            AutoRound((params, CFG), scheme="W4A16G32", iters=2,
                      nblocks=2, enable_awq=True).quantize(ids)
