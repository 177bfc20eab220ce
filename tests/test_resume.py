"""Crash-resume integration test (model of the reference's
``core/test_resume_integration.py``): interrupt after block 0, resume,
and require bit-identical results vs an uninterrupted run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.models import llama
from autoround_tpu.quantize import QuantizeConfig, quantize_model, resolve_layer_schemes
from autoround_tpu.utils.resume import ResumeState, run_signature

CFG = llama.CONFIG_PRESETS["tiny"]


@pytest.fixture()
def setup():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    plan = resolve_layer_schemes(CFG.num_layers,
                                 llama.block_linear_names(CFG), "W4A16G32")
    return params, ids, plan


class CrashAfterBlock(Exception):
    pass


def test_resume_bitwise_identical(setup, tmp_path, monkeypatch):
    params, ids, plan = setup
    rdir = str(tmp_path / "resume")
    cfg = QuantizeConfig(iters=5, batch_size=4, resume_dir=rdir)

    # uninterrupted baseline (no resume dir)
    base = quantize_model(params, CFG, plan, ids,
                          QuantizeConfig(iters=5, batch_size=4))

    # run 1: crash right after the first block is marked done
    orig_mark = ResumeState.mark_block_done
    calls = {"n": 0}

    def crashing_mark(self, i, payload, x_fp, x_q):
        orig_mark(self, i, payload, x_fp, x_q)
        calls["n"] += 1
        if calls["n"] == 1:
            raise CrashAfterBlock()

    monkeypatch.setattr(ResumeState, "mark_block_done", crashing_mark)
    with pytest.raises(CrashAfterBlock):
        quantize_model(params, CFG, plan, ids, cfg)
    monkeypatch.setattr(ResumeState, "mark_block_done", orig_mark)

    # run 2: resumes from block 1 and must match the baseline exactly
    res = quantize_model(params, CFG, plan, ids, cfg)
    assert 0 in ResumeState(rdir, run_signature(CFG, plan, ids, cfg)).done
    for name, ql in base.layers.items():
        np.testing.assert_array_equal(
            np.asarray(ql.qdq, np.float32),
            np.asarray(res.layers[name].qdq, np.float32), err_msg=name)


def test_signature_mismatch_restarts(setup, tmp_path):
    params, ids, plan = setup
    rdir = str(tmp_path / "resume2")
    cfg = QuantizeConfig(iters=2, batch_size=4, resume_dir=rdir)
    quantize_model(params, CFG, plan, ids, cfg)
    # different iters → different signature → fresh ResumeState
    cfg2 = QuantizeConfig(iters=3, batch_size=4, resume_dir=rdir)
    st = ResumeState(rdir, run_signature(CFG, plan, ids, cfg2))
    assert st.next_block() == 0
