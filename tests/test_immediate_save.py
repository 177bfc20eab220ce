"""Immediate streaming pack during quantization."""

import json
import os

import jax
import numpy as np
import pytest
from safetensors.numpy import load_file

from autoround_tpu.models import llama
from autoround_tpu.quantize import QuantizeConfig, quantize_model, resolve_layer_schemes

CFG = llama.CONFIG_PRESETS["tiny"]


def test_immediate_pack_streams_all_tensors(tmp_path):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    plan = resolve_layer_schemes(CFG.num_layers,
                                 llama.block_linear_names(CFG), "W4A16G32")
    out = str(tmp_path / "stream")
    cfg = QuantizeConfig(iters=2, batch_size=4, immediate_save_dir=out,
                         shard_size_bytes=20_000)
    res = quantize_model(params, CFG, plan, ids, cfg)

    idx = json.load(open(os.path.join(out, "model.safetensors.index.json")))
    wm = idx["weight_map"]
    # every quantized layer appears as packed triplet
    for name in res.layers:
        for suffix in ("qweight", "qzeros", "scales"):
            assert f"{name}.{suffix}" in wm, f"{name}.{suffix}"
        assert name not in wm  # dense copy not duplicated
    # non-quantized leaves present
    assert "embed_tokens" in wm and "blocks.0.input_layernorm" in wm
    # multiple shards under the small budget
    assert len(set(wm.values())) >= 2
    # spot-check a packed tensor round-trips against the result
    fname = wm["blocks.0.q_proj.qweight"]
    t = load_file(os.path.join(out, fname))
    assert t["blocks.0.q_proj.qweight"].dtype == np.int32
