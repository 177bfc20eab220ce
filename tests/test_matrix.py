"""Scheme x format compatibility matrix (model of the reference's weekly
e2e matrix over model x format x bits)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama


@pytest.fixture(scope="module")
def quantizable():
    # dims divisible by 256 so GGUF/k-quant formats apply everywhere
    cfg = llama.LlamaConfig(vocab_size=128, hidden_size=256,
                            intermediate_size=512, num_layers=1,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    return cfg, params, ids


SCHEME_FORMAT_MATRIX = [
    ("W4A16", "fake"),
    ("W4A16", "autoround"),
    ("W4A16", "gptq"),
    ("W4A16", "awq"),
    ("W4A16", "llm_compressor"),
    ("W4A16", "gguf:q4_k_m"),
    ("W8A16", "gptq"),
    ("W2A16G64", "autoround"),
    ("GGUF:Q4_K_S", "fake"),
    ("GGUF:Q4_K_S", "gguf:q4_k_s"),
    ("MXFP4", "fake"),
    ("NVFP4", "fake"),
    ("FP8_STATIC", "fake"),
    ("W4A8", "autoround"),
]


@pytest.mark.parametrize("scheme,fmt", SCHEME_FORMAT_MATRIX)
def test_scheme_format_combo(quantizable, tmp_path, scheme, fmt):
    cfg, params, ids = quantizable
    ar = AutoRound((params, cfg), scheme=scheme, iters=0)
    ar.quantize(ids)
    out = ar.save_quantized(str(tmp_path / "o"), format=fmt)
    if fmt.startswith("gguf"):
        assert os.path.exists(os.path.join(out, "model.gguf"))
    else:
        assert os.path.exists(os.path.join(out, "model.safetensors"))


def test_multi_format_save(quantizable, tmp_path):
    cfg, params, ids = quantizable
    ar = AutoRound((params, cfg), scheme="W4A16", iters=0)
    ar.quantize(ids)
    out = ar.save_quantized(str(tmp_path / "multi"),
                            format="fake,gptq,gguf:q8_0")
    assert os.path.exists(os.path.join(out, "fake", "model.safetensors"))
    assert os.path.exists(os.path.join(out, "gptq", "model.safetensors"))
    assert os.path.exists(os.path.join(out, "gguf_q8_0", "model.gguf"))
