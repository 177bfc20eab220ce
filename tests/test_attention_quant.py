"""Static attention-scale collection tests."""

import jax
import numpy as np

from autoround_tpu.models import llama
from autoround_tpu.quantize import QuantizeConfig, quantize_model, resolve_layer_schemes

CFG = llama.CONFIG_PRESETS["tiny"]


def test_attention_scales_collected():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    plan = resolve_layer_schemes(CFG.num_layers,
                                 llama.block_linear_names(CFG), "W4A16G32")
    cfg = QuantizeConfig(iters=0, quant_attention=True)
    res = quantize_model(params, CFG, plan, ids, cfg)
    assert set(res.attention_scales) == set(range(CFG.num_layers))
    for bi, scales in res.attention_scales.items():
        assert set(scales) == {"q_proj", "k_proj", "v_proj"}
        for v in scales.values():
            assert float(v) > 0


def test_off_by_default():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0,
                             CFG.vocab_size)
    plan = resolve_layer_schemes(CFG.num_layers,
                                 llama.block_linear_names(CFG), "W8A16")
    res = quantize_model(params, CFG, plan, ids, QuantizeConfig(iters=0))
    assert res.attention_scales == {}
