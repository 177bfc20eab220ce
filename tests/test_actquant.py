"""Activation-quantization tests: qdq math + scheme-driven pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu import AutoRound
from autoround_tpu.algorithms.actquant import (
    build_static_act_scales,
    collect_act_stats,
    make_act_quant_linear_fn,
    qdq_act,
)
from autoround_tpu.models import llama
from autoround_tpu.schemes import parse_scheme

CFG = llama.CONFIG_PRESETS["tiny"]


class TestQdqAct:
    def test_int8_per_tensor_dynamic(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 64))
        s = parse_scheme("W8A8")
        y = qdq_act(x, s)
        assert y.shape == x.shape
        err = float(jnp.max(jnp.abs(y - x)))
        step = float(jnp.max(jnp.abs(x))) / 127
        assert err <= step

    def test_int_per_token(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        s = parse_scheme({"bits": 4, "act_bits": 8, "act_group_size": -1,
                          "act_sym": True, "act_data_type": "int"})
        y = qdq_act(x, s)
        # per-token: each row's max error bounded by that row's step
        steps = np.max(np.abs(np.asarray(x)), axis=-1) / 127
        errs = np.max(np.abs(np.asarray(y - x)), axis=-1)
        assert (errs <= steps + 1e-7).all()

    def test_mxfp4_act(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 64))
        y = qdq_act(x, parse_scheme("MXFP4"))
        assert y.shape == x.shape
        assert not np.allclose(np.asarray(y), np.asarray(x))

    def test_nvfp4_act_with_global_scale(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 64))
        s = parse_scheme("NVFP4")
        gs = jnp.asarray(448.0 * 6.0) / jnp.max(jnp.abs(x))
        y = qdq_act(x, s, global_scale=gs)
        assert y.shape == x.shape

    def test_fp8_static(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 64))
        s = parse_scheme("FP8_STATIC")
        scale = jnp.max(jnp.abs(x)) / 448.0
        y = qdq_act(x, s, static_scale=scale)
        enc = np.asarray(y, np.float32) / float(scale)
        rt = enc.astype(jnp.float8_e4m3fn).astype(np.float32)
        np.testing.assert_allclose(enc, rt, rtol=1e-5, atol=1e-6)

    def test_unquantized_passthrough(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (4, 64))
        y = qdq_act(x, parse_scheme("W4A16"))
        assert y is x


class TestStats:
    def test_collect_and_static_scales(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        block = params["blocks"][0]
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, CFG.hidden_size),
                              CFG.dtype)
        cos, sin = llama.rope_tables(CFG, 8)
        names = ["q_proj", "down_proj"]
        amax = collect_act_stats(
            lambda w, xb, lf: llama.block_fwd(w, xb, cos, sin, CFG,
                                              linear_fn=lf),
            block, x, names)
        assert set(amax) == set(names)
        assert all(float(v) > 0 for v in amax.values())

        schemes = {n: parse_scheme("FP8_STATIC") for n in names}
        ss, gs = build_static_act_scales(schemes, amax)
        assert set(ss) == set(names) and not gs
        schemes_nv = {n: parse_scheme("NVFP4") for n in names}
        ss2, gs2 = build_static_act_scales(schemes_nv, amax)
        assert set(gs2) == set(names) and not ss2


class TestPipelineWithActQuant:
    def test_w4a8_quantize(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((params, CFG), scheme="W4A8", iters=5,
                        batch_size=4).quantize(ids)
        assert len(res.layers) == CFG.num_layers * 7

    def test_fp8_static_records_act_scales(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((params, CFG), scheme="FP8_STATIC",
                        iters=0).quantize(ids)
        ql = res.layers["blocks.0.q_proj"]
        assert ql.act_scale is not None and float(ql.act_scale) > 0

    def test_nvfp4_records_global_scales(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        res = AutoRound((params, CFG), scheme="NVFP4", iters=0).quantize(ids)
        ql = res.layers["blocks.1.up_proj"]
        assert ql.act_global_scale is not None
