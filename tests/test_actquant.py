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


class TestActMinMaxTuning:
    """AR_ENABLE_ACT_MINMAX_TUNING (reference wrapper.py:209-211
    act_max_scale): tunable shrink on the static act scales.  Round-1
    regression: the env flag existed but nothing read it."""

    def test_act_scale_params_created_and_trained(self, monkeypatch):
        from autoround_tpu.algorithms.signround import (TuneConfig,
                                                        init_tune_params,
                                                        tune_block)
        from autoround_tpu.schemes import parse_scheme

        sch = parse_scheme("W8A8")  # static int8 act quant
        import dataclasses
        sch = dataclasses.replace(sch, act_dynamic=False)
        schemes = {"w": sch}
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32) * 0.1)
        static = {"w": jnp.asarray(0.02, jnp.float32)}
        weights = {"w": w, "_act_scales": {"static": static, "global": {}}}
        cfg = TuneConfig(iters=6, batch_size=4, tune_act_scales=True)
        params = init_tune_params(weights, schemes, cfg)
        assert "_act" in params and "w" in params["_act"]

        from autoround_tpu.algorithms.actquant import qdq_act

        def fwd(ws, xb):
            xq = qdq_act(xb, sch, static_scale=ws["_act_scales"]["static"]["w"])
            return jnp.einsum("bi,oi->bo", xq, ws["w"])

        x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
        ref = jnp.einsum("bi,oi->bo", x, w)
        best, info = tune_block(fwd, weights, x, ref, schemes, cfg)
        # the act-scale multiplier trained away from its 1.0 init
        # (sign-SGD moves it every step unless the gradient is exactly 0)
        m = float(best["_act"]["w"]["scale"])
        assert m != 1.0
        assert info["best_loss"] <= info["first_loss"]

    def test_env_flag_consumed_by_orchestrator(self, monkeypatch):
        monkeypatch.setenv("AR_ENABLE_ACT_MINMAX_TUNING", "1")
        from autoround_tpu import AutoRound
        from autoround_tpu.models import llama

        cfg = llama.CONFIG_PRESETS["tiny"]
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        res = AutoRound((params, cfg), scheme="FP8_STATIC", iters=2,
                        batch_size=2).quantize(ids)
        # static act scales exist and survived the tuned shrink
        ql = next(iter(res.layers.values()))
        assert ql.act_scale is not None
