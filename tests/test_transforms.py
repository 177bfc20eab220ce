"""Transform tests: Hadamard R1 rotation (exact reparam) + AWQ smoothing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.schemes import parse_scheme
from autoround_tpu.transforms import (
    apply_r1_rotation,
    awq_smooth_block,
    fuse_rms_gains,
    hadamard_matrix,
)

CFG = llama.CONFIG_PRESETS["tiny"]  # hidden 64 = 2^6


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    # give the norms non-trivial gains so fusion is actually tested
    new_blocks = []
    for i, b in enumerate(params["blocks"]):
        b = dict(b)
        key = jax.random.PRNGKey(10 + i)
        b["input_layernorm"] = 1.0 + 0.1 * jax.random.normal(
            key, b["input_layernorm"].shape)
        b["post_attention_layernorm"] = 1.0 + 0.1 * jax.random.normal(
            jax.random.fold_in(key, 1), b["post_attention_layernorm"].shape)
        new_blocks.append(b)
    params["blocks"] = new_blocks
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                             CFG.vocab_size)
    return params, ids


class TestHadamard:
    @pytest.mark.parametrize("n", [64, 128, 96])
    def test_orthonormal(self, n):
        h = hadamard_matrix(n)
        np.testing.assert_allclose(h @ h.T, np.eye(n), atol=1e-10)

    def test_random_diag_still_orthonormal(self):
        h = hadamard_matrix(64, seed=3)
        np.testing.assert_allclose(h @ h.T, np.eye(64), atol=1e-10)

    def test_fuse_rms_gains_preserves_logits(self, setup):
        params, ids = setup
        fused = fuse_rms_gains(params, CFG)
        l0 = llama.model_fwd(params, ids[:2], CFG)
        l1 = llama.model_fwd(fused, ids[:2], CFG)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=1e-4, atol=1e-4)
        assert np.allclose(np.asarray(fused["blocks"][0]["input_layernorm"]),
                           1.0)

    def test_r1_rotation_preserves_logits(self, setup):
        params, ids = setup
        rotated = apply_r1_rotation(params, CFG, seed=0)
        l0 = llama.model_fwd(params, ids[:2], CFG)
        l1 = llama.model_fwd(rotated, ids[:2], CFG)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=2e-3, atol=2e-3)

    def test_rotation_changes_weights(self, setup):
        params, _ = setup
        rotated = apply_r1_rotation(params, CFG, seed=0)
        assert not np.allclose(np.asarray(rotated["blocks"][0]["q_proj"]),
                               np.asarray(params["blocks"][0]["q_proj"]))


class TestR4Rotation:
    def test_exact_reparam(self, setup):
        """Rotated weights + runtime activation rotation = same logits."""
        from autoround_tpu.transforms import apply_r4_rotation

        params, ids = setup
        l0 = llama.model_fwd(params, ids, CFG)
        p4, cfg4 = apply_r4_rotation(params, CFG, block=128)
        assert cfg4.online_r4
        l1 = llama.model_fwd(p4, ids, cfg4)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=1e-4, atol=1e-4)

    def test_spreads_outliers(self):
        """A single huge channel becomes 128 moderate ones."""
        x = jnp.zeros((1, 1, 128)).at[0, 0, 7].set(100.0)
        y = llama.r4_rotate(x, 128)
        assert float(jnp.max(jnp.abs(y))) == pytest.approx(
            100.0 / np.sqrt(128), rel=1e-5)

    def test_quantize_and_serve_with_r4(self):
        from autoround_tpu.serve import QuantizedLlama

        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=1024,
                                intermediate_size=1024, num_layers=2,
                                num_heads=4, num_kv_heads=2,
                                rope_theta=1e4, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
        ar = AutoRound((params, cfg), scheme="W4A8", iters=2,
                       enable_rotation="r4")
        res = ar.quantize(ids)
        assert ar.model_cfg.online_r4
        for t in res.loss_traces.values():
            assert np.isfinite(t).all()
        eng = QuantizedLlama.from_quantize_result(res, ar.model_cfg,
                                                  max_seq=32)
        logits, _ = eng.prefill(ids)
        full = llama.model_fwd(res.params, ids, ar.model_cfg)
        np.testing.assert_allclose(np.asarray(logits, np.float32),
                                   np.asarray(full[:, -1], np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_unknown_rotation_mode(self):
        with pytest.raises(ValueError, match="unknown rotation"):
            AutoRound((llama.init_params(CFG, jax.random.PRNGKey(0)), CFG),
                      scheme="W4A16", iters=0, enable_rotation="r9")


class TestAwq:
    def test_smoothing_preserves_fp_output(self, setup):
        params, ids = setup
        block = params["blocks"][0]
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, CFG.hidden_size))
        cos, sin = llama.rope_tables(CFG, 8)
        fwd = lambda w, xx, linear_fn=None: llama.block_fwd(
            w, xx, cos, sin, CFG, linear_fn=linear_fn)
        schemes = {n: parse_scheme("W2A16G64")
                   for n in llama.block_linear_names(CFG)}
        smoothed, alphas = awq_smooth_block(block, fwd, x, schemes)
        out0 = fwd(block, x)
        out1 = fwd(smoothed, x)
        np.testing.assert_allclose(np.asarray(out1, np.float32),
                                   np.asarray(out0, np.float32),
                                   rtol=1e-3, atol=1e-4)

    def test_smoothing_not_worse_quantized(self, setup):
        params, ids = setup
        block = params["blocks"][0]
        # craft an outlier channel to give AWQ something to fix
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, CFG.hidden_size))
        x = x.at[..., 0].mul(30.0)
        cos, sin = llama.rope_tables(CFG, 8)
        fwd = lambda w, xx, linear_fn=None: llama.block_fwd(
            w, xx, cos, sin, CFG, linear_fn=linear_fn)
        schemes = {n: parse_scheme("W2A16G64")
                   for n in llama.block_linear_names(CFG)}
        from autoround_tpu.algorithms.rtn import rtn_quantize_layer

        def qmse(b):
            qb = dict(b)
            for n, s in schemes.items():
                qb[n] = rtn_quantize_layer(qb[n], s).qdq.astype(qb[n].dtype)
            return float(jnp.mean((fwd(qb, x).astype(jnp.float32)
                                   - fwd(b, x).astype(jnp.float32)) ** 2))

        smoothed, _ = awq_smooth_block(block, fwd, x, schemes)
        assert qmse(smoothed) <= qmse(block) * 1.001

    def test_pipeline_with_awq_and_rotation(self, setup):
        params, ids = setup
        res = AutoRound((params, CFG), scheme="W2A16G64", iters=3,
                        batch_size=4, enable_awq=True,
                        enable_rotation=True).quantize(ids)
        assert len(res.layers) == CFG.num_layers * 7


class TestAwqClipSearch:
    """Reference awq/base.py:120-125 clip search; result seeds the
    min/max clip init (wrapper.py:173-175)."""

    def test_clip_ratios_shape_and_range(self):
        from autoround_tpu.schemes import parse_scheme
        from autoround_tpu.transforms.awq import awq_clip_search

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
        schemes = {"q_proj": parse_scheme("W2A16G64")}
        im = {"q_proj": jnp.ones((64,), jnp.float32)}
        seeds = awq_clip_search({"q_proj": w}, schemes, im)
        assert seeds["q_proj"].shape == (8, 1)
        r = np.asarray(seeds["q_proj"])
        assert (r <= 1.0).all() and (r >= 0.5).all()
        # at 2 bits shrinking the range helps typical gaussian rows:
        # the search must actually pick sub-1 ratios somewhere
        assert r.min() < 1.0

    def test_clip_seed_improves_w2_error(self):
        """W2: the searched clip init must beat the unclipped init on
        the (deterministic) weight reconstruction error it optimizes,
        and tuning from the seed must still converge (VERDICT #8)."""
        from autoround_tpu.algorithms.signround import (TuneConfig,
                                                        tune_block)
        from autoround_tpu.dtypes.registry import get_quant_func
        from autoround_tpu.schemes import parse_scheme
        from autoround_tpu.transforms.awq import awq_clip_search

        rng = np.random.default_rng(1)
        O, I = 16, 64
        w = jnp.asarray(rng.standard_normal((O, I)).astype(np.float32) * 0.1)
        sch = parse_scheme("W2A16G64")
        seeds = awq_clip_search({"w": w}, {"w": sch},
                                {"w": jnp.ones((I,), jnp.float32)})
        fn = get_quant_func(sch.data_type, sch.bits, sch.sym)

        def werr(ms):
            qdq = fn(w, bits=2, group_size=64, min_scale=ms, max_scale=ms,
                     clip_lo=0.0, clip_hi=1.0).qdq
            return float(((qdq - w) ** 2).sum())

        seeded = werr(seeds["w"].astype(jnp.float32))
        plain = werr(jnp.ones((O, 1), jnp.float32))
        assert seeded < plain

        # tuning from the seed converges (loss decreases)
        x = jnp.asarray(rng.standard_normal((16, I)).astype(np.float32))
        ref = jnp.einsum("bi,oi->bo", x, w)
        fwd = lambda ws, xb: jnp.einsum("bi,oi->bo", xb, ws["w"])
        cfg = TuneConfig(iters=8, batch_size=4)
        _, info = tune_block(fwd, {"w": w}, x, ref, {"w": sch}, cfg,
                             init_scales=seeds)
        assert info["best_loss"] <= info["first_loss"]
