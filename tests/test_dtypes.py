"""Numeric-core tests: qdq math, STE gradients, registry resolution.

Style follows the reference's data_type tests (direct assertions on the
qdq formulas, ``test/unit/test_cpu/data_type/``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.dtypes import (
    MX_FORMATS,
    get_quant_func,
    qdq_fp8_block,
    qdq_fp8_sym,
    qdq_int_asym,
    qdq_int_sym,
    qdq_mx,
    qdq_nvfp4,
    opt_rtn_int_sym,
    round_ste,
)
from autoround_tpu.schemes import PRESET_SCHEMES, parse_scheme


KEY = jax.random.PRNGKey(0)


def rand_w(o=64, i=256, dtype=jnp.float32, key=KEY):
    return jax.random.normal(key, (o, i), dtype) * 0.1


class TestSte:
    def test_round_ste_value_and_grad(self):
        x = jnp.array([0.4, 0.6, -1.5, 2.5])
        np.testing.assert_allclose(round_ste(x), jnp.round(x))
        g = jax.grad(lambda t: jnp.sum(round_ste(t)))(x)
        np.testing.assert_allclose(g, jnp.ones_like(x))


class TestIntSym:
    @pytest.mark.parametrize("bits,group_size", [(2, 64), (4, 128), (8, -1), (4, 32)])
    def test_levels_and_range(self, bits, group_size):
        w = rand_w()
        r = qdq_int_sym(w, bits, group_size)
        # qdq values per group must lie on at most 2^bits distinct levels
        g = group_size if group_size > 0 else w.shape[1]
        grouped = np.asarray(r.qdq).reshape(-1, g)
        for row in grouped[:8]:
            assert len(np.unique(np.round(row, 6))) <= 2 ** bits
        assert r.qdq.shape == w.shape
        assert r.scale.shape == (w.shape[0], w.shape[1] // g)

    def test_full_range_extreme_maps_exactly(self):
        # The dominant extreme of each group must be exactly representable
        # (full-range trick: extreme sits on the -2^(b-1) code).
        w = jnp.array([[1.0, -2.0, 0.5, 0.3]])
        r = qdq_int_sym(w, 4, 4)
        assert abs(float(r.qdq[0, 1]) - (-2.0)) < 1e-6
        w2 = jnp.array([[1.0, -0.5, 0.25, 0.3]])
        r2 = qdq_int_sym(w2, 4, 4)
        assert abs(float(r2.qdq[0, 0]) - 1.0) < 1e-6

    def test_error_bounded_by_one_step(self):
        # Half-step for interior values; the non-dominant extreme may clip
        # by up to a full step (it sits past the maxq-1 code).
        w = rand_w()
        r = qdq_int_sym(w, 8, 128)
        step = np.abs(np.asarray(r.scale)).max()
        assert float(jnp.max(jnp.abs(r.qdq - w))) <= step + 1e-6

    def test_v_offset_changes_rounding(self):
        w = jnp.full((1, 4), 0.30)
        base = qdq_int_sym(w, 4, 4)
        v = jnp.full((1, 4), 0.75)  # push round(w/s + v) up one level
        shifted = qdq_int_sym(w, 4, 4, v=v)
        assert not np.allclose(base.qdq, shifted.qdq)

    def test_grads_flow_to_tunables(self):
        w = rand_w(16, 64)
        v = jnp.zeros_like(w)
        mn = jnp.ones((16 * 64 // 32,))
        mx = jnp.ones_like(mn)

        def loss(v, mn, mx):
            r = qdq_int_sym(w, 4, 32, v=v, min_scale=mn, max_scale=mx,
                            clip_lo=0.0, clip_hi=1.0)
            return jnp.sum((r.qdq - w) ** 2)

        gv, gmn, gmx = jax.grad(loss, argnums=(0, 1, 2))(v, mn, mx)
        assert float(jnp.max(jnp.abs(gv))) > 0


class TestIntAsym:
    def test_roundtrip_error(self):
        w = rand_w() + 0.05  # asymmetric distribution
        r = qdq_int_asym(w, 4, 128)
        assert r.zp is not None
        err = float(jnp.mean(jnp.abs(r.qdq - w)))
        step = float(jnp.mean(r.scale))
        assert err < step  # mean |err| well under one step

    def test_zero_exactly_representable(self):
        # asym must represent 0 exactly (zp on the grid)
        w = jnp.array([[0.0, 0.7, 1.3, 2.1]])
        r = qdq_int_asym(w, 4, 4)
        assert abs(float(r.qdq[0, 0])) < 1e-6


class TestOptRtn:
    def test_imatrix_weighting_prefers_important_channels(self):
        w = rand_w(32, 64, key=jax.random.PRNGKey(1))
        im = jnp.ones((64,)).at[:8].set(100.0)
        r = opt_rtn_int_sym(w, 2, 64, imatrix=im)
        r0 = opt_rtn_int_sym(w, 2, 64)
        werr = jnp.sum(im[None, :] * (r.qdq - w) ** 2)
        werr0 = jnp.sum(im[None, :] * (r0.qdq - w) ** 2)
        assert float(werr) <= float(werr0) + 1e-6

    def test_search_beats_or_matches_plain_rtn(self):
        w = rand_w(32, 64, key=jax.random.PRNGKey(2))
        plain = qdq_int_sym(w, 2, 64)
        opt = opt_rtn_int_sym(w, 2, 64)
        assert float(jnp.sum((opt.qdq - w) ** 2)) <= float(
            jnp.sum((plain.qdq - w) ** 2)) + 1e-6


class TestMx:
    def test_fp4_grid(self):
        # E2M1 representable magnitudes: 0, .5, 1, 1.5, 2, 3, 4, 5, 6 (x scale)
        w = jnp.array([[0.9, 2.6, 5.6, -0.24, 6.0, 0.1, 0.74, 1.3,
                        0.0, 3.5, -4.4, 1.8, 2.2, -6.0, 0.4, 0.26] * 2])
        r = qdq_mx(w, "mx_fp4", group_size=32)
        scale = float(r.scale[0, 0])
        vals = np.abs(np.asarray(r.qdq)) / scale
        grid = np.array([0, .5, 1, 1.5, 2, 3, 4, 5, 6])
        for v in vals.ravel():
            assert np.min(np.abs(grid - v)) < 1e-5, v

    def test_shared_scale_is_pow2(self):
        w = rand_w(8, 64)
        r = qdq_mx(w, "mx_fp4", group_size=32)
        log2s = np.log2(np.asarray(r.scale))
        np.testing.assert_allclose(log2s, np.round(log2s), atol=1e-6)

    @pytest.mark.parametrize("name", list(MX_FORMATS))
    def test_max_norm_respected(self, name):
        w = rand_w(8, 64, key=jax.random.PRNGKey(3))
        r = qdq_mx(w, name, group_size=32)
        ratio = np.abs(np.asarray(r.qdq)) / np.asarray(
            np.repeat(r.scale, 32, axis=1))
        assert ratio.max() <= MX_FORMATS[name].max_norm + 1e-5

    def test_rceil_scale_at_least_floor(self):
        w = rand_w(8, 64, key=jax.random.PRNGKey(4))
        rf = qdq_mx(w, "mx_fp4", group_size=32, rounding="floor")
        rc = qdq_mx(w, "mx_fp4", group_size=32, rounding="rceil")
        # rceil guarantees no clipping: amax/scale <= max_norm
        amax = np.abs(np.asarray(w)).reshape(-1, 32).max(axis=1)
        assert (amax / np.asarray(rc.scale).ravel() <= 6.0 + 1e-5).all()

    def test_grad_flows_through_mx(self):
        w = rand_w(8, 64)
        g = jax.grad(lambda t: jnp.sum(qdq_mx(t, "mx_fp4", 32).qdq ** 2))(w)
        assert float(jnp.max(jnp.abs(g))) > 0


class TestNvfp4:
    def test_shapes_and_grid(self):
        w = rand_w(8, 64)
        r = qdq_nvfp4(w, group_size=16)
        assert r.scale.shape == (8, 4)
        scales = np.repeat(np.asarray(r.scale), 16, axis=1)
        vals = np.abs(np.asarray(r.qdq)) / scales
        grid = np.array([0, .5, 1, 1.5, 2, 3, 4, 5, 6])
        assert np.min(np.abs(grid[None, None, :] - vals[..., None]), -1).max() < 1e-4

    def test_scales_are_e4m3_representable(self):
        w = rand_w(8, 64)
        gs = float(jnp.max(jnp.abs(w)))
        r = qdq_nvfp4(w, group_size=16)
        from autoround_tpu.dtypes.nvfp import nvfp4_global_scale
        g = nvfp4_global_scale(w)
        enc = np.asarray(r.scale) * float(g)
        roundtrip = enc.astype(jnp.float8_e4m3fn).astype(np.float32)
        np.testing.assert_allclose(enc, roundtrip, rtol=1e-6)


class TestFp8:
    def test_per_channel_sym(self):
        w = rand_w(8, 64)
        r = qdq_fp8_sym(w, group_size=-1)
        err = float(jnp.max(jnp.abs(r.qdq - w)))
        assert err < 0.05 * float(jnp.max(jnp.abs(w)))

    def test_values_are_e4m3(self):
        w = rand_w(8, 64)
        r = qdq_fp8_sym(w, group_size=-1)
        enc = np.asarray(r.qdq) / np.asarray(r.scale)
        rt = enc.astype(jnp.float8_e4m3fn).astype(np.float32)
        np.testing.assert_allclose(enc, rt, rtol=1e-5, atol=1e-6)

    def test_block_fp8_shapes(self):
        w = rand_w(200, 300)
        r = qdq_fp8_block(w, block=(128, 128))
        assert r.qdq.shape == w.shape
        assert r.scale.shape == (2, 3)


class TestRegistry:
    def test_resolution(self):
        assert get_quant_func("int", 4, True) is not None
        assert get_quant_func("int", 4, False) is not None
        assert get_quant_func("int", 4, True, mode="rtn") is not None
        assert get_quant_func("int", 2, True, mode="opt_rtn") is not None
        assert get_quant_func("mx_fp", 4, True) is not None
        assert get_quant_func("nv_fp", 4, True) is not None
        assert get_quant_func("fp8", 8, True) is not None

    def test_preset_schemes_resolve(self):
        for name, scheme in PRESET_SCHEMES.items():
            if scheme.data_type in ("bf16", "int_dq"):
                continue  # gguf double-quant lands in a later milestone
            fn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym)
            assert callable(fn), name

    def test_parse_scheme(self):
        s = parse_scheme("W4A16", group_size=32)
        assert s.bits == 4 and s.group_size == 32
        s2 = parse_scheme({"bits": 3, "group_size": 64, "sym": False})
        assert s2.bits == 3 and not s2.sym


class TestJitCompat:
    def test_all_core_qdq_jit(self):
        w = rand_w(16, 128)
        for fn in [
            lambda t: qdq_int_sym(t, 4, 32).qdq,
            lambda t: qdq_int_asym(t, 4, 32).qdq,
            lambda t: qdq_mx(t, "mx_fp4", 32).qdq,
            lambda t: qdq_nvfp4(t, 16).qdq,
            lambda t: qdq_fp8_sym(t, -1).qdq,
            lambda t: qdq_fp8_block(t, (64, 64)).qdq,
        ]:
            eager = fn(w)
            jitted = jax.jit(fn)(w)
            np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                                       rtol=1e-5, atol=1e-6)

    def test_bf16_weight_input(self):
        w = rand_w(16, 128).astype(jnp.bfloat16)
        r = qdq_int_sym(w, 4, 32)
        assert r.qdq.dtype == jnp.bfloat16
