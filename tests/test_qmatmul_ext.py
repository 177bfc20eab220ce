"""Extended serving-kernel coverage: asym/2-bit/8-bit/FP8/MXFP4 matmuls.

Parity model: each kernel's XLA reference path is validated against a
dense dequant matmul (the reference validates triton quant_matmul_248
against torch dequant the same way, ``test_cpu/.../test_triton.py``).
On CPU the pallas path falls back to these refs; a TPU parity script
(scripts/tpu_kernel_parity.py) checks kernel-vs-ref on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.ops.qmatmul import pack_w4_planes
from autoround_tpu.ops.qmatmul_ext import (
    decode_e2m1,
    fp8_matmul,
    mxfp4_matmul,
    pack_w2_planes,
    unpack_w2_planes,
    w2a16_matmul,
    w4a16_asym_matmul,
    w8a16_matmul,
)


def dense(x, w):
    return jnp.einsum("bi,oi->bo", x.astype(jnp.float32),
                      w.astype(jnp.float32))


class TestPacking:
    def test_w2_roundtrip(self):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 4, (8, 4096)).astype(np.int32)
        packed = pack_w2_planes(jnp.asarray(codes), 128)
        assert packed.shape == (8, 256)
        back = unpack_w2_planes(packed, 128)
        np.testing.assert_array_equal(np.asarray(back), codes)


class TestAsymW4:
    def test_matches_dense_dequant(self):
        rng = np.random.default_rng(1)
        O, K, g, B = 64, 2048, 128, 4
        codes = rng.integers(0, 16, (O, K)).astype(np.int32)
        scales = rng.uniform(0.005, 0.02, (O, K // g)).astype(np.float32)
        zps = rng.integers(1, 15, (O, K // g)).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        qw = pack_w4_planes(jnp.asarray(codes), g)
        y = w4a16_asym_matmul(x, qw, jnp.asarray(scales), jnp.asarray(zps), g)
        srep = np.repeat(scales, g, axis=1)
        zrep = np.repeat(zps, g, axis=1)
        w = (codes - zrep) * srep
        ref = dense(x, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)


class TestW2:
    def test_matches_dense_dequant(self):
        rng = np.random.default_rng(2)
        O, K, g, B = 64, 4096, 128, 4
        codes = rng.integers(0, 4, (O, K)).astype(np.int32)
        scales = rng.uniform(0.01, 0.05, (O, K // g)).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        qw = pack_w2_planes(jnp.asarray(codes), g)
        y = w2a16_matmul(x, qw, jnp.asarray(scales), g)
        w = (codes - 2) * np.repeat(scales, g, axis=1)
        ref = dense(x, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)


class TestW8:
    @pytest.mark.parametrize("g", [0, 128])
    def test_matches_dense_dequant(self, g):
        rng = np.random.default_rng(3)
        O, K, B = 64, 1024, 4
        wi = rng.integers(-127, 128, (O, K)).astype(np.int8)
        ng = K // g if g else 1
        scales = rng.uniform(0.001, 0.01, (O, ng)).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        y = w8a16_matmul(x, jnp.asarray(wi), jnp.asarray(scales), g)
        w = wi.astype(np.float32) * np.repeat(scales, g if g else K, axis=1)
        ref = dense(x, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)


class TestFP8:
    def test_matches_dense_dequant(self):
        rng = np.random.default_rng(4)
        O, K, B = 64, 512, 4
        wf = rng.standard_normal((O, K)).astype(np.float32) * 0.1
        wf8 = jnp.asarray(wf).astype(jnp.float8_e4m3fn)
        scales = rng.uniform(0.5, 2.0, (O,)).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        y = fp8_matmul(x, wf8, jnp.asarray(scales))
        w = wf8.astype(jnp.float32) * jnp.asarray(scales)[:, None]
        ref = dense(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)


class TestMXFP4:
    def test_decode_e2m1_table(self):
        # full E2M1 table: 0,.5,1,1.5,2,3,4,6 with sign in bit 3
        vals = np.asarray(decode_e2m1(jnp.arange(16)))
        expect = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
                           -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0])
        np.testing.assert_array_equal(vals, expect)

    def test_matches_dense_dequant(self):
        rng = np.random.default_rng(5)
        O, K, g, B = 64, 2048, 32, 4
        codes = rng.integers(0, 16, (O, K)).astype(np.int32)
        # E8M0-style pow2 scales
        scales = np.exp2(rng.integers(-8, 2, (O, K // g))
                         ).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        qw = pack_w4_planes(jnp.asarray(codes), 128)
        y = mxfp4_matmul(x, qw, jnp.asarray(scales), g)
        vals = np.asarray(decode_e2m1(jnp.asarray(codes)))
        w = vals * np.repeat(scales, g, axis=1)
        ref = dense(x, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)
