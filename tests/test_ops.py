"""Kernel-layer tests (CPU: packing round-trip + XLA reference path;
the Pallas path itself is exercised on real TPU via bench.py / verify)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu.ops.qmatmul import (
    pack_w4_planes,
    unpack_w4_planes,
    w4a16_matmul,
    w4a16_matmul_ref,
)


class TestPacking:
    def test_roundtrip(self):
        codes = jax.random.randint(jax.random.PRNGKey(0), (64, 2048), 0, 16,
                                   jnp.int32)
        qw = pack_w4_planes(codes, 128)
        assert qw.shape == (64, 256)
        out = unpack_w4_planes(qw, 128)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))

    def test_plane_structure(self):
        # group j of tile t must live in nibble plane j
        O, g = 4, 128
        codes = jnp.zeros((O, 8 * g), jnp.int32).at[:, 3 * g:4 * g].set(5)
        qw = pack_w4_planes(codes, g)
        words = np.asarray(qw, np.uint32)
        assert ((words >> 12) & 0xF == 5).all()  # plane 3
        assert ((words >> 0) & 0xF == 0).all()

    def test_matmul_matches_dense(self):
        key = jax.random.PRNGKey(1)
        O, K, g, B = 256, 1024, 128, 4
        codes = jax.random.randint(key, (O, K), 0, 16, jnp.int32)
        scales = jax.random.uniform(key, (O, K // g), jnp.float32, 0.01, 0.02)
        qw = pack_w4_planes(codes, g)
        x = jax.random.normal(key, (B, K), jnp.float32)
        w = (np.asarray(codes, np.float32) - 8) * np.repeat(
            np.asarray(scales), g, axis=1)
        want = np.asarray(x) @ w.T
        got = np.asarray(w4a16_matmul(x, qw, scales, g), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_3d_input(self):
        key = jax.random.PRNGKey(2)
        O, K, g = 256, 1024, 128
        codes = jax.random.randint(key, (O, K), 0, 16, jnp.int32)
        scales = jnp.ones((O, K // g), jnp.float32) * 0.01
        qw = pack_w4_planes(codes, g)
        x = jax.random.normal(key, (2, 3, K), jnp.bfloat16)
        y = w4a16_matmul(x, qw, scales, g)
        assert y.shape == (2, 3, O)
