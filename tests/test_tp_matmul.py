"""Tensor-parallel W4 matmul tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.ops.qmatmul import pack_w4_planes, w4a16_matmul_ref
from autoround_tpu.parallel import make_mesh
from autoround_tpu.parallel.tp_matmul import (
    shard_packed,
    w4a16_matmul_col_tp,
    w4a16_matmul_row_tp,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def layer():
    key = jax.random.PRNGKey(0)
    O, K, g = 512, 4096, 128
    codes = jax.random.randint(key, (O, K), 0, 16, jnp.int32)
    qw = pack_w4_planes(codes, g)
    scales = jax.random.uniform(key, (O, K // g), jnp.float32, 0.01, 0.02)
    x = jax.random.normal(key, (4, K), jnp.float32)
    want = w4a16_matmul_ref(x, qw, scales, g)
    return qw, scales, x, want, g


class TestTpMatmul:
    def test_col_parallel_matches(self, layer):
        qw, scales, x, want, g = layer
        mesh = make_mesh(8, dp=2, tp=4)
        qw_s, s_s = shard_packed(qw, scales, mesh, "col")
        got = w4a16_matmul_col_tp(x, qw_s, s_s, g, mesh)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-4, atol=1e-4)

    def test_row_parallel_matches(self, layer):
        qw, scales, x, want, g = layer
        mesh = make_mesh(8, dp=2, tp=4)
        # row-parallel shards K: K/tp = 1024 = 8*g tiles stay aligned
        qw_s, s_s = shard_packed(qw, scales, mesh, "row")
        got = w4a16_matmul_row_tp(x, qw_s, s_s, g, mesh)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-3, atol=1e-3)

    def test_megatron_pair_composes(self):
        # col (x W1^T) then row (· W2^T) with one psum total, as in an MLP.
        # shapes keep every per-shard K a multiple of the 8g plane tile
        key = jax.random.PRNGKey(2)
        K, O, g = 4096, 2048, 128
        qw = pack_w4_planes(
            jax.random.randint(key, (O, K), 0, 16, jnp.int32), g)
        scales = jnp.ones((O, K // g), jnp.float32) * 0.01
        x = jax.random.normal(key, (4, K), jnp.float32)
        mesh = make_mesh(8, dp=4, tp=2)
        qw2 = pack_w4_planes(
            jax.random.randint(jax.random.PRNGKey(1), (512, O), 0, 16,
                               jnp.int32), g)
        s2 = jnp.ones((512, O // g), jnp.float32) * 0.01
        want = w4a16_matmul_ref(
            w4a16_matmul_ref(x, qw, scales, g), qw2, s2, g)

        qw_c, s_c = shard_packed(qw, scales, mesh, "col")
        qw_r, s_r = shard_packed(qw2, s2, mesh, "row")
        h = w4a16_matmul_col_tp(x, qw_c, s_c, g, mesh)   # feature-sharded
        got = w4a16_matmul_row_tp(h, qw_r, s_r, g, mesh)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-3, atol=1e-3)
