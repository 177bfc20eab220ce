"""Sequence-parallel (time-sharded KV) decode attention equals the
single-device computation (8-device virtual mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.ops.decode_attention import decode_attention_ref
from autoround_tpu.parallel.sp_attention import sp_decode_attention_host


def _mk(B=2, T=256, nkv=2, G=4, hd=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    nh = nkv * G
    q = jax.random.normal(ks[0], (B, nh, hd), jnp.float32)
    kc = jax.random.normal(ks[1], (B, T, nkv, hd), jnp.float32)
    vc = jax.random.normal(ks[2], (B, T, nkv, hd), jnp.float32)
    return q, kc, vc


def _ref(q, kc, vc, pos, sm, softcap=0.0, window=None):
    ones = jnp.ones((kc.shape[2],), jnp.float32)
    return decode_attention_ref(q, kc, vc, pos, ones, ones, sm,
                                softcap=softcap, window=window)


class TestSpAttention:
    @pytest.mark.parametrize("pos", [0, 5, 100, 255])
    def test_matches_single_device(self, pos):
        q, kc, vc = _mk()
        p = jnp.full((2,), pos, jnp.int32)
        sm = 1.0 / np.sqrt(64)
        out = sp_decode_attention_host(q, kc, vc, p, n_shards=8,
                                       sm_scale=sm)
        ref = _ref(q, kc, vc, p, sm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_per_slot_positions_and_window(self):
        q, kc, vc = _mk(B=3)
        p = jnp.asarray([7, 130, 255], jnp.int32)
        sm = 1.0 / np.sqrt(64)
        out = sp_decode_attention_host(q, kc, vc, p, n_shards=4,
                                       sm_scale=sm, window=64)
        ref = _ref(q, kc, vc, p, sm, window=64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_softcap(self):
        q, kc, vc = _mk()
        p = jnp.full((2,), 200, jnp.int32)
        sm = 1.0 / np.sqrt(64)
        out = sp_decode_attention_host(q, kc, vc, p, n_shards=8,
                                       sm_scale=sm, softcap=30.0)
        ref = _ref(q, kc, vc, p, sm, softcap=30.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_early_pos_dead_shards(self):
        """pos inside shard 0: shards 1..7 are fully masked and must
        contribute exactly nothing."""
        q, kc, vc = _mk()
        p = jnp.full((2,), 3, jnp.int32)
        sm = 1.0 / np.sqrt(64)
        out = sp_decode_attention_host(q, kc, vc, p, n_shards=8,
                                       sm_scale=sm)
        ref = _ref(q, kc, vc, p, sm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        assert np.isfinite(np.asarray(out)).all()
