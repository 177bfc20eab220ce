"""Fused int8-KV decode-attention kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.ops.decode_attention import (decode_attention,
                                                decode_attention_ref)


def _mk(B=2, T=512, nkv=2, G=4, hd=128, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    nh = nkv * G
    q = jax.random.normal(ks[0], (B, nh, hd), jnp.float32)
    kc = jax.random.randint(ks[1], (B, T, nkv, hd), -127, 128, jnp.int32
                            ).astype(jnp.int8)
    vc = jax.random.randint(ks[2], (B, T, nkv, hd), -127, 128, jnp.int32
                            ).astype(jnp.int8)
    k_scale = jax.random.uniform(ks[3], (nkv,), jnp.float32, 0.01, 0.03)
    v_scale = jax.random.uniform(ks[4], (nkv,), jnp.float32, 0.01, 0.03)
    return q, kc, vc, k_scale, v_scale


class TestDecodeAttention:
    @pytest.mark.parametrize("pos", [0, 7, 255, 256, 511])
    def test_kernel_matches_ref(self, pos):
        q, kc, vc, ks, vs = _mk()
        p = jnp.full((2,), pos, jnp.int32)
        sm = 1.0 / np.sqrt(128)
        ref = decode_attention_ref(q, kc, vc, p, ks, vs, sm)
        out = decode_attention(q, kc, vc, p, ks, vs, sm, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_per_slot_positions(self):
        q, kc, vc, ks, vs = _mk(B=3, T=256)
        p = jnp.asarray([3, 100, 255], jnp.int32)
        sm = 1.0 / np.sqrt(128)
        ref = decode_attention_ref(q, kc, vc, p, ks, vs, sm)
        out = decode_attention(q, kc, vc, p, ks, vs, sm, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_softcap_and_window(self):
        q, kc, vc, ks, vs = _mk(T=512)
        p = jnp.full((2,), 400, jnp.int32)
        sm = 1.0 / np.sqrt(128)
        ref = decode_attention_ref(q, kc, vc, p, ks, vs, sm, softcap=30.0,
                                   window=128)
        out = decode_attention(q, kc, vc, p, ks, vs, sm, softcap=30.0,
                               window=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_gqa_group8(self):
        q, kc, vc, ks, vs = _mk(nkv=1, G=8, T=256)
        p = jnp.full((2,), 200, jnp.int32)
        sm = 1.0 / np.sqrt(128)
        ref = decode_attention_ref(q, kc, vc, p, ks, vs, sm)
        out = decode_attention(q, kc, vc, p, ks, vs, sm, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_cpu_fallback_is_ref(self):
        q, kc, vc, ks, vs = _mk(T=96)   # T not block-divisible
        p = jnp.full((2,), 50, jnp.int32)
        sm = 1.0 / np.sqrt(128)
        ref = decode_attention_ref(q, kc, vc, p, ks, vs, sm)
        out = decode_attention(q, kc, vc, p, ks, vs, sm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
