"""INT8-QK (SageAttention-style) prefill attention."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu.ops.flash_attention import flash_attention_ref
from autoround_tpu.ops.sage_attention import (sage_attention,
                                              sage_attention_ref)


class TestSageAttention:
    def test_int8_matches_bf16_closely(self):
        """Mean-smoothed per-token int8 QK tracks the fp path."""
        key = jax.random.PRNGKey(0)
        B, H, S, D = 2, 4, 64, 32
        q = jax.random.normal(key, (B, H, S, D), jnp.float32)
        # common-mode key offset: the smoothing must absorb it exactly
        k = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, H, S, D)) + 2.0
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, S, D))
        y = sage_attention_ref(q, k, v, causal=True)
        want = flash_attention_ref(q, k, v, True)
        err = float(jnp.mean(jnp.abs(y - want)))
        assert err < 5e-3, err

    def test_gqa_fallback_and_causality(self):
        key = jax.random.PRNGKey(3)
        B, H, Hkv, S, D = 1, 4, 2, 16, 8
        q = jax.random.normal(key, (B, H, S, D), jnp.float32)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, S, D))
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, Hkv, S, D))
        y = sage_attention(q, k, v, causal=True)   # CPU → ref fallback
        # causality: output at position 0 ignores later keys
        k2 = k.at[:, :, 1:].set(0.0)
        v2 = v.at[:, :, 1:].set(0.0)
        y2 = sage_attention(q, k2, v2, causal=True)
        np.testing.assert_allclose(np.asarray(y[:, :, 0]),
                                   np.asarray(y2[:, :, 0]),
                                   rtol=2e-2, atol=2e-2)
