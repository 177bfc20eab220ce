"""Flash attention: CPU reference-path tests (the Pallas kernel itself is
exercised on real TPU via the verify drives — see .claude/skills/verify)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu.models import llama
from autoround_tpu.ops.flash_attention import flash_attention, flash_attention_ref


class TestFlashRef:
    def test_matches_naive_llama_attention(self):
        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=512,
                                intermediate_size=512, num_layers=1,
                                num_heads=4, num_kv_heads=2,
                                dtype=jnp.float32)
        key = jax.random.PRNGKey(0)
        B, S, hd = 2, 16, cfg.hd
        q = jax.random.normal(key, (B, S, cfg.num_heads, hd))
        k = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, S, cfg.num_kv_heads, hd))
        v = jax.random.normal(jax.random.fold_in(key, 2),
                              (B, S, cfg.num_kv_heads, hd))
        want = llama.attention(q, k, v, None, cfg)
        got = flash_attention_ref(q.transpose(0, 2, 1, 3),
                                  k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3),
                                  causal=True).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)

    def test_causality(self):
        # changing a future token must not affect earlier outputs
        key = jax.random.PRNGKey(1)
        q = jax.random.normal(key, (1, 2, 8, 32))
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 8, 32))
        v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 8, 32))
        o1 = flash_attention_ref(q, k, v, causal=True)
        k2 = k.at[:, :, -1].add(10.0)
        v2 = v.at[:, :, -1].add(10.0)
        o2 = flash_attention_ref(q, k2, v2, causal=True)
        np.testing.assert_allclose(np.asarray(o1[:, :, :-1]),
                                   np.asarray(o2[:, :, :-1]), atol=1e-5)

    def test_cpu_falls_back(self):
        # on CPU flash_attention must route to the reference path
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 512, 128),
                              jnp.float32)
        k = v = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 512, 128),
                                  jnp.float32)
        out = flash_attention(q, k, v)
        want = flash_attention_ref(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5)
