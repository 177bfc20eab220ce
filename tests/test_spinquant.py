"""SpinQuant trainable-rotation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.models import llama
from autoround_tpu.schemes import parse_scheme
from autoround_tpu.transforms.spinquant import (
    SpinQuantConfig,
    apply_trained_rotation,
    cayley,
    train_r1_rotation,
)

CFG = llama.CONFIG_PRESETS["tiny"]


class TestCayley:
    def test_orthogonal_for_skew(self):
        rng = np.random.default_rng(0)
        M = rng.standard_normal((16, 16)).astype(np.float32)
        A = jnp.asarray(0.5 * (M - M.T))
        R = cayley(A)
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(16),
                                   atol=1e-4)

    def test_identity_at_zero(self):
        R = cayley(jnp.zeros((8, 8)))
        np.testing.assert_allclose(np.asarray(R), np.eye(8), atol=1e-6)


class TestTrainR1:
    def test_training_reduces_quant_error_and_stays_orthogonal(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        scheme = parse_scheme("W2A16G64")
        sq = SpinQuantConfig(steps=20, lr=2e-3, max_blocks=1)
        R = train_r1_rotation(params, CFG, scheme, sq)
        np.testing.assert_allclose(np.asarray(R @ R.T),
                                   np.eye(CFG.hidden_size), atol=1e-3)

    def test_rotated_model_preserves_logits(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        scheme = parse_scheme("W2A16G64")
        R = train_r1_rotation(params, CFG, scheme,
                              SpinQuantConfig(steps=5, max_blocks=1))
        rotated = apply_trained_rotation(params, CFG, R)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                 CFG.vocab_size)
        l0 = llama.model_fwd(params, ids, CFG)
        l1 = llama.model_fwd(rotated, ids, CFG)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=5e-3, atol=5e-3)

    def test_trained_beats_or_matches_init_loss(self):
        # the best-A snapshot guarantees the trained R's objective is at
        # most the Hadamard init's objective
        params = llama.init_params(CFG, jax.random.PRNGKey(2))
        scheme = parse_scheme("W2A16G64")
        from autoround_tpu.dtypes.registry import get_quant_func
        from autoround_tpu.transforms.hadamard import hadamard_matrix

        qfn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym,
                             mode="rtn")

        def obj(R):
            tot = 0.0
            n = 0
            for name in ("q_proj", "k_proj", "v_proj", "gate_proj",
                         "up_proj"):
                w = params["blocks"][0][name].astype(jnp.float32) @ R
                tot += float(jnp.sum(
                    (w - qfn(w, bits=2, group_size=64).qdq) ** 2))
                n += 1
            return tot / n

        H = jnp.asarray(hadamard_matrix(CFG.hidden_size, 0), jnp.float32)
        R = train_r1_rotation(params, CFG, scheme,
                              SpinQuantConfig(steps=25, lr=2e-3,
                                              max_blocks=1))
        assert obj(R) <= obj(H) * 1.001
