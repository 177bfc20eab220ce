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


class TestR2:
    def test_exact_reparam_and_loss_improves(self):
        from autoround_tpu.transforms.hadamard import hadamard_matrix
        from autoround_tpu.transforms.spinquant import (apply_trained_r2,
                                                        train_r2_rotations)
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        scheme = parse_scheme("W2A16G64")
        R2s = train_r2_rotations(params, CFG, scheme,
                                 SpinQuantConfig(steps=25, lr=2e-3))
        # orthogonality by construction
        hd = CFG.hd
        for li in (0, 1):
            np.testing.assert_allclose(
                np.asarray(R2s[li] @ R2s[li].T), np.eye(hd), atol=1e-4)
        # exact reparameterization: model outputs unchanged
        rot = apply_trained_r2(params, CFG, R2s)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                 CFG.vocab_size)
        a = llama.model_fwd(params, ids, CFG)
        b = llama.model_fwd(rot, ids, CFG)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)
        # trained beats the plain per-head Hadamard on the v/o objective
        from autoround_tpu.dtypes.registry import get_quant_func
        qfn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym,
                             mode="rtn")

        def obj(Rs):
            tot = 0.0
            for li, blk in enumerate(params["blocks"]):
                R = Rs[li]
                wv = blk["v_proj"].astype(jnp.float32).reshape(
                    CFG.num_kv_heads, hd, -1)
                wvr = jnp.einsum("de,keH->kdH", R.T, wv).reshape(
                    CFG.num_kv_heads * hd, -1)
                wo = blk["o_proj"].astype(jnp.float32).reshape(
                    -1, CFG.num_heads, hd)
                wor = jnp.einsum("Hne,ed->Hnd", wo, R).reshape(
                    wo.shape[0], -1)
                for w in (wvr, wor):
                    tot += float(jnp.sum(
                        (w - qfn(w, bits=2, group_size=64).qdq) ** 2))
            return tot

        H2 = jnp.asarray(hadamard_matrix(hd, 0), jnp.float32)
        base = jnp.broadcast_to(H2, R2s.shape)
        assert obj(R2s) <= obj(base) * 1.001


class TestR1BlockOutputLoss:
    def test_output_loss_variant_trains(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        scheme = parse_scheme("W2A16G64")
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 CFG.vocab_size)
        x0 = llama.embed_fwd(params, ids, CFG)
        R = train_r1_rotation(params, CFG, scheme,
                              SpinQuantConfig(steps=15, lr=2e-3,
                                              max_blocks=1),
                              calib_x=x0)
        np.testing.assert_allclose(np.asarray(R @ R.T),
                                   np.eye(CFG.hidden_size), atol=1e-3)
        # rotated model still computes (exact reparam through apply)
        rot = apply_trained_rotation(params, CFG, R)
        a = llama.model_fwd(params, ids[:1], CFG)
        b = llama.model_fwd(rot, ids[:1], CFG)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=3e-2, atol=3e-2)


class TestApiRotationModes:
    def test_spin_and_r2_modes(self):
        from autoround_tpu import AutoRound
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size)
        ar = AutoRound((params, CFG), scheme="W2A16G64", iters=2,
                       batch_size=4, enable_rotation="spin,r2,r4")
        res = ar.quantize(ids)
        assert res.layers
        out = llama.model_fwd(res.params, ids[:1], ar.model_cfg)
        assert np.isfinite(np.asarray(out)).all()

    def test_r1_and_spin_conflict(self):
        from autoround_tpu import AutoRound
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            AutoRound((params, CFG), scheme="W4A16",
                      enable_rotation="r1,spin")
