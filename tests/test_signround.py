"""SignRound tuning-loop tests.

Model of the reference's unit style: run the real loop on a tiny problem
and assert the loss actually decreases and tuned beats RTN
(``test/unit/test_cpu/core/test_autoround_acc.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu.algorithms import TuneConfig, rtn_quantize_layer, tune_block
from autoround_tpu.algorithms.signsgd import linear_decay_schedule, sign_sgd
from autoround_tpu.schemes import parse_scheme


def toy_problem(key=0, nsamples=32, seq=8, din=64, dout=32):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    w = jax.random.normal(k1, (dout, din)) * 0.1
    x = jax.random.normal(k2, (nsamples, seq, din))
    ref = jnp.einsum("bsi,oi->bso", x, w)
    return w, x, ref


def linear_fwd(weights, x):
    return jnp.einsum("bsi,oi->bso", x, weights["w"])


class TestSignSgd:
    def test_update_is_sign(self):
        init, update = sign_sgd(lr=0.1, total_steps=10)
        params = {"v": jnp.array([1.0, -1.0, 0.0])}
        grads = {"v": jnp.array([3.0, -0.5, 0.0])}
        state = init(params)
        updates, _ = update(grads, state)
        np.testing.assert_allclose(updates["v"], [-0.1, 0.1, 0.0], atol=1e-7)

    def test_linear_decay(self):
        sched = linear_decay_schedule(1.0, 10)
        assert float(sched(jnp.array(0))) == 1.0
        np.testing.assert_allclose(float(sched(jnp.array(5))), 0.5)

    def test_minmax_lr_scaling(self):
        init, update = sign_sgd(lr=0.1, total_steps=10,
                                lr_scale_fn=lambda n: 2.0 if "scale" in n else 1.0)
        params = {"v": jnp.ones(2), "min_scale": jnp.ones(2)}
        grads = {"v": jnp.ones(2), "min_scale": jnp.ones(2)}
        updates, _ = update(grads, init(params))
        np.testing.assert_allclose(updates["v"], -0.1 * np.ones(2), atol=1e-7)
        np.testing.assert_allclose(updates["min_scale"], -0.2 * np.ones(2), atol=1e-7)


class TestTuneBlock:
    def test_loss_decreases_and_beats_rtn(self):
        w, x, ref = toy_problem()
        scheme = parse_scheme("W2A16", group_size=32)
        cfg = TuneConfig(iters=100, batch_size=8, seed=0)
        best, info = tune_block(
            linear_fwd, {"w": w}, x, ref, {"w": scheme}, cfg)
        assert info["best_loss"] < info["first_loss"]

        # tuned qdq error vs plain RTN error on the task loss
        from autoround_tpu.algorithms.signround import make_qdq_weights
        qw = make_qdq_weights({"w": w}, best, {"w": scheme}, cfg)
        tuned_out = linear_fwd(qw, x)
        rtn_out = linear_fwd({"w": rtn_quantize_layer(w, scheme).qdq}, x)
        tuned_err = float(jnp.mean((tuned_out - ref) ** 2))
        rtn_err = float(jnp.mean((rtn_out - ref) ** 2))
        assert tuned_err < rtn_err

    def test_best_snapshot_not_final(self):
        w, x, ref = toy_problem(key=1)
        scheme = parse_scheme("W4A16", group_size=32)
        cfg = TuneConfig(iters=30, batch_size=8, use_best_params=True)
        best, info = tune_block(linear_fwd, {"w": w}, x, ref, {"w": scheme}, cfg)
        assert info["best_loss"] <= np.min(info["loss_trace"]) + 1e-6

    def test_masked_loss(self):
        w, x, ref = toy_problem(key=2)
        mask = jnp.ones(x.shape[:2]).at[:, -2:].set(0)  # mask trailing tokens
        scheme = parse_scheme("W4A16", group_size=32)
        cfg = TuneConfig(iters=10, batch_size=8)
        best, info = tune_block(linear_fwd, {"w": w}, x, ref, {"w": scheme},
                                cfg, mask=mask)
        assert np.isfinite(info["best_loss"])

    def test_mx_scheme_tunes(self):
        w, x, ref = toy_problem(key=3)
        scheme = parse_scheme("MXFP4")
        cfg = TuneConfig(iters=20, batch_size=8)
        best, info = tune_block(linear_fwd, {"w": w}, x, ref, {"w": scheme}, cfg)
        assert info["best_loss"] <= info["first_loss"] + 1e-6

    def test_dynamic_max_gap_freezes(self):
        w, x, ref = toy_problem(key=4)
        scheme = parse_scheme("W4A16", group_size=32)
        cfg = TuneConfig(iters=50, batch_size=8, dynamic_max_gap=3)
        best, info = tune_block(linear_fwd, {"w": w}, x, ref, {"w": scheme}, cfg)
        assert np.isfinite(info["best_loss"])
