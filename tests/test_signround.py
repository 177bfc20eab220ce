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


class TestNormBiasTuning:
    """Reference enable_norm_bias_tuning (wrapper.py:215,636-746): norm
    weights and linear biases get a round-free asym-grid perturbation."""

    def _toy(self, key=0, nsamples=32, seq=8, din=64, dout=64):
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(key), 4)
        w = jax.random.normal(k1, (dout, din)) * 0.1
        gamma = 1.0 + jax.random.normal(k3, (din,)) * 0.1
        bias = jax.random.normal(k4, (dout,)) * 0.05
        x = jax.random.normal(k2, (nsamples, seq, din))

        def fwd(weights, xb):
            h = xb * weights["input_layernorm"]
            return jnp.einsum("bsi,oi->bso", h, weights["w"]) \
                + weights["w_bias"]

        weights = {"w": w, "input_layernorm": gamma, "w_bias": bias}
        ref = fwd(weights, x)
        return fwd, weights, x, ref

    def test_wo_round_qdq_identity_at_zero_v(self):
        from autoround_tpu.dtypes.intq import qdq_asym_wo_round
        w = jax.random.normal(jax.random.PRNGKey(0), (64,))
        out = qdq_asym_wo_round(w, 0.0)
        # v=0 and no rounding -> qdq is (near-)identity inside the grid
        np.testing.assert_allclose(np.asarray(out), np.asarray(w), atol=1e-5)

    def test_norm_bias_params_tuned_and_loss_improves(self):
        fwd, weights, x, ref = self._toy()
        scheme = parse_scheme("W2A16", group_size=32)
        base = TuneConfig(iters=60, batch_size=8, seed=0)
        nb = TuneConfig(iters=60, batch_size=8, seed=0,
                        enable_norm_bias_tuning=True)
        _, info0 = tune_block(fwd, weights, x, ref, {"w": scheme}, base)
        best, info1 = tune_block(
            fwd, weights, x, ref, {"w": scheme}, nb,
            norm_bias_leaves=("input_layernorm", "w_bias"))
        assert "_nb" in best
        assert set(best["_nb"]) == {"input_layernorm", "w_bias"}
        # the perturbations must actually move
        assert float(jnp.abs(best["_nb"]["input_layernorm"]["v"]).max()) > 0
        # extra degrees of freedom must not hurt the achieved loss much
        # (on this toy they help)
        assert info1["best_loss"] <= info0["best_loss"] * 1.05

    def test_orchestrator_bakes_tuned_norms(self):
        from autoround_tpu import AutoRound
        from autoround_tpu.models import llama
        cfg = llama.CONFIG_PRESETS["tiny-qwen"]  # has attn biases
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        # perturb norms off the all-ones init so the grid has headroom
        # in both directions and the tuned v has something to correct
        key = jax.random.PRNGKey(7)
        for b in params["blocks"]:
            b["input_layernorm"] = 1.0 + 0.2 * jax.random.normal(
                key, b["input_layernorm"].shape)
        ids = np.random.default_rng(0).integers(
            0, cfg.vocab_size, (8, 32)).astype(np.int32)
        ar = AutoRound((params, cfg), scheme="W2A16", iters=30,
                       batch_size=4, enable_norm_bias_tuning=True)
        res = ar.quantize(ids)
        moved = []
        for name in ("input_layernorm", "q_bias"):
            x0 = np.asarray(params["blocks"][0][name])
            x1 = np.asarray(res.params["blocks"][0][name])
            moved.append(not np.allclose(x0, x1))
        assert any(moved), "tuned norm/bias leaves should move"
