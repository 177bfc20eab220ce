"""GGUF k-quant (double-quant) dtype tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.dtypes.gguf import (
    qdq_int_dq_asym,
    qdq_int_dq_sym,
    rtn_int_dq_asym,
    rtn_int_dq_sym,
)
from autoround_tpu.dtypes.registry import get_quant_func


def rand_w(o=16, i=512, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (o, i)) * 0.1


class TestDqSym:
    def test_structure_and_error(self):
        w = rand_w()
        r = qdq_int_dq_sym(w, bits=6, group_size=16, super_bits=8,
                           super_group_size=16)
        assert r.qdq.shape == w.shape
        # scales quantized: d_hat / d_super must be near-integers per super
        err = float(jnp.mean(jnp.abs(r.qdq - w)))
        assert err < 0.01  # 6-bit: fine grid

    def test_q3k_like(self):
        w = rand_w(key=1)
        r = qdq_int_dq_sym(w, bits=3, group_size=16, super_bits=6,
                           super_group_size=16)
        g = np.asarray(r.qdq).reshape(-1, 16)
        for row in g[:8]:
            assert len(np.unique(np.round(row, 6))) <= 8

    def test_grad_flows(self):
        w = rand_w(key=2)
        v = jnp.zeros_like(w)
        gv = jax.grad(lambda vv: jnp.sum(qdq_int_dq_sym(
            w, 3, 16, 6, 16, v=vv).qdq ** 2))(v)
        assert float(jnp.max(jnp.abs(gv))) > 0


class TestDqAsym:
    def test_q4k_like(self):
        w = rand_w(key=3) + 0.05
        r = qdq_int_dq_asym(w, bits=4, group_size=32, super_bits=6,
                            super_group_size=8)
        assert r.qdq.shape == w.shape
        err = float(jnp.mean(jnp.abs(r.qdq - w)))
        assert err < 0.02

    def test_q2k_like_levels(self):
        w = rand_w(key=4)
        r = qdq_int_dq_asym(w, bits=2, group_size=16, super_bits=4,
                            super_group_size=16)
        g = np.asarray(r.qdq).reshape(-1, 16)
        for row in g[:8]:
            assert len(np.unique(np.round(row, 6))) <= 4


class TestDqRtnSearch:
    def test_sym_search_beats_plain(self):
        w = rand_w(key=5)
        plain = qdq_int_dq_sym(w, 3, 16, 6, 16)
        searched = rtn_int_dq_sym(w, 3, 16, super_bits=6, super_group_size=16)
        e0 = float(jnp.sum((plain.qdq - w) ** 2))
        e1 = float(jnp.sum((searched.qdq - w) ** 2))
        assert e1 <= e0 * 1.02

    def test_asym_wls_search_beats_plain(self):
        w = rand_w(key=6)
        plain = qdq_int_dq_asym(w, 2, 16, 4, 16)
        searched = rtn_int_dq_asym(w, 2, 16, super_bits=4, super_group_size=16)
        e0 = float(jnp.sum((plain.qdq - w) ** 2))
        e1 = float(jnp.sum((searched.qdq - w) ** 2))
        assert e1 <= e0 * 1.02

    def test_imatrix_weighting(self):
        w = rand_w(key=7)
        im = jnp.ones((512,)).at[:64].set(50.0)
        r = rtn_int_dq_sym(w, 2, 16, super_bits=6, super_group_size=16,
                           imatrix=im)
        r0 = rtn_int_dq_sym(w, 2, 16, super_bits=6, super_group_size=16)
        we = float(jnp.sum(im[None] * (r.qdq - w) ** 2))
        we0 = float(jnp.sum(im[None] * (r0.qdq - w) ** 2))
        assert we <= we0 + 1e-5


class TestRegistry:
    def test_resolution(self):
        assert get_quant_func("int_dq", 4, False) is not None
        assert get_quant_func("int_dq", 3, True, mode="rtn") is not None

    def test_gguf_scheme_pipeline(self):
        # full pipeline on a model whose dims divide the super-block
        from autoround_tpu import AutoRound
        from autoround_tpu.models import llama
        cfg = llama.LlamaConfig(vocab_size=128, hidden_size=256,
                                intermediate_size=512, num_layers=1,
                                num_heads=4, num_kv_heads=2,
                                rope_theta=1e4, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
        res = AutoRound((params, cfg), scheme="GGUF:Q4_K_S",
                        iters=3, batch_size=2).quantize(ids)
        # 7 block projections + embed_tokens (GGUF quantizes the embedding)
        assert len(res.layers) == 8
        assert "embed_tokens" in res.layers
