"""W4FP8 / float-zp dtype tests + ShardWriter tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.dtypes import get_quant_func
from autoround_tpu.dtypes.extra import qdq_int_asym_float_zp, qdq_w4fp8
from autoround_tpu.export.shard_writer import ShardWriter


def rand_w(o=32, i=256, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (o, i)) * 0.1


class TestW4Fp8:
    def test_values_on_fp8_grid_after_dequant(self):
        w = rand_w()
        r = qdq_w4fp8(w, 4, 128)
        assert r.qdq.shape == w.shape
        err = float(jnp.mean(jnp.abs(r.qdq - w)))
        assert err < 0.05

    def test_registry(self):
        assert get_quant_func("w4fp8", 4, True) is not None
        assert get_quant_func("w4fp8", 4, True, mode="rtn") is not None


class TestFloatZp:
    def test_q4_1_style_roundtrip(self):
        w = rand_w(key=1) + 0.07
        r = qdq_int_asym_float_zp(w, 4, 32)
        assert r.zp is not None
        err = float(jnp.mean(jnp.abs(r.qdq - w)))
        step = float(jnp.mean(r.scale))
        assert err < step

    def test_min_exactly_representable(self):
        # dq at q=0 must equal the group min exactly (float zp property);
        # note the range is clamped to include 0, so use a negative min
        w = jnp.array([[-0.11, 0.5, 0.9, 1.3]])
        r = qdq_int_asym_float_zp(w, 4, 4)
        assert abs(float(r.qdq[0, 0]) - (-0.11)) < 1e-6


class TestShardWriter:
    def test_sharding_and_index(self, tmp_path):
        sw = ShardWriter(str(tmp_path), shard_size_bytes=1000)
        for i in range(5):
            sw.add(f"t{i}", np.zeros(200, np.float32))  # 800 B each
        out = sw.finalize()
        idx = json.load(open(os.path.join(out,
                                          "model.safetensors.index.json")))
        assert len(idx["weight_map"]) == 5
        shards = set(idx["weight_map"].values())
        assert len(shards) >= 3  # budget forces multiple shards
        for s in shards:
            assert os.path.exists(os.path.join(out, s))
            assert "-of-" in s

    def test_roundtrip_contents(self, tmp_path):
        from safetensors.numpy import load_file
        sw = ShardWriter(str(tmp_path), shard_size_bytes=512)
        a = np.arange(100, dtype=np.float32)
        b = np.arange(300, dtype=np.float32)
        sw.add_many({"a": a, "b": b})
        out = sw.finalize()
        idx = json.load(open(os.path.join(out,
                                          "model.safetensors.index.json")))
        got_a = load_file(os.path.join(out, idx["weight_map"]["a"]))["a"]
        got_b = load_file(os.path.join(out, idx["weight_map"]["b"]))["b"]
        np.testing.assert_array_equal(got_a, a)
        np.testing.assert_array_equal(got_b, b)

    def test_add_after_finalize_fails(self, tmp_path):
        sw = ShardWriter(str(tmp_path))
        sw.add("x", np.zeros(4, np.float32))
        sw.finalize()
        with pytest.raises(AssertionError):
            sw.add("y", np.zeros(4, np.float32))
