"""GPTQ / AWQ / llm-compressor export layout tests (exact self-inverse)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.export.formats import (
    awq_pack_layer,
    awq_unpack_layer,
    gptq_pack_layer,
    gptq_unpack_layer,
)
from autoround_tpu.models import llama
from autoround_tpu.quantize.orchestrator import QuantizedLayer
from autoround_tpu.schemes import parse_scheme

CFG = llama.CONFIG_PRESETS["tiny"]


def make_ql(bits=4, sym=False, O=32, I=64, g=32, key=0):
    from autoround_tpu.dtypes.intq import qdq_int_asym, qdq_int_sym
    w = jax.random.normal(jax.random.PRNGKey(key), (O, I)) * 0.1
    r = (qdq_int_sym if sym else qdq_int_asym)(w, bits, g)
    scheme = parse_scheme({"bits": bits, "group_size": g, "sym": sym})
    return QuantizedLayer(name="l", scheme=scheme, qdq=r.qdq, scale=r.scale,
                          zp=r.zp)


class TestGptq:
    def test_roundtrip(self):
        ql = make_ql(bits=4, sym=False)
        t = gptq_pack_layer(ql)
        assert t["qweight"].shape == (64 * 4 // 32, 32)
        assert t["g_idx"].shape == (64,)
        codes, scale, zp = gptq_unpack_layer(t, 4, 32, 64)
        # dequant must reproduce the qdq weights
        dq = (codes.astype(np.float64)
              - np.repeat(zp, 32, 1)[:, :64]) * np.repeat(
                  scale.astype(np.float64), 32, 1)[:, :64]
        np.testing.assert_allclose(dq, np.asarray(ql.qdq, np.float64),
                                   rtol=1e-2, atol=1e-3)

    def test_v1_zp_offby1(self):
        ql = make_ql(bits=4, sym=False)
        t = gptq_pack_layer(ql)
        from autoround_tpu.export.packing import unpack_rows
        stored = unpack_rows(t["qzeros"], 4, 32).T
        true_zp = np.asarray(ql.zp)
        np.testing.assert_array_equal(stored + 1, true_zp.astype(np.uint8))

    def test_8bit(self):
        ql = make_ql(bits=8, sym=True)
        t = gptq_pack_layer(ql)
        codes, scale, zp = gptq_unpack_layer(t, 8, 32, 64)
        dq = (codes.astype(np.float64)
              - np.repeat(zp, 32, 1)[:, :64]) * np.repeat(
                  scale.astype(np.float64), 32, 1)[:, :64]
        np.testing.assert_allclose(dq, np.asarray(ql.qdq, np.float64),
                                   rtol=1e-3, atol=1e-5)


class TestAwq:
    def test_roundtrip(self):
        ql = make_ql(bits=4, sym=False)
        t = awq_pack_layer(ql)
        assert t["qweight"].shape == (64, 32 // 8)
        codes, scale, zp = awq_unpack_layer(t, 32, 64)
        dq = (codes.astype(np.float64)
              - np.repeat(zp, 32, 1)[:, :64]) * np.repeat(
                  scale.astype(np.float64), 32, 1)[:, :64]
        np.testing.assert_allclose(dq, np.asarray(ql.qdq, np.float64),
                                   rtol=1e-2, atol=1e-3)

    def test_interleave_is_awq_order(self):
        # column o of the logical matrix must land at nibble position
        # AWQ_ORDER.index(o%8) within its word
        from autoround_tpu.export.formats import AWQ_ORDER
        ql = make_ql(bits=4, sym=False, O=8, I=64, g=64)
        from autoround_tpu.export.formats import _codes_scale_zp
        codes, _, _, _ = _codes_scale_zp(ql)
        t = awq_pack_layer(ql)
        w0 = np.asarray(t["qweight"])[0, 0]  # first input row, one word
        for pos in range(8):
            nib = (w0 >> (4 * pos)) & 0xF
            logical_o = AWQ_ORDER[pos]
            assert nib == codes[logical_o, 0]


class TestEndToEnd:
    def test_save_formats(self, tmp_path):
        params = llama.init_params(CFG, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0,
                                 CFG.vocab_size)
        ar = AutoRound((params, CFG), scheme="W4A16G32", iters=0)
        ar.quantize(ids)
        for fmt in ("gptq", "awq", "llm_compressor"):
            out = ar.save_quantized(str(tmp_path / fmt), format=fmt)
            assert os.path.exists(os.path.join(out, "model.safetensors"))
            qcfg = json.load(open(os.path.join(out,
                                               "quantization_config.json")))
            if fmt == "llm_compressor":
                assert "compressed_tensors" in qcfg
