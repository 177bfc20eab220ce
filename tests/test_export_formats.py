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


class TestCompressedTensors:
    def test_pack_quantized_roundtrip_asym(self):
        from autoround_tpu.export.formats import ct_pack_layer, ct_unpack_layer
        ql = make_ql(bits=4, sym=False)
        t = ct_pack_layer(ql)
        assert t["weight_packed"].shape == (32, 64 * 4 // 32)
        assert t["weight_packed"].dtype == np.int32
        assert t["weight_scale"].shape == (32, 2)
        assert list(t["weight_shape"]) == [32, 64]
        assert "weight_zero_point" in t
        assert t["weight_zero_point"].shape == (32 * 4 // 32, 2)
        codes, scale, zp = ct_unpack_layer(t, 4)
        dq = (codes.astype(np.float64)
              - np.repeat(zp, 32, 1)[:, :64]) * np.repeat(
                  scale.astype(np.float64), 32, 1)[:, :64]
        np.testing.assert_allclose(dq, np.asarray(ql.qdq, np.float64),
                                   rtol=1e-2, atol=1e-3)

    def test_pack_quantized_sym_no_zp(self):
        from autoround_tpu.export.formats import ct_pack_layer, ct_unpack_layer
        for bits in (2, 4, 8):
            ql = make_ql(bits=bits, sym=True)
            t = ct_pack_layer(ql)
            assert "weight_zero_point" not in t
            codes, scale, zp = ct_unpack_layer(t, bits)
            assert zp is None
            dq = (codes.astype(np.float64) - 2 ** (bits - 1)) * np.repeat(
                scale.astype(np.float64), 32, 1)[:, :64]
            np.testing.assert_allclose(dq, np.asarray(ql.qdq, np.float64),
                                       rtol=1e-2, atol=1e-3)

    def test_float_quantized_fp8(self):
        import ml_dtypes
        from autoround_tpu.dtypes.fp8 import qdq_fp8_sym
        from autoround_tpu.export.formats import ct_float_layer
        w = jax.random.normal(jax.random.PRNGKey(3), (16, 32)) * 0.2
        r = qdq_fp8_sym(w)
        scheme = parse_scheme("FP8_STATIC")
        ql = QuantizedLayer(name="l", scheme=scheme, qdq=r.qdq, scale=r.scale,
                            zp=None)
        t = ct_float_layer(ql)
        assert t["weight"].dtype == ml_dtypes.float8_e4m3fn
        dq = (t["weight"].astype(np.float64)
              * np.repeat(t["weight_scale"].astype(np.float64),
                          32 // t["weight_scale"].shape[1], 1))
        np.testing.assert_allclose(dq, np.asarray(ql.qdq, np.float64),
                                   rtol=1e-2, atol=1e-3)


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
                assert qcfg["compressed_tensors"]["format"] == "pack-quantized"
                from safetensors.numpy import load_file
                t = load_file(os.path.join(out, "model.safetensors"))
                assert any(k.endswith(".weight_packed") for k in t)
                assert any(k.endswith(".weight_shape") for k in t)
