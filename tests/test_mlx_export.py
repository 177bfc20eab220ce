"""MLX-format export: bit-stream packing + affine dequant + writer."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.export.mlx import (mlx_pack_layer, pack_mlx_weight,
                                      unpack_mlx_weight)


class TestMlxPacking:
    @pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 8])
    def test_roundtrip(self, bits):
        rng = np.random.default_rng(bits)
        codes = rng.integers(0, 2 ** bits, (8, 128), dtype=np.uint32)
        words = pack_mlx_weight(codes, bits)
        assert words.dtype == np.uint32
        assert words.shape == (8, 128 * bits // 32)
        np.testing.assert_array_equal(
            unpack_mlx_weight(words, bits, 128), codes)

    def test_inword_lsb_first(self):
        """Element 0 sits in the low bits of word 0 (MLX little-endian)."""
        codes = np.zeros((1, 8), np.uint32)
        codes[0, 0] = 0xA
        codes[0, 1] = 0x3
        words = pack_mlx_weight(codes, 4)
        assert words[0, 0] == 0xA | (0x3 << 4)

    def test_crossword_bit_positions(self):
        """3-bit: element 10 occupies absolute bits 30..32 — it must span
        the word 0 / word 1 boundary."""
        codes = np.zeros((1, 32), np.uint32)
        codes[0, 10] = 0b111
        words = pack_mlx_weight(codes, 3)
        assert words[0, 0] == np.uint32(0b11 << 30)  # low 2 bits of elem 10
        assert words[0, 1] == np.uint32(1)           # high bit

    def test_affine_dequant_matches_qdq(self):
        """scales * w_int + biases reproduces the qdq weights (sym)."""
        from autoround_tpu.dtypes.intq import qdq_int_sym
        from autoround_tpu.quantize.orchestrator import QuantizedLayer
        from autoround_tpu.schemes import PRESET_SCHEMES

        w = jax.random.normal(jax.random.PRNGKey(0), (16, 256), jnp.float32)
        r = qdq_int_sym(w, bits=4, group_size=128)
        ql = QuantizedLayer(name="l", scheme=PRESET_SCHEMES["W4A16"],
                            qdq=r.qdq, scale=r.scale, zp=None)
        p = mlx_pack_layer(ql)
        codes = unpack_mlx_weight(p["weight"], 4, 256).astype(np.float32)
        s = np.repeat(p["scales"].astype(np.float32), 128, axis=1)
        b = np.repeat(p["biases"].astype(np.float32), 128, axis=1)
        dq = s * codes + b
        np.testing.assert_allclose(dq, np.asarray(r.qdq), atol=2e-3)

    def test_affine_dequant_matches_qdq_asym(self):
        from autoround_tpu.dtypes.intq import qdq_int_asym
        from autoround_tpu.quantize.orchestrator import QuantizedLayer
        from autoround_tpu.schemes import parse_scheme

        w = jax.random.normal(jax.random.PRNGKey(1), (16, 256), jnp.float32)
        r = qdq_int_asym(w, bits=4, group_size=64)
        scheme = parse_scheme({"bits": 4, "group_size": 64, "sym": False})
        ql = QuantizedLayer(name="l", scheme=scheme,
                            qdq=r.qdq, scale=r.scale, zp=r.zp)
        p = mlx_pack_layer(ql)
        codes = unpack_mlx_weight(p["weight"], 4, 256).astype(np.float32)
        s = np.repeat(p["scales"].astype(np.float32), 64, axis=1)
        b = np.repeat(p["biases"].astype(np.float32), 64, axis=1)
        # fp16 biases carry the s*zp product's rounding (zp up to 15
        # amplifies fp16 eps) — inherent to the format's fp16 fields
        np.testing.assert_allclose(s * codes + b, np.asarray(r.qdq),
                                   atol=1.5e-2)


class TestMlxWriter:
    def test_end_to_end_save(self, tmp_path):
        from safetensors.numpy import load_file

        from autoround_tpu import AutoRound
        from autoround_tpu.models import llama

        cfg = llama.LlamaConfig(vocab_size=64, hidden_size=256,
                                intermediate_size=256, num_layers=2,
                                num_heads=4, num_kv_heads=2, rope_theta=1e4,
                                dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
        ar = AutoRound((params, cfg), scheme="W4A16G32", iters=0)
        ar.quantize(ids)
        out = ar.save_quantized(str(tmp_path / "mlx"), format="mlx")

        flat = load_file(os.path.join(out, "model.safetensors"))
        assert "model.layers.0.self_attn.q_proj.weight" in flat
        assert flat["model.layers.0.self_attn.q_proj.weight"].dtype == np.uint32
        assert flat["model.layers.0.self_attn.q_proj.scales"].dtype == np.float16
        assert flat["model.layers.0.self_attn.q_proj.biases"].dtype == np.float16
        assert flat["model.embed_tokens.weight"].dtype == np.float16
        with open(os.path.join(out, "config.json")) as f:
            c = json.load(f)
        assert c["quantization"]["bits"] == 4
        assert c["quantization"]["group_size"] == 32
        # lm_head untouched by default → marked false for mlx-lm
        assert c["quantization"].get("lm_head", False) is False
