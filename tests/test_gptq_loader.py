"""Loading external HF-layout GPTQ checkpoints into the serving engine."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from autoround_tpu import AutoRound
from autoround_tpu.export.formats import gptq_pack_layer
from autoround_tpu.models import llama
from autoround_tpu.serve import QuantizedLlama


@pytest.fixture(scope="module")
def gptq_ckpt(tmp_path_factory):
    """Fabricate an HF-layout GPTQ checkpoint from a quantized model."""
    cfg = llama.LlamaConfig(vocab_size=128, hidden_size=1024,
                            intermediate_size=1024, num_layers=2,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    res = AutoRound((params, cfg), scheme="W4A16", iters=0).quantize(ids)

    from autoround_tpu.utils.hf_loader import _BLOCK_MAP, _TOP_MAP
    inv = {v: k[: -len(".weight")] for k, v in _BLOCK_MAP.items()
           if k.endswith(".weight")}
    tensors = {}
    for name, ql in res.layers.items():
        _, li, lname = name.split(".")
        hf = f"model.layers.{li}.{inv[lname]}"
        for k, v in gptq_pack_layer(ql).items():
            if k != "g_idx":
                tensors[f"{hf}.{k}"] = v
    tensors["model.embed_tokens.weight"] = np.asarray(
        res.params["embed_tokens"])
    tensors["model.norm.weight"] = np.asarray(res.params["norm"])
    tensors["lm_head.weight"] = np.asarray(res.params["lm_head"])
    for li in range(cfg.num_layers):
        b = res.params["blocks"][li]
        tensors[f"model.layers.{li}.input_layernorm.weight"] = np.asarray(
            b["input_layernorm"])
        tensors[f"model.layers.{li}.post_attention_layernorm.weight"] = \
            np.asarray(b["post_attention_layernorm"])

    d = tmp_path_factory.mktemp("gptq")
    save_file(tensors, str(d / "model.safetensors"))
    hf_cfg = {
        "model_type": "llama", "vocab_size": 128, "hidden_size": 1024,
        "intermediate_size": 1024, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "rope_theta": 1e4, "rms_norm_eps": 1e-5,
        "quantization_config": {"quant_method": "gptq", "bits": 4,
                                "group_size": 128, "sym": True},
    }
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    return str(d), cfg, res, ids


class TestGptqLoader:
    def test_loads_and_packs(self, gptq_ckpt):
        path, cfg, res, ids = gptq_ckpt
        eng = QuantizedLlama.from_gptq(path)
        base = [k for k in eng.packed
                if not k.endswith(("qkv", "gate_up"))]
        assert len(base) == cfg.num_layers * 7

    def test_logits_match_source(self, gptq_ckpt):
        path, cfg, res, ids = gptq_ckpt
        eng = QuantizedLlama.from_gptq(path, max_seq=32)
        mem = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        l0, _ = mem.prefill(ids[:1, :8])
        l1, _ = eng.prefill(ids[:1, :8])
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=0.1, atol=0.1)


@pytest.fixture(scope="module")
def awq_ckpt(tmp_path_factory):
    """Fabricate an HF-layout AWQ (gemm) checkpoint — asym 4-bit."""
    from autoround_tpu.export.formats import awq_pack_layer
    cfg = llama.LlamaConfig(vocab_size=128, hidden_size=1024,
                            intermediate_size=1024, num_layers=2,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    res = AutoRound((params, cfg),
                    scheme={"bits": 4, "group_size": 128, "sym": False},
                    iters=0).quantize(ids)

    from autoround_tpu.utils.hf_loader import _BLOCK_MAP
    inv = {v: k[: -len(".weight")] for k, v in _BLOCK_MAP.items()
           if k.endswith(".weight")}
    tensors = {}
    for name, ql in res.layers.items():
        _, li, lname = name.split(".")
        hf = f"model.layers.{li}.{inv[lname]}"
        for k, v in awq_pack_layer(ql).items():
            tensors[f"{hf}.{k}"] = v
    tensors["model.embed_tokens.weight"] = np.asarray(
        res.params["embed_tokens"])
    tensors["model.norm.weight"] = np.asarray(res.params["norm"])
    tensors["lm_head.weight"] = np.asarray(res.params["lm_head"])
    for li in range(cfg.num_layers):
        b = res.params["blocks"][li]
        tensors[f"model.layers.{li}.input_layernorm.weight"] = np.asarray(
            b["input_layernorm"])
        tensors[f"model.layers.{li}.post_attention_layernorm.weight"] = \
            np.asarray(b["post_attention_layernorm"])

    d = tmp_path_factory.mktemp("awq")
    save_file(tensors, str(d / "model.safetensors"))
    hf_cfg = {
        "model_type": "llama", "vocab_size": 128, "hidden_size": 1024,
        "intermediate_size": 1024, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "rope_theta": 1e4, "rms_norm_eps": 1e-5,
        "quantization_config": {"quant_method": "awq", "bits": 4,
                                "group_size": 128, "version": "gemm",
                                "zero_point": True},
    }
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    return str(d), cfg, res, ids


class TestAwqLoader:
    def test_loads_packs_asym(self, awq_ckpt):
        path, cfg, res, ids = awq_ckpt
        eng = QuantizedLlama.from_awq(path)
        base = [k for k in eng.packed if not k.endswith(("qkv", "gate_up"))]
        assert len(base) == cfg.num_layers * 7
        # asym entries carry a zp component and the asym kernel kind
        k0 = base[0]
        assert len(eng.packed[k0]) == 3
        assert eng.packed_kinds[k0] == "w4a16_asym"

    def test_logits_match_source(self, awq_ckpt):
        path, cfg, res, ids = awq_ckpt
        eng = QuantizedLlama.from_awq(path, max_seq=32)
        mem = QuantizedLlama.from_quantize_result(res, cfg, max_seq=32)
        l0, _ = mem.prefill(ids[:1, :8])
        l1, _ = eng.prefill(ids[:1, :8])
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l0, np.float32),
                                   rtol=0.1, atol=0.1)
