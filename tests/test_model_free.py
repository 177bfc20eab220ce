"""Model-free streaming compressor tests."""

import json
import os

import jax
import numpy as np
import pytest
from safetensors.numpy import load_file, save_file

from autoround_tpu.export.packing import unpack_quantized
from autoround_tpu.quantize.model_free import model_free_quantize


@pytest.fixture()
def fake_ckpt(tmp_path):
    """Two-shard checkpoint with projection weights + norms + embeddings."""
    rng = np.random.default_rng(0)
    d = tmp_path / "model"
    d.mkdir()
    shard1 = {
        "model.layers.0.self_attn.q_proj.weight":
            rng.standard_normal((64, 128)).astype(np.float32),
        "model.layers.0.input_layernorm.weight":
            np.ones(128, np.float32),
    }
    shard2 = {
        "model.layers.1.mlp.down_proj.weight":
            rng.standard_normal((128, 64)).astype(np.float32),
        "model.embed_tokens.weight":
            rng.standard_normal((256, 128)).astype(np.float32),
    }
    save_file(shard1, str(d / "model-00001-of-00002.safetensors"))
    save_file(shard2, str(d / "model-00002-of-00002.safetensors"))
    wmap = {k: "model-00001-of-00002.safetensors" for k in shard1}
    wmap.update({k: "model-00002-of-00002.safetensors" for k in shard2})
    with open(d / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": wmap}, f)
    with open(d / "config.json", "w") as f:
        json.dump({"model_type": "llama"}, f)
    return str(d)


class TestModelFree:
    def test_streams_and_packs(self, fake_ckpt, tmp_path):
        out = model_free_quantize(fake_ckpt, str(tmp_path / "out"),
                                  scheme="W4A16G32")
        qcfg = json.load(open(os.path.join(out, "quantization_config.json")))
        assert "model.layers.0.self_attn.q_proj" in qcfg["quantized_layers"]
        assert "model.embed_tokens" not in qcfg["quantized_layers"]
        t1 = load_file(os.path.join(out, "model-00001-of-00002.safetensors"))
        assert "model.layers.0.self_attn.q_proj.qweight" in t1
        assert "model.layers.0.input_layernorm.weight" in t1
        # dequant roundtrip sanity
        q, s, zp = unpack_quantized(
            {k.split(".")[-1]: t1[f"model.layers.0.self_attn.q_proj.{k}"]
             for k in ("qweight", "qzeros", "scales")}, 4, 64, 128)
        dq = (q.astype(np.float32) - np.repeat(zp, 32, 1)[:, :128]) \
            * np.repeat(s, 32, 1)[:, :128]
        src = load_file(os.path.join(
            fake_ckpt, "model-00001-of-00002.safetensors"))[
            "model.layers.0.self_attn.q_proj.weight"]
        err = np.abs(dq - src).max()
        assert err < np.abs(src).max() * 0.2

    def test_qdq_mode(self, fake_ckpt, tmp_path):
        out = model_free_quantize(fake_ckpt, str(tmp_path / "out2"),
                                  scheme="W8A16", pack=False)
        t1 = load_file(os.path.join(out, "model-00001-of-00002.safetensors"))
        assert "model.layers.0.self_attn.q_proj" in t1  # qdq replaces
        assert t1["model.layers.0.self_attn.q_proj"].shape == (64, 128)

    def test_parallel_workers_match_serial(self, fake_ckpt, tmp_path):
        out1 = model_free_quantize(fake_ckpt, str(tmp_path / "s"),
                                   scheme="W4A16G32", num_workers=1)
        out2 = model_free_quantize(fake_ckpt, str(tmp_path / "p"),
                                   scheme="W4A16G32", num_workers=2)
        a = load_file(os.path.join(out1, "model-00001-of-00002.safetensors"))
        b = load_file(os.path.join(out2, "model-00001-of-00002.safetensors"))
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


class TestFp8SourceAndFusedMoe:
    def test_fp8_source_dequant(self, tmp_path):
        """FP8 checkpoint (float8 weights + block weight_scale_inv) is
        dequantized before quantization; scale tensors are consumed."""
        import torch
        from safetensors.torch import save_file as save_pt
        from autoround_tpu.quantize.model_free import model_free_quantize

        rng = np.random.default_rng(0)
        w32 = (rng.standard_normal((256, 256)) * 0.05).astype(np.float32)
        scale = np.full((2, 2), 2.0, np.float32)   # 128x128 blocks
        w8 = torch.tensor(w32 / 2.0).to(torch.float8_e4m3fn)
        src = tmp_path / "src"
        src.mkdir()
        save_pt({"model.layers.0.self_attn.q_proj.weight": w8,
                 "model.layers.0.self_attn.q_proj.weight_scale_inv":
                     torch.tensor(scale),
                 "model.embed_tokens.weight":
                     torch.zeros(8, 256)},
                str(src / "model.safetensors"))
        json.dump({"model_type": "llama"}, open(src / "config.json", "w"))
        out = model_free_quantize(str(src), str(tmp_path / "out"),
                                  scheme="W4A16G32", pack=False,
                                  num_workers=1)
        from safetensors import safe_open
        with safe_open(os.path.join(out, "model.safetensors"),
                       framework="numpy") as f:
            keys = set(f.keys())
            q = f.get_tensor("model.layers.0.self_attn.q_proj")
        assert not any("weight_scale" in k for k in keys)
        # qdq of the DEQUANTIZED (x2) weight, not the raw fp8 values
        ref = w8.float().numpy() * 2.0
        err = np.abs(q - ref).max()
        assert err < np.abs(ref).max() * 0.2
        # scale applied: raw-fp8 qdq would be ~half the magnitude
        assert np.abs(q).max() > np.abs(w8.float().numpy()).max() * 1.5

    def test_fused_moe_split(self, tmp_path):
        """3-D (E, O, I) expert stacks split into per-expert entries."""
        from safetensors.numpy import save_file
        from autoround_tpu.quantize.model_free import model_free_quantize

        rng = np.random.default_rng(1)
        stack = (rng.standard_normal((4, 64, 64)) * 0.05).astype(np.float32)
        src = tmp_path / "src"
        src.mkdir()
        save_file({"model.layers.0.mlp.experts.gate_proj.weight": stack},
                  str(src / "model.safetensors"))
        json.dump({"model_type": "mixtral"}, open(src / "config.json", "w"))
        out = model_free_quantize(str(src), str(tmp_path / "out"),
                                  scheme="W4A16G32", pack=True,
                                  num_workers=1)
        from safetensors import safe_open
        with safe_open(os.path.join(out, "model.safetensors"),
                       framework="numpy") as f:
            keys = set(f.keys())
        for e in range(4):
            assert (f"model.layers.0.mlp.experts.gate_proj.{e}.qweight"
                    in keys), keys
