"""SD3/Flux checkpoint loader: diffusers safetensors layout → MMDiT
pytree (VERDICT r3 item 8).

Real SD3 weights are egress-bound, so the tests fabricate a checkpoint
directory with the REAL diffusers key names (inverting the documented
mapping from a native pytree) and assert load-back identity, then run
the loaded model through quantize → regenerate end-to-end.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.models import mmdit
from autoround_tpu.utils.mmdit_loader import load_mmdit_checkpoint

CFG = mmdit.MMDiTConfig(
    vocab_size=1, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=4, dtype=jnp.float32,
    image_size=16, patch_size=4, in_channels=4,
    text_len=8, text_dim=32, pooled_dim=32, t_embed_dim=256)


def fabricate_sd3_dir(tmpdir, cfg, params, pre_only_last=False,
                      pos_embed_max=None):
    """Emit a diffusers SD3Transformer2DModel component directory from a
    native pytree (the inverse of the loader's key mapping)."""
    from safetensors.numpy import save_file
    H = cfg.hidden_size
    P = cfg.patch_size
    g = cfg.image_size // P
    M = pos_embed_max or g
    rng = np.random.default_rng(0)
    flat = {}

    def put(key, a):
        # safetensors mis-serializes non-contiguous views (raw buffer +
        # new shape) — force contiguity
        flat[key] = np.ascontiguousarray(np.asarray(a, np.float32))

    pe = np.asarray(params["patch_embed"], np.float32)   # (H, P·P·C)
    put("pos_embed.proj.weight",
        pe.reshape(H, P, P, cfg.in_channels).transpose(0, 3, 1, 2))
    put("pos_embed.proj.bias", params["patch_embed_bias"])
    grid = rng.normal(size=(M, M, H)).astype(np.float32) * 0.02
    o = (M - g) // 2
    grid[o:o + g, o:o + g] = np.asarray(params["pos_embed"],
                                        np.float32).reshape(g, g, H)
    put("pos_embed.pos_embed", grid.reshape(1, M * M, H))
    put("context_embedder.weight", params["txt_embed"])
    put("context_embedder.bias", params["txt_embed_bias"])
    tte = "time_text_embed"
    put(f"{tte}.timestep_embedder.linear_1.weight", params["t_mlp1"])
    put(f"{tte}.timestep_embedder.linear_1.bias", params["t_mlp1_bias"])
    put(f"{tte}.timestep_embedder.linear_2.weight", params["t_mlp2"])
    put(f"{tte}.timestep_embedder.linear_2.bias", params["t_mlp2_bias"])
    put(f"{tte}.text_embedder.linear_1.weight", params["pool_mlp"])
    put(f"{tte}.text_embedder.linear_1.bias", params["pool_mlp_bias"])
    put(f"{tte}.text_embedder.linear_2.weight", params["pool_mlp2"])
    put(f"{tte}.text_embedder.linear_2.bias", params["pool_mlp2_bias"])
    for i, blk in enumerate(params["blocks"]):
        p = f"transformer_blocks.{i}"
        last = pre_only_last and i == len(params["blocks"]) - 1
        put(f"{p}.norm1.linear.weight", blk["ada"])
        put(f"{p}.norm1.linear.bias", blk["ada_bias"])
        ta = np.asarray(blk["txt_ada"], np.float32)
        tb = np.asarray(blk["txt_ada_bias"], np.float32)
        if last:
            # continuous norm (scale, shift) from our (sh1, sc1)
            put(f"{p}.norm1_context.linear.weight",
                np.concatenate([ta[H:2 * H], ta[0:H]], axis=0))
            put(f"{p}.norm1_context.linear.bias",
                np.concatenate([tb[H:2 * H], tb[0:H]], axis=0))
        else:
            put(f"{p}.norm1_context.linear.weight", ta)
            put(f"{p}.norm1_context.linear.bias", tb)
        qkv = np.asarray(blk["qkv"], np.float32)
        qkv_b = np.asarray(blk["qkv_b"], np.float32)
        for j, n in enumerate(("to_q", "to_k", "to_v")):
            put(f"{p}.attn.{n}.weight", qkv[j * H:(j + 1) * H])
            put(f"{p}.attn.{n}.bias", qkv_b[j * H:(j + 1) * H])
        tqkv = np.asarray(blk["txt_qkv"], np.float32)
        names = ("add_q_proj", "add_k_proj", "add_v_proj")
        for j, n in enumerate(names):
            if last and n == "add_q_proj":
                continue   # context_pre_only: K/V only
            put(f"{p}.attn.{n}.weight", tqkv[j * H:(j + 1) * H])
        if not last:
            tqkv_b = np.asarray(blk["txt_qkv_b"], np.float32)
            for j, n in enumerate(names):
                put(f"{p}.attn.{n}.bias", tqkv_b[j * H:(j + 1) * H])
        put(f"{p}.attn.norm_q.weight", blk["q_norm"])
        put(f"{p}.attn.norm_k.weight", blk["k_norm"])
        put(f"{p}.attn.norm_added_q.weight", blk["txt_q_norm"])
        put(f"{p}.attn.norm_added_k.weight", blk["txt_k_norm"])
        put(f"{p}.attn.to_out.0.weight", blk["proj"])
        put(f"{p}.attn.to_out.0.bias", blk["proj_b"])
        if not last:
            put(f"{p}.attn.to_add_out.weight", blk["txt_proj"])
        put(f"{p}.ff.net.0.proj.weight", blk["fc1"])
        put(f"{p}.ff.net.0.proj.bias", blk["fc1_b"])
        put(f"{p}.ff.net.2.weight", blk["fc2"])
        put(f"{p}.ff.net.2.bias", blk["fc2_b"])
        if not last:
            put(f"{p}.ff_context.net.0.proj.weight", blk["txt_fc1"])
            put(f"{p}.ff_context.net.2.weight", blk["txt_fc2"])
    fa = np.asarray(params["final_ada"], np.float32)
    fb = np.asarray(params["final_ada_bias"], np.float32)
    put("norm_out.linear.weight",
        np.concatenate([fa[H:2 * H], fa[0:H]], axis=0))
    put("norm_out.linear.bias",
        np.concatenate([fb[H:2 * H], fb[0:H]], axis=0))
    put("proj_out.weight", params["final_linear"])
    put("proj_out.bias", np.zeros(cfg.patch_dim, np.float32))

    os.makedirs(tmpdir, exist_ok=True)
    save_file(flat, os.path.join(
        tmpdir, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump({
            "num_attention_heads": cfg.num_heads,
            "attention_head_dim": cfg.hidden_size // cfg.num_heads,
            "num_layers": cfg.num_layers,
            "sample_size": cfg.image_size,
            "patch_size": cfg.patch_size,
            "in_channels": cfg.in_channels,
            "joint_attention_dim": cfg.text_dim,
            "pooled_projection_dim": cfg.pooled_dim,
            "qk_norm": "rms_norm",
            "pos_embed_max_size": M,
        }, f)


def _native_params_with_biases(cfg, key):
    params = mmdit.init_params(cfg, key)
    rng = np.random.default_rng(3)
    H, I = cfg.hidden_size, cfg.intermediate_size
    te = cfg.t_embed_dim or H

    def noise(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.02)

    params["patch_embed_bias"] = noise(H)
    params["txt_embed_bias"] = noise(H)
    params["t_mlp1"] = noise(H, te)       # diffusers 256-dim sinusoid
    params["t_mlp1_bias"] = noise(H)
    params["t_mlp2_bias"] = noise(H)
    params["pool_mlp_bias"] = noise(H)
    params["pool_mlp2"] = noise(H, H)
    params["pool_mlp2_bias"] = noise(H)
    for blk in params["blocks"]:
        blk["qkv_b"] = noise(3 * H)
        blk["txt_qkv_b"] = noise(3 * H)
        blk["proj_b"] = noise(H)
        blk["fc1_b"] = noise(I)
        blk["fc2_b"] = noise(H)
    return params


def _inputs(cfg, B=2):
    rng = np.random.default_rng(7)
    return {
        "pixel_values": jnp.asarray(rng.normal(size=(
            B, cfg.image_size, cfg.image_size, cfg.in_channels)
        ).astype(np.float32)),
        "timesteps": jnp.asarray([100.0, 500.0], jnp.float32)[:B],
        "encoder_states": jnp.asarray(rng.normal(size=(
            B, cfg.text_len, cfg.text_dim)).astype(np.float32)),
        "pooled": jnp.asarray(rng.normal(size=(
            B, cfg.pooled_dim)).astype(np.float32)),
    }


class TestMMDiTLoader:
    def test_roundtrip_identity(self, tmp_path):
        params = _native_params_with_biases(CFG, jax.random.PRNGKey(0))
        d = str(tmp_path / "sd3")
        fabricate_sd3_dir(d, CFG, params, pos_embed_max=8)
        loaded, cfg2 = load_mmdit_checkpoint(d)
        assert cfg2.num_layers == CFG.num_layers
        assert cfg2.hidden_size == CFG.hidden_size
        assert cfg2.intermediate_size == CFG.intermediate_size
        assert cfg2.t_embed_dim == 256
        # forward parity (f32 fabricated, bf16 loaded → loose tol)
        cfgf = dataclasses.replace(cfg2, dtype=jnp.float32)
        loaded = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), loaded)
        y0 = mmdit.model_fwd(params, _inputs(CFG), CFG)
        y1 = mmdit.model_fwd(loaded, _inputs(CFG), cfgf)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-2, atol=2e-2)

    def test_context_pre_only_last_block(self, tmp_path):
        params = _native_params_with_biases(CFG, jax.random.PRNGKey(1))
        d = str(tmp_path / "sd3p")
        fabricate_sd3_dir(d, CFG, params, pre_only_last=True)
        loaded, cfg2 = load_mmdit_checkpoint(d)
        last = loaded["blocks"][-1]
        # zeroed txt-side weights; image output unaffected by txt_proj
        assert float(jnp.abs(last["txt_proj"]).max()) == 0.0
        y = mmdit.model_fwd(
            jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), loaded),
            _inputs(CFG),
            dataclasses.replace(cfg2, dtype=jnp.float32))
        assert np.isfinite(np.asarray(y)).all()

    def test_quantize_and_regenerate(self, tmp_path):
        """Loaded checkpoint → RTN quantize → euler regenerate."""
        from autoround_tpu import AutoRound
        params = _native_params_with_biases(CFG, jax.random.PRNGKey(2))
        d = str(tmp_path / "sd3q")
        fabricate_sd3_dir(d, CFG, params)
        loaded, cfg2 = load_mmdit_checkpoint(d)
        cfgf = dataclasses.replace(cfg2, dtype=jnp.float32)
        loaded = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), loaded)
        rng = np.random.default_rng(5)
        enc = jnp.asarray(rng.normal(size=(
            2, 4, cfgf.text_dim)).astype(np.float32))
        pooled = jnp.asarray(rng.normal(size=(
            2, cfgf.pooled_dim)).astype(np.float32))
        captured = []
        mmdit.euler_sample(loaded, cfgf, enc, pooled,
                           jax.random.PRNGKey(0), steps=2,
                           capture=captured.append)
        assert len(captured) == 2
        calib = {k: np.concatenate([np.asarray(c[k]) for c in captured])
                 for k in captured[0]}
        res = AutoRound((loaded, cfgf), scheme="W4A16G32",
                        iters=0).quantize(calib)
        img = mmdit.euler_sample(res.params, cfgf, enc, pooled,
                                 jax.random.PRNGKey(0), steps=2)
        assert np.isfinite(np.asarray(img)).all()
