"""CLIP score machinery (diffusion eval metric role)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.eval.clip_score import (ClipConfig, clip_score,
                                           encode_image, encode_text,
                                           init_clip_params,
                                           load_clip_checkpoint)

CFG = ClipConfig(image_size=32, patch_size=8, v_hidden=32, v_layers=2,
                 v_heads=2, t_vocab=64, t_hidden=32, t_layers=2, t_heads=2,
                 t_max_len=16, projection_dim=24, eot_token_id=63)


def _inputs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    px = rng.standard_normal((n, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(1, 50, (n, 12)).astype(np.int32)
    ids[:, -1] = 63   # EOT
    return jnp.asarray(px), jnp.asarray(ids)


class TestClipScore:
    def test_shapes_and_range(self):
        params = init_clip_params(CFG, jax.random.PRNGKey(0))
        px, ids = _inputs()
        img = encode_image(params, px, CFG)
        txt = encode_text(params, ids, CFG)
        assert img.shape == (3, 24) and txt.shape == (3, 24)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(img), axis=-1), 1.0, rtol=1e-5)
        s = np.asarray(clip_score(params, px, ids, CFG))
        assert s.shape == (3,)
        assert (s >= 0).all() and (s <= 100).all()

    def test_eot_pooling_position(self):
        """Moving the EOT token must change the text embedding."""
        params = init_clip_params(CFG, jax.random.PRNGKey(0))
        _, ids = _inputs()
        ids2 = np.asarray(ids).copy()
        ids2[:, -1] = 5
        ids2[:, 4] = 63   # EOT earlier
        t1 = np.asarray(encode_text(params, ids, CFG))
        t2 = np.asarray(encode_text(params, jnp.asarray(ids2), CFG))
        assert np.abs(t1 - t2).max() > 1e-4

    def test_hf_loader_roundtrip(self, tmp_path):
        """Fabricate an HF CLIPModel checkpoint from init params; loaded
        encoders must match the direct ones exactly."""
        from safetensors.numpy import save_file
        params = init_clip_params(CFG, jax.random.PRNGKey(1))
        t = {}
        vt, tx = params["vision"], params["text"]
        P, D = CFG.patch_size, CFG.v_hidden
        t["visual_projection.weight"] = np.asarray(
            params["visual_projection"])
        t["text_projection.weight"] = np.asarray(params["text_projection"])
        t["logit_scale"] = np.asarray(params["logit_scale"])
        vp = "vision_model."
        t[vp + "embeddings.class_embedding"] = np.asarray(vt["class_embed"])
        t[vp + "embeddings.patch_embedding.weight"] = np.ascontiguousarray(
            np.asarray(vt["patch_embed"]).reshape(D, P, P, 3)
            .transpose(0, 3, 1, 2))
        t[vp + "embeddings.position_embedding.weight"] = np.asarray(
            vt["pos_embed"])
        t[vp + "pre_layrnorm.weight"] = np.asarray(vt["pre_ln_g"])
        t[vp + "pre_layrnorm.bias"] = np.asarray(vt["pre_ln_b"])
        t[vp + "post_layernorm.weight"] = np.asarray(vt["ln_f_g"])
        t[vp + "post_layernorm.bias"] = np.asarray(vt["ln_f_b"])
        tp = "text_model."
        t[tp + "embeddings.token_embedding.weight"] = np.asarray(
            tx["token_embed"])
        t[tp + "embeddings.position_embedding.weight"] = np.asarray(
            tx["pos_embed"])
        t[tp + "final_layer_norm.weight"] = np.asarray(tx["ln_f_g"])
        t[tp + "final_layer_norm.bias"] = np.asarray(tx["ln_f_b"])

        def emit_blocks(prefix, blocks):
            lnm = {"ln1_g": "layer_norm1.weight", "ln1_b": "layer_norm1.bias",
                   "ln2_g": "layer_norm2.weight", "ln2_b": "layer_norm2.bias",
                   "fc1": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
                   "fc2": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias",
                   "proj": "self_attn.out_proj.weight",
                   "proj_b": "self_attn.out_proj.bias"}
            for li, blk in enumerate(blocks):
                bp = f"{prefix}encoder.layers.{li}."
                for ours, hf in lnm.items():
                    t[bp + hf] = np.asarray(blk[ours])
                qw = np.split(np.asarray(blk["qkv"]), 3, axis=0)
                qb = np.split(np.asarray(blk["qkv_b"]), 3)
                for (pn, w, b) in zip(("q_proj", "k_proj", "v_proj"),
                                      qw, qb):
                    t[bp + f"self_attn.{pn}.weight"] = np.ascontiguousarray(w)
                    t[bp + f"self_attn.{pn}.bias"] = np.ascontiguousarray(b)

        emit_blocks(vp, vt["blocks"])
        emit_blocks(tp, tx["blocks"])
        save_file(t, str(tmp_path / "model.safetensors"))
        hf_cfg = {
            "model_type": "clip", "projection_dim": CFG.projection_dim,
            "vision_config": {"image_size": 32, "patch_size": 8,
                              "hidden_size": 32, "num_hidden_layers": 2,
                              "num_attention_heads": 2},
            "text_config": {"vocab_size": 64, "hidden_size": 32,
                            "num_hidden_layers": 2,
                            "num_attention_heads": 2,
                            "max_position_embeddings": 16,
                            "eos_token_id": 63},
        }
        json.dump(hf_cfg, open(tmp_path / "config.json", "w"))

        p2, cfg2 = load_clip_checkpoint(str(tmp_path))
        assert cfg2.projection_dim == CFG.projection_dim
        px, ids = _inputs()
        np.testing.assert_allclose(
            np.asarray(encode_image(params, px, CFG)),
            np.asarray(encode_image(p2, px, cfg2)), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(encode_text(params, ids, CFG)),
            np.asarray(encode_text(p2, ids, cfg2)), rtol=1e-4, atol=1e-5)
