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


class TestClipIqa:
    """CLIP-IQA math locked against a manual torch computation through
    the SAME weights (ref diffusion/eval.py:40-48 -> torchmetrics
    CLIPImageQualityAssessment: softmax over the antonym pair's
    100*cosine logits)."""

    def test_matches_manual_softmax(self):
        from autoround_tpu.eval.clip_score import (ClipConfig, clip_iqa,
                                                   encode_image,
                                                   encode_text,
                                                   init_clip_params)
        cfg = ClipConfig(image_size=32, patch_size=8, v_hidden=64,
                         v_layers=2, v_heads=4, t_vocab=64, t_hidden=32,
                         t_layers=2, t_heads=2, t_max_len=8,
                         projection_dim=16, eot_token_id=63)
        params = init_clip_params(cfg, jax.random.PRNGKey(0))
        pixels = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
        pair = jnp.asarray([[1, 5, 9, 63, 0, 0, 0, 0],
                            [2, 6, 7, 63, 0, 0, 0, 0]], jnp.int32)
        got = np.asarray(clip_iqa(params, pixels, pair, cfg))
        img = np.asarray(encode_image(params, pixels, cfg))
        txt = np.asarray(encode_text(params, pair, cfg))
        logits = 100.0 * img @ txt.T
        e = np.exp(logits - logits.max(-1, keepdims=True))
        want = (e / e.sum(-1, keepdims=True))[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert ((got >= 0) & (got <= 1)).all()

    def test_discriminates(self):
        """An image embedding aligned with the positive prompt must
        score higher than one aligned with the negative."""
        from autoround_tpu.eval.clip_score import (ClipConfig, clip_iqa,
                                                   encode_text,
                                                   init_clip_params)
        cfg = ClipConfig(image_size=32, patch_size=8, v_hidden=64,
                         v_layers=2, v_heads=4, t_vocab=64, t_hidden=32,
                         t_layers=2, t_heads=2, t_max_len=8,
                         projection_dim=16, eot_token_id=63)
        params = init_clip_params(cfg, jax.random.PRNGKey(0))
        pair = jnp.asarray([[1, 5, 9, 63, 0, 0, 0, 0],
                            [2, 6, 7, 63, 0, 0, 0, 0]], jnp.int32)
        txt = encode_text(params, pair, cfg)
        # synthetic image embeddings: exactly the prompt embeddings
        logits = 100.0 * jnp.einsum("bp,cp->bc", txt, txt)
        probs = np.asarray(jax.nn.softmax(logits, -1)[:, 0])
        assert probs[0] > 0.5 > probs[1]


class TestImageReward:
    def test_head_shapes_and_loader(self, tmp_path):
        import torch
        from autoround_tpu.eval.clip_score import (image_reward_score,
                                                   init_image_reward_head,
                                                   load_image_reward_head)
        head = init_image_reward_head(jax.random.PRNGKey(0))
        feats = jax.random.normal(jax.random.PRNGKey(1), (4, 768))
        s = np.asarray(image_reward_score(head, feats))
        assert s.shape == (4,) and np.isfinite(s).all()
        # loader maps the published mlp.layers.{0,2,4,6,8} layout
        sd = {}
        dims = (768, 1024, 128, 64, 16, 1)
        for j, i in enumerate(range(0, 10, 2)):
            sd[f"mlp.layers.{i}.weight"] = torch.randn(dims[j + 1],
                                                       dims[j])
            sd[f"mlp.layers.{i}.bias"] = torch.randn(dims[j + 1])
        p = tmp_path / "ImageReward.pt"
        torch.save(sd, str(p))
        head2 = load_image_reward_head(str(p))
        s2 = np.asarray(image_reward_score(head2, feats))
        # manual forward
        x = np.asarray(feats, np.float32)
        for j, i in enumerate(range(0, 10, 2)):
            x = x @ sd[f"mlp.layers.{i}.weight"].numpy().T \
                + sd[f"mlp.layers.{i}.bias"].numpy()
            if i < 8:
                x = np.maximum(x, 0)
        want = (x[:, 0] - 0.16717362) / 1.0333394
        np.testing.assert_allclose(s2, want, rtol=1e-5, atol=1e-5)
