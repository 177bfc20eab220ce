"""Real llava-hf checkpoint loading: CLIP-faithful tower, processor,
prompt expansion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu.models import llava
from autoround_tpu.utils.vlm_loader import (expand_image_prompt,
                                            load_llava_checkpoint,
                                            preprocess_images,
                                            save_llava_checkpoint)


def _clip_style_cfg():
    return llava.LlavaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, rope_theta=1e4,
        dtype=jnp.float32, image_size=32, patch_size=8, v_hidden=32,
        v_layers=3, v_heads=2, image_token_id=1, v_class_token=True,
        v_quick_gelu=True, v_feature_layer=-2)


def _clip_style_params(cfg, seed=0):
    """init_params + the CLIP extras (class token, biases, pre-LN)."""
    params = llava.init_params(cfg, jax.random.PRNGKey(seed))
    vt = params["vision_tower"]
    key = jax.random.PRNGKey(seed + 1)
    D = cfg.v_hidden
    vt["class_embed"] = jax.random.normal(key, (D,), cfg.dtype) * 0.02
    # position table gains the class slot
    vt["pos_embed"] = jax.random.normal(
        jax.random.fold_in(key, 1), (cfg.num_patches + 1, D),
        cfg.dtype) * 0.02
    vt["pre_ln_g"] = jnp.ones((D,), cfg.dtype)
    vt["pre_ln_b"] = jnp.zeros((D,), cfg.dtype)
    for i, blk in enumerate(vt["blocks"]):
        bk = jax.random.fold_in(key, 10 + i)
        blk["qkv_b"] = jax.random.normal(bk, (3 * D,), cfg.dtype) * 0.02
        blk["proj_b"] = jnp.zeros((D,), cfg.dtype)
        blk["fc1_b"] = jax.random.normal(jax.random.fold_in(bk, 1),
                                         (4 * D,), cfg.dtype) * 0.02
        blk["fc2_b"] = jnp.zeros((D,), cfg.dtype)
    mm = params["mm_projector"]
    mm["fc1_b"] = jax.random.normal(jax.random.fold_in(key, 50),
                                    (cfg.hidden_size,), cfg.dtype) * 0.02
    mm["fc2_b"] = jnp.zeros((cfg.hidden_size,), cfg.dtype)
    return params


def _batch(cfg, n=2, seed=3):
    rng = np.random.default_rng(seed)
    P = cfg.num_patches
    S = P + 8
    ids = rng.integers(2, cfg.vocab_size, (n, S)).astype(np.int32)
    ids[:, :P] = cfg.image_token_id
    px = rng.standard_normal((n, cfg.image_size, cfg.image_size, 3)
                             ).astype(np.float32)
    return {"input_ids": jnp.asarray(ids), "pixel_values": jnp.asarray(px)}


class TestLlavaRoundtrip:
    def test_save_load_logits_match(self, tmp_path):
        cfg = _clip_style_cfg()
        params = _clip_style_params(cfg)
        save_llava_checkpoint(params, cfg, str(tmp_path / "v"))
        p2, cfg2 = load_llava_checkpoint(str(tmp_path / "v"),
                                         dtype=jnp.float32)
        assert cfg2.v_class_token and cfg2.v_quick_gelu
        assert cfg2.v_feature_layer == -2
        assert cfg2.v_layers == 3
        batch = _batch(cfg)
        l1 = np.asarray(llava.model_fwd(params, batch, cfg), np.float32)
        l2 = np.asarray(llava.model_fwd(p2, batch, cfg2), np.float32)
        np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)

    def test_feature_layer_matters(self):
        """vision_feature_layer=-2 must differ from the final-LN output."""
        import dataclasses
        cfg = _clip_style_cfg()
        params = _clip_style_params(cfg)
        batch = _batch(cfg)
        l2 = llava.model_fwd(params, batch, cfg)
        cfgf = dataclasses.replace(cfg, v_feature_layer=-1)
        lf = llava.model_fwd(params, batch, cfgf)
        assert not np.allclose(np.asarray(l2), np.asarray(lf))

    def test_quantizes_text_blocks(self, tmp_path):
        from autoround_tpu import AutoRound
        cfg = _clip_style_cfg()
        params = _clip_style_params(cfg)
        batch = _batch(cfg, n=4)
        mask = np.ones(batch["input_ids"].shape, np.float32)
        res = AutoRound((params, cfg), scheme="W4A16", iters=2,
                        batch_size=2).quantize(batch, mask)
        assert "blocks.0.q_proj" in res.layers
        # vision tower stays FP (reference default for VLMs)
        assert not any("vision" in n for n in res.layers)


class TestProcessor:
    def test_preprocess_shapes_and_norm(self):
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (48, 64, 3)).astype(np.uint8),
                rng.integers(0, 255, (64, 40, 3)).astype(np.uint8)]
        px = preprocess_images(imgs, 32)
        assert px.shape == (2, 32, 32, 3)
        assert px.dtype == np.float32
        # CLIP-normalized: values roughly in [-3, 3]
        assert np.abs(px).max() < 4.0

    def test_expand_image_prompt(self):
        cfg = _clip_style_cfg()
        tok = lambda s: [100 + (ord(c) % 20) for c in s.strip()]
        ids = expand_image_prompt(tok, "hi <image> there", cfg, seqlen=40)
        assert ids.shape == (40,)
        P = cfg.num_patches
        img_positions = np.where(ids == cfg.image_token_id)[0]
        assert len(img_positions) == P
        # contiguous run
        assert img_positions[-1] - img_positions[0] == P - 1
