"""DeepSeek-VL2 family: pixel-shuffle projector semantics, MLA-decoder
splicing, and quantization e2e (VERDICT r3 item 7).

HF transformers (4.57) ships only DeepSeek-VL *v1* (llama decoder, no
pixel shuffle), so there is no upstream model to drive logit parity for
v2; instead the projector's fold ordering is pinned by a hand-computed
case and the decoder path is the already-HF-paritied deepseek MLA chain
(tests/test_deepseek.py). Role of the reference's deepseek_vl_v2 support
(``compressors/mllm/template.py:126``, ``special_model_handler.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoround_tpu import AutoRound
from autoround_tpu.models import deepseek, deepseek_vl, llama
from autoround_tpu.models.deepseek_vl import CONFIG_PRESETS, _pixel_shuffle

CFG = CONFIG_PRESETS["tiny-deepseek-vl2"]


def _inputs(B=2, S=None, seed=0):
    P = CFG.num_image_tokens
    S = S or (P + 8)
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, CFG.vocab_size, (B, S)).astype(np.int32)
    ids[:, :P] = CFG.image_token_id
    pixels = rng.standard_normal(
        (B, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    return {"input_ids": jnp.asarray(ids),
            "pixel_values": jnp.asarray(pixels)}


class TestProjector:
    def test_pixel_shuffle_ordering(self):
        """Token (i, j) of the shuffled grid must hold the r x r patch
        neighborhood rooted at (r*i, r*j), channels ordered
        (di, dj, Dv) — the DeepSeek-VL2 downsample convention."""
        g = CFG.image_size // CFG.patch_size
        r = CFG.downsample_ratio
        D = 3
        # feats[b, p, :] = [row(p), col(p), b]
        rows, cols = np.divmod(np.arange(g * g), g)
        feats = np.stack([rows, cols, np.zeros_like(rows)], -1)[None]
        # cfg only supplies g and r; D rides the trailing axis of feats
        out = np.asarray(_pixel_shuffle(jnp.asarray(feats, jnp.float32),
                                        CFG))
        go = g // r
        assert out.shape == (1, go * go, r * r * D)
        for i in range(go):
            for j in range(go):
                tok = out[0, i * go + j].reshape(r, r, D)
                for di in range(r):
                    for dj in range(r):
                        assert tok[di, dj, 0] == r * i + di
                        assert tok[di, dj, 1] == r * j + dj

    def test_splice_replaces_only_image_positions(self):
        params = deepseek_vl.init_params(CFG, jax.random.PRNGKey(0))
        inputs = _inputs()
        x = deepseek_vl.embed_fwd(params, inputs, CFG)
        plain = llama.embed_fwd(params, inputs["input_ids"], CFG)
        P = CFG.num_image_tokens
        np.testing.assert_allclose(np.asarray(x[:, P:]),
                                   np.asarray(plain[:, P:]), rtol=1e-6)
        assert not np.allclose(np.asarray(x[:, :P]),
                               np.asarray(plain[:, :P]))

    def test_text_only_matches_deepseek(self):
        params = deepseek_vl.init_params(CFG, jax.random.PRNGKey(0))
        ids = _inputs()["input_ids"]
        y_vl = deepseek_vl.model_fwd(params, {"input_ids": ids}, CFG)
        y_txt = deepseek.model_fwd(params, ids, CFG)
        np.testing.assert_allclose(np.asarray(y_vl), np.asarray(y_txt),
                                   rtol=1e-5, atol=1e-5)


class TestRegistry:
    def test_registry_dispatch(self):
        from autoround_tpu.models.registry import get_model_fns
        fns = get_model_fns(CFG)
        assert fns.embed_fwd is deepseek_vl.embed_fwd
        assert fns.block_fwd is deepseek.block_fwd

    def test_template(self):
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        tpl = get_vlm_template(CFG)
        assert tpl.model_type == "deepseek_vl_v2"
        txt = tpl.expand_images("see <image> now", CFG)
        assert txt.count("<image>") == CFG.num_image_tokens


class TestQuantize:
    def test_multimodal_calibration_e2e(self):
        """Calib batches route through the SigLIP tower + pixel shuffle
        and the quantize plan covers the MLA attention linears."""
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch
        params = deepseek_vl.init_params(CFG, jax.random.PRNGKey(0))
        inputs, mask = get_mllm_calib_batch(CFG, nsamples=4, seqlen=12)
        assert mask.shape == (4, 12)
        res = AutoRound((params, CFG), scheme="W4A16G32", iters=2,
                        batch_size=2).quantize(inputs, mask=mask)
        qnames = set(res.layers)
        assert any("kv_a_proj_with_mqa" in n for n in qnames), sorted(qnames)
        assert any("experts." in n for n in qnames)
        y = deepseek_vl.model_fwd(res.params, _inputs(seed=5), CFG)
        assert np.isfinite(np.asarray(y)).all()


class TestStateDictLoader:
    """Synthetic-layout roundtrip for the DeepSeek-VL2 state-dict loader
    (transformers<5 ships no VL2 modeling — layout per the published
    checkpoints: language.model.* / vision.* / projector.layers.*;
    VERDICT r4 item 8, mmdit_loader pattern)."""

    def test_roundtrip(self):
        from autoround_tpu.utils.hf_loader import _DS_ATTN_MAP
        from autoround_tpu.utils.vlm_loader import (
            deepseek_vl_params_from_state)
        p0 = deepseek_vl.init_params(CFG, jax.random.PRNGKey(0))
        inv_ds = {v: k for k, v in _DS_ATTN_MAP.items()}
        state = {
            "language.model.embed_tokens.weight": np.asarray(
                p0["embed_tokens"]),
            "language.model.norm.weight": np.asarray(p0["norm"]),
            "language.lm_head.weight": np.asarray(p0["lm_head"]),
        }
        for li, b in enumerate(p0["blocks"]):
            pre = f"language.model.layers.{li}."
            for ours, arr in b.items():
                if ours == "experts":
                    for e, ew in enumerate(arr):
                        for wn, w in ew.items():
                            state[pre + f"mlp.experts.{e}.{wn}.weight"] \
                                = np.asarray(w)
                elif ours == "shared_experts":
                    for wn, w in arr.items():
                        state[pre + f"mlp.shared_experts.{wn}.weight"] \
                            = np.asarray(w)
                elif ours == "gate":
                    state[pre + "mlp.gate.weight"] = np.asarray(arr)
                elif ours == "e_score_correction_bias":
                    state[pre + "mlp.gate.e_score_correction_bias"] = \
                        np.asarray(arr)
                elif ours in inv_ds:
                    state[pre + inv_ds[ours]] = np.asarray(arr)
        vt = p0["vision_tower"]
        D = CFG.v_hidden
        ps = CFG.patch_size
        # timm conv layout (D, 3, P, P); the loader re-flattens it the
        # (P, P, 3) row-major way _siglip_fwd patchifies
        state["vision.patch_embed.proj.weight"] = np.asarray(
            vt["patch_embed"]).reshape(D, ps, ps, 3).transpose(0, 3, 1, 2)
        state["vision.patch_embed.proj.bias"] = np.asarray(
            vt["patch_embed_b"])
        state["vision.pos_embed"] = np.asarray(vt["pos_embed"])[None]
        state["vision.norm.weight"] = np.asarray(vt["post_ln_g"])
        state["vision.norm.bias"] = np.asarray(vt["post_ln_b"])
        vinv = {"ln1_g": "norm1.weight", "ln1_b": "norm1.bias",
                "ln2_g": "norm2.weight", "ln2_b": "norm2.bias",
                "qkv": "attn.qkv.weight", "qkv_b": "attn.qkv.bias",
                "proj": "attn.proj.weight", "proj_b": "attn.proj.bias",
                "fc1": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
                "fc2": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias"}
        for li, vb in enumerate(vt["blocks"]):
            for ours, hf_n in vinv.items():
                state[f"vision.blocks.{li}.{hf_n}"] = np.asarray(vb[ours])
        mp = p0["mm_projector"]
        state["projector.layers.0.weight"] = np.asarray(mp["fc1"])
        state["projector.layers.0.bias"] = np.asarray(mp["fc1_b"])
        state["projector.layers.2.weight"] = np.asarray(mp["fc2"])
        state["projector.layers.2.bias"] = np.asarray(mp["fc2_b"])

        params = deepseek_vl_params_from_state(state, CFG, jnp.float32)
        inputs = _inputs()
        y0 = np.asarray(deepseek_vl.model_fwd(p0, inputs, CFG))
        y1 = np.asarray(deepseek_vl.model_fwd(params, inputs, CFG))
        np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5)
