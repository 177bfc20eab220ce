"""VLM template registry: chat rendering, placeholder expansion,
family dispatch, and end-to-end calib-input construction
(role of reference ``compressors/mllm/template.py`` +
``mllm/processor.py``)."""

import numpy as np
import pytest

from autoround_tpu.models.llava import CONFIG_PRESETS as LLAVA_PRESETS
from autoround_tpu.models.qwen2vl import CONFIG_PRESETS as Q2VL_PRESETS
from autoround_tpu.utils.vlm_templates import (TEMPLATES,
                                               build_calib_inputs,
                                               get_vlm_template)


class TestRegistry:
    def test_dispatch_on_config(self):
        assert get_vlm_template(
            LLAVA_PRESETS["tiny-llava"]).model_type == "llava"
        assert get_vlm_template(
            Q2VL_PRESETS["tiny-qwen2vl"]).model_type == "qwen2_vl"

    def test_dispatch_on_string(self):
        assert get_vlm_template("qwen2_vl").model_type == "qwen2_vl"
        assert get_vlm_template("nope").model_type == "default"

    def test_chat_render_qwen2vl(self):
        tpl = TEMPLATES["qwen2_vl"]
        txt = tpl.render([{"role": "user", "content": "hi <image>"}])
        # default system injected, im_start/im_end framing
        assert txt.startswith("<|im_start|>system\n")
        assert "<|im_start|>user\nhi <image><|im_end|>" in txt

    def test_expand_images_qwen2vl(self):
        cfg = Q2VL_PRESETS["tiny-qwen2vl"]
        tpl = TEMPLATES["qwen2_vl"]
        out = tpl.expand_images("a <image> b", cfg, [(1, 4, 4)])
        n_img = 16 // cfg.spatial_merge_size ** 2
        assert out == ("a <|vision_start|>" + "<|image_pad|>" * n_img
                       + "<|vision_end|> b")

    def test_expand_images_llava(self):
        cfg = LLAVA_PRESETS["tiny-llava"]
        tpl = TEMPLATES["llava"]
        out = tpl.expand_images("x <image>", cfg)
        assert out.count("<im_patch>") == cfg.num_patches


class TestBuildCalibInputs:
    def test_qwen2vl_end_to_end(self):
        cfg = Q2VL_PRESETS["tiny-qwen2vl"]
        ps, m = cfg.patch_size, cfg.spatial_merge_size
        side = ps * m * 2                       # (1, 4, 4) grid
        img = np.random.default_rng(0).uniform(
            0, 1, (side, side, 3)).astype(np.float32)
        # toy tokenizer: bytes mod vocab
        tok = lambda s: [b % cfg.vocab_size for b in s.encode()][:64]
        inputs = build_calib_inputs(
            cfg, tok, [{"role": "user", "content": "what is <image>?"}],
            [img], seqlen=128,
            image_token_text_map={"<|image_pad|>": cfg.image_token_id})
        assert inputs["grid_thw"] == [(1, 4, 4)]
        n_img = 16 // m ** 2
        assert (inputs["input_ids"] == cfg.image_token_id).sum() == n_img
        assert inputs["pixel_values"].shape == (16, cfg.patch_dim)
        # the produced dict feeds the family forward directly
        import jax
        import jax.numpy as jnp
        from autoround_tpu.models import qwen2vl
        params = qwen2vl.init_params(cfg, jax.random.PRNGKey(0))
        out = qwen2vl.model_fwd(params, {
            "input_ids": jnp.asarray(inputs["input_ids"]),
            "pixel_values": jnp.asarray(inputs["pixel_values"]),
            "grid_thw": inputs["grid_thw"]}, cfg)
        assert np.isfinite(np.asarray(out)).all()

    def test_mllm_calib_batch_qwen2vl_quantizes(self):
        import jax
        from autoround_tpu import AutoRound
        from autoround_tpu.quantize.calib_data import get_mllm_calib_batch

        cfg = Q2VL_PRESETS["tiny-qwen2vl"]
        import jax.numpy as jnp
        params = __import__(
            "autoround_tpu.models.qwen2vl", fromlist=["init_params"]
        ).init_params(cfg, jax.random.PRNGKey(0))
        batch, mask = get_mllm_calib_batch(cfg, nsamples=4, seqlen=24)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0,
                        donate_params=False).quantize(batch, mask=mask)
        assert len(res.layers) == cfg.num_layers * 7


class TestRegistryBreadth:
    """All 13 families the reference registers (template.py:120-132)
    resolve, with working modality callables."""

    REF_FAMILIES = ["qwen2_vl", "qwen2_5_vl", "qwen2_5_omni",
                    "qwen3_omni_moe", "glm_image", "mllama",
                    "deepseek_vl_v2", "mistral3", "mistral3_2", "gemma3",
                    "longcat_next", "mimo_audio", "qwen3_tts"]

    def test_all_reference_families_registered(self):
        from autoround_tpu.utils.vlm_templates import get_vlm_template
        for fam in self.REF_FAMILIES:
            tpl = get_vlm_template(fam)
            assert tpl.model_type == fam, fam

    def test_mistral3_pixtral_grid_expansion(self):
        from autoround_tpu.utils.vlm_templates import TEMPLATES
        tpl = TEMPLATES["mistral3"]
        out = tpl.expand_images("see <image> ok", None, [(1, 2, 3)])
        assert out == ("see [IMG][IMG][IMG][IMG_BREAK][IMG][IMG][IMG]"
                       "[IMG_END] ok")

    def test_audio_expansion_and_features(self):
        from autoround_tpu.utils.vlm_templates import TEMPLATES
        tpl = TEMPLATES["qwen2_5_omni"]
        txt = tpl.expand_audio("hear <audio> now", None, 400)
        assert txt.count("<|AUDIO|>") == 100
        assert "<|audio_bos|>" in txt and "<|audio_eos|>" in txt
        # 440 Hz tone: mel energy concentrates at the right bin
        import numpy as np
        from autoround_tpu.utils.audio import (SAMPLE_RATE,
                                               log_mel_spectrogram,
                                               mel_filterbank)
        t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
        tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        feats = tpl.preprocess_audio([tone])["input_features"][0]
        assert feats.shape[1] == 128 and feats.shape[0] > 90
        mean = feats.mean(0)
        peak_mel = int(mean.argmax())
        # which mel bin covers 440 Hz?
        fb = mel_filterbank()
        freqs = np.linspace(0, SAMPLE_RATE / 2, fb.shape[1])
        want = int(np.argmax(fb[:, np.argmin(np.abs(freqs - 440.0))]))
        assert abs(peak_mel - want) <= 1, (peak_mel, want)

    def test_mel_resample_path(self):
        import numpy as np
        from autoround_tpu.utils.audio import log_mel_spectrogram
        wav = np.random.default_rng(0).standard_normal(8000)
        f = log_mel_spectrogram(wav, sample_rate=8000)  # resamples 2x
        assert f.shape[1] == 128 and np.isfinite(f).all()
