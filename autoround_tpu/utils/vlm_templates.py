"""VLM chat-template + processor registry.

Role of the reference's mllm template registry
(``compressors/mllm/template.py:44,81-169`` ``Template`` +
``_register_template`` per model type, and ``mllm/processor.py``
``BasicProcessor``): each VLM family registers how a (text, images)
conversation becomes model inputs — the chat format strings, the image
placeholder convention, how placeholders expand into per-patch token
runs, and how raw images become the tensors the tower consumes.

VLM calibration stops being LLaVA-shaped: ``get_vlm_template(cfg)``
dispatches on the config family, and ``build_calib_inputs`` produces the
{"input_ids", "pixel_values", ...} dict any registered family's
``embed_fwd`` consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["VLMTemplate", "TEMPLATES", "get_vlm_template",
           "build_calib_inputs"]


@dataclass(frozen=True)
class VLMTemplate:
    """One VLM family's prompting + preprocessing contract."""

    model_type: str
    # chat format strings; {content} substitutes the turn text
    format_user: str = "{content}"
    format_assistant: str = "{content}"
    format_system: str = "{content}"
    format_separator: str = "\n"
    default_system: str = ""
    # the PLACEHOLDER users write in text, replaced by the family's
    # actual image-token convention before tokenization
    image_placeholder: str = "<image>"
    # (placeholder expansion, preprocessing) — family callables
    expand_images: Optional[Callable] = None   # (text, cfg, grids) -> text
    preprocess: Optional[Callable] = None      # (images, cfg) -> tensors
    # audio modality (omni/tts families): placeholder users write, its
    # per-frame expansion, and waveform -> feature preprocessing
    audio_placeholder: str = "<audio>"
    expand_audio: Optional[Callable] = None    # (text, cfg, n_frames) -> text
    preprocess_audio: Optional[Callable] = None  # (waves, sr) -> tensors

    def render(self, messages: Sequence[Dict[str, str]]) -> str:
        """messages: [{"role": "user"/"assistant"/"system", "content"}]
        → one prompt string (reference Template._encode)."""
        out = []
        sys_done = False
        for m in messages:
            role, content = m["role"], m["content"]
            if role == "system":
                out.append(self.format_system.format(content=content))
                sys_done = True
            elif role == "user":
                if not sys_done and self.default_system:
                    out.append(self.format_system.format(
                        content=self.default_system))
                    sys_done = True
                out.append(self.format_user.format(content=content))
            elif role == "assistant":
                out.append(self.format_assistant.format(content=content))
        return self.format_separator.join(out)


# ---------------------------------------------------------------- llava
def _llava_expand(text: str, cfg, grids=None) -> str:
    # one run of num_patches image-patch markers per placeholder
    return text.replace("<image>", "<im_patch>" * cfg.num_patches)


def _llava_preprocess(images: List[Any], cfg):
    from .vlm_loader import preprocess_images
    return {"pixel_values": preprocess_images(images, cfg.image_size)}


# -------------------------------------------------------------- qwen2-vl
def _qwen2vl_expand(text: str, cfg, grids: Sequence[Tuple[int, int, int]]
                    ) -> str:
    """Each placeholder becomes <|vision_start|> + one pad token per
    MERGED patch + <|vision_end|> (HF Qwen2VLProcessor semantics)."""
    m2 = cfg.spatial_merge_size ** 2
    out = []
    rest = text
    for t, h, w in grids:
        if "<image>" not in rest:
            break
        pre, rest = rest.split("<image>", 1)
        out.append(pre)
        out.append("<|vision_start|>" + "<|image_pad|>" * (t * h * w // m2)
                   + "<|vision_end|>")
    out.append(rest)
    return "".join(out)


def _qwen2vl_preprocess(images: List[Any], cfg):
    from .vlm_loader import preprocess_qwen2vl_images
    pixels, grids = preprocess_qwen2vl_images(images, cfg)
    return {"pixel_values": pixels, "grid_thw": grids}


# --------------------------------------------------------------- gemma3
def _gemma3_expand(text: str, cfg, grids=None) -> str:
    """Each placeholder becomes <start_of_image> + one soft token per
    pooled patch + <end_of_image> (HF Gemma3Processor full_image_sequence
    semantics; the soft tokens land on cfg.image_token_id)."""
    run = ("<start_of_image>"
           + "<image_soft_token>" * cfg.mm_tokens_per_image
           + "<end_of_image>")
    return text.replace("<image>", "\n\n" + run + "\n\n")


def _gemma3_preprocess(images: List[Any], cfg):
    from .vlm_loader import preprocess_images
    # SigLIP normalization: mean/std 0.5 (preprocess_images' default)
    return {"pixel_values": preprocess_images(images, cfg.image_size)}


# --------------------------------------------------------------- mllama
def _mllama_expand(text: str, cfg, grids=None) -> str:
    """Cross-attention VLM: the TEXT keeps exactly one <|image|> marker
    per image (vision states feed the cross layers, not the embedding
    stream) — no per-patch expansion (HF MllamaProcessor)."""
    return text.replace("<image>", "<|image|>")


def _mllama_preprocess(images: List[Any], cfg):
    from .vlm_loader import preprocess_images
    return {"pixel_values": preprocess_images(images, cfg.image_size)}


# -------------------------------------------------------- deepseek_vl_v2
def _dsvl_expand(text: str, cfg, grids=None) -> str:
    """One soft token per pixel-shuffled patch group (DeepSeek-VL2
    processor: (g/r)² <image> ids per image)."""
    return text.replace("<image>", "<image>" * cfg.num_image_tokens)


def _dsvl_preprocess(images: List[Any], cfg):
    from .vlm_loader import preprocess_images
    return {"pixel_values": preprocess_images(images, cfg.image_size)}


# ------------------------------------------------- mistral3 / pixtral
def _mistral3_expand(text: str, cfg, grids=None) -> str:
    """Pixtral convention: one [IMG] per patch, [IMG_BREAK] at each row
    end, [IMG_END] after the grid (HF PixtralProcessor)."""
    if grids:
        runs = []
        for t, h, w in grids:
            rows = ["[IMG]" * w] * h
            runs.append("[IMG_BREAK]".join(rows) + "[IMG_END]")
        out = text
        for run in runs:
            out = out.replace("<image>", run, 1)
        return out
    return text.replace("<image>", "[IMG]")


# -------------------------------------------------------- glm_image
def _glm_image_expand(text: str, cfg, grids=None) -> str:
    """GLM-4V: image content wrapped in begin/end markers, one token per
    merged patch when the grid is known."""
    n = 1
    if grids:
        n = sum(t * h * w // 4 for t, h, w in grids)
    return text.replace(
        "<image>", "<|begin_of_image|>" + "<|image|>" * n
        + "<|end_of_image|>")


# ------------------------------------------------------ audio families
def _audio_frames(waves, sr: int = 16000):
    from .audio import log_mel_spectrogram
    feats = [log_mel_spectrogram(np.asarray(w, np.float32), sr)
             for w in waves]
    return {"input_features": feats}


def _qwen_audio_expand(text: str, cfg, n_frames=None) -> str:
    """<|audio_bos|> + one pad per ~40 ms output frame + <|audio_eos|>
    (Qwen-Audio: the encoder pools 100 Hz mel frames 4x)."""
    n = max(1, (n_frames or 100) // 4)
    return text.replace("<audio>", "<|audio_bos|>" + "<|AUDIO|>" * n
                        + "<|audio_eos|>")


TEMPLATES: Dict[str, VLMTemplate] = {
    "llava": VLMTemplate(
        model_type="llava",
        format_user="USER: {content}",
        format_assistant="ASSISTANT: {content}",
        format_system="{content}",
        default_system=(
            "A chat between a curious human and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the human's questions."),
        image_placeholder="<image>",
        expand_images=_llava_expand,
        preprocess=_llava_preprocess),
    "qwen2_vl": VLMTemplate(
        model_type="qwen2_vl",
        format_user="<|im_start|>user\n{content}<|im_end|>",
        format_assistant="<|im_start|>assistant\n{content}<|im_end|>",
        format_system="<|im_start|>system\n{content}<|im_end|>",
        format_separator="\n",
        default_system="You are a helpful assistant.",
        image_placeholder="<image>",
        expand_images=_qwen2vl_expand,
        preprocess=_qwen2vl_preprocess),
    "qwen3_vl_moe": VLMTemplate(
        # qwen3-vl shares the qwen chat format and per-patch vision_pad
        # expansion (HF Qwen3VLProcessor)
        model_type="qwen3_vl_moe",
        format_user="<|im_start|>user\n{content}<|im_end|>",
        format_assistant="<|im_start|>assistant\n{content}<|im_end|>",
        format_system="<|im_start|>system\n{content}<|im_end|>",
        format_separator="\n",
        image_placeholder="<image>",
        expand_images=_qwen2vl_expand,
        preprocess=_qwen2vl_preprocess),
    "gemma3": VLMTemplate(
        model_type="gemma3",
        format_user="<start_of_turn>user\n{content}<end_of_turn>",
        format_assistant="<start_of_turn>model\n{content}<end_of_turn>",
        format_system="{content}",
        format_separator="\n",
        image_placeholder="<image>",
        expand_images=_gemma3_expand,
        preprocess=_gemma3_preprocess),
    "mllama": VLMTemplate(
        model_type="mllama",
        format_user=("<|start_header_id|>user<|end_header_id|>\n\n"
                     "{content}<|eot_id|>"),
        format_assistant=("<|start_header_id|>assistant<|end_header_id|>"
                          "\n\n{content}<|eot_id|>"),
        format_system=("<|start_header_id|>system<|end_header_id|>\n\n"
                       "{content}<|eot_id|>"),
        format_separator="",
        image_placeholder="<image>",
        expand_images=_mllama_expand,
        preprocess=_mllama_preprocess),
    "deepseek_vl_v2": VLMTemplate(
        model_type="deepseek_vl_v2",
        format_user="<|User|>: {content}",
        format_assistant="<|Assistant|>: {content}",
        format_system="{content}",
        format_separator="\n\n",
        image_placeholder="<image>",
        expand_images=_dsvl_expand,
        preprocess=_dsvl_preprocess),
    # qwen2.5-vl shares qwen2-vl's processor semantics (reference
    # registers both on PROCESSORS["qwen2_vl"], template.py:120-121)
    "qwen2_5_vl": VLMTemplate(
        model_type="qwen2_5_vl",
        format_user="<|im_start|>user\n{content}<|im_end|>",
        format_assistant="<|im_start|>assistant\n{content}<|im_end|>",
        format_system="<|im_start|>system\n{content}<|im_end|>",
        format_separator="\n",
        default_system="You are a helpful assistant.",
        image_placeholder="<image>",
        expand_images=_qwen2vl_expand,
        preprocess=_qwen2vl_preprocess),
    # omni families: image path = qwen2-vl processor; audio path = the
    # 128-mel Whisper-convention features (utils/audio.py)
    "qwen2_5_omni": VLMTemplate(
        model_type="qwen2_5_omni",
        format_user="<|im_start|>user\n{content}<|im_end|>",
        format_assistant="<|im_start|>assistant\n{content}<|im_end|>",
        format_system="<|im_start|>system\n{content}<|im_end|>",
        format_separator="\n",
        image_placeholder="<image>",
        expand_images=_qwen2vl_expand,
        preprocess=_qwen2vl_preprocess,
        expand_audio=_qwen_audio_expand,
        preprocess_audio=_audio_frames),
    "qwen3_omni_moe": VLMTemplate(
        model_type="qwen3_omni_moe",
        format_user="<|im_start|>user\n{content}<|im_end|>",
        format_assistant="<|im_start|>assistant\n{content}<|im_end|>",
        format_system="<|im_start|>system\n{content}<|im_end|>",
        format_separator="\n",
        image_placeholder="<image>",
        expand_images=_qwen2vl_expand,
        preprocess=_qwen2vl_preprocess,
        expand_audio=_qwen_audio_expand,
        preprocess_audio=_audio_frames),
    "glm_image": VLMTemplate(
        model_type="glm_image",
        format_user="<|user|>\n{content}",
        format_assistant="<|assistant|>\n{content}",
        format_system="<|system|>\n{content}",
        format_separator="\n",
        image_placeholder="<image>",
        expand_images=_glm_image_expand,
        preprocess=_mllama_preprocess),
    "mistral3": VLMTemplate(
        model_type="mistral3",
        format_user="[INST]{content}[/INST]",
        format_assistant="{content}</s>",
        format_system="{content}",
        format_separator="",
        image_placeholder="<image>",
        expand_images=_mistral3_expand,
        preprocess=_mllama_preprocess),
    "mistral3_2": VLMTemplate(
        model_type="mistral3_2",
        format_user="[INST]{content}[/INST]",
        format_assistant="{content}</s>",
        format_system="[SYSTEM_PROMPT]{content}[/SYSTEM_PROMPT]",
        format_separator="",
        image_placeholder="<image>",
        expand_images=_mistral3_expand,
        preprocess=_mllama_preprocess),
    # reference registers these three with all-default format strings
    # (template.py:130-132) — the tokenizer chat template supplies the
    # turn format at runtime; the registry entry carries the modality
    # preprocessing
    "longcat_next": VLMTemplate(
        model_type="longcat_next",
        image_placeholder="<image>",
        expand_images=_llava_expand,
        preprocess=_mllama_preprocess),
    "mimo_audio": VLMTemplate(
        model_type="mimo_audio",
        expand_audio=_qwen_audio_expand,
        preprocess_audio=_audio_frames),
    "qwen3_tts": VLMTemplate(
        model_type="qwen3_tts",
        expand_audio=_qwen_audio_expand,
        preprocess_audio=_audio_frames),
    "default": VLMTemplate(model_type="default"),
}


def get_vlm_template(cfg_or_type) -> VLMTemplate:
    """Dispatch on a model config (family class) or a model-type str."""
    if isinstance(cfg_or_type, str):
        return TEMPLATES.get(cfg_or_type, TEMPLATES["default"])
    from ..models.deepseek_vl import DeepseekVLConfig
    from ..models.gemma3vl import Gemma3VLConfig
    from ..models.llava import LlavaConfig
    from ..models.mllama import MllamaConfig
    from ..models.qwen2vl import Qwen2VLConfig
    from ..models.glm4vmoe import Glm4vMoeConfig
    from ..models.qwen3omni import Qwen3OmniConfig
    from ..models.qwen3vlmoe import Qwen3VLMoeConfig
    if isinstance(cfg_or_type, Glm4vMoeConfig):
        return TEMPLATES["glm_image"]
    if isinstance(cfg_or_type, Qwen3OmniConfig):
        return TEMPLATES["qwen3_omni_moe"]
    if isinstance(cfg_or_type, Qwen3VLMoeConfig):
        return TEMPLATES["qwen3_vl_moe"]
    from ..models.qwen25omni import Qwen25OmniConfig
    from ..models.qwen25vl import Qwen25VLConfig
    if isinstance(cfg_or_type, Qwen25OmniConfig):
        return TEMPLATES["qwen2_5_omni"]
    if isinstance(cfg_or_type, Qwen25VLConfig):
        return TEMPLATES["qwen2_5_vl"]
    if isinstance(cfg_or_type, Qwen2VLConfig):
        return TEMPLATES["qwen2_vl"]
    if isinstance(cfg_or_type, Gemma3VLConfig):
        return TEMPLATES["gemma3"]
    from ..models.mistral3 import Mistral3Config
    if isinstance(cfg_or_type, Mistral3Config):
        return TEMPLATES["mistral3"]
    if isinstance(cfg_or_type, MllamaConfig):
        return TEMPLATES["mllama"]
    if isinstance(cfg_or_type, DeepseekVLConfig):
        return TEMPLATES["deepseek_vl_v2"]
    if isinstance(cfg_or_type, LlavaConfig):
        return TEMPLATES["llava"]
    return TEMPLATES["default"]


def build_calib_inputs(cfg, tokenizer: Callable[[str], List[int]],
                       messages: Sequence[Dict[str, str]],
                       images: List[Any], seqlen: int,
                       image_token_text_map: Optional[Dict[str, int]] = None
                       ) -> Dict[str, Any]:
    """Render one conversation into model inputs via the family template:
    render chat → expand image placeholders → tokenize (placeholder
    token strings map through ``image_token_text_map``, e.g.
    {"<|image_pad|>": cfg.image_token_id}) → attach preprocessed pixel
    tensors.  Real datasets iterate this per sample; synthetic smoke
    paths (get_mllm_calib_batch) bypass it."""
    tpl = get_vlm_template(cfg)
    pre = tpl.preprocess(images, cfg) if tpl.preprocess else {}
    grids = pre.get("grid_thw")
    text = tpl.render(messages)
    if tpl.expand_images:
        text = tpl.expand_images(text, cfg, grids)
    # map image-token text markers onto ids around tokenized text chunks
    tok_map = image_token_text_map or {}
    ids: List[int] = []
    chunks = [text]
    for marker in tok_map:
        nxt = []
        for ch in chunks:
            parts = ch.split(marker)
            for i, p in enumerate(parts):
                if i:
                    nxt.append(marker)
                nxt.append(p)
        chunks = nxt
    for ch in chunks:
        if ch in tok_map:
            ids.append(tok_map[ch])
        elif ch:
            ids.extend(tokenizer(ch))
    ids = ids[:seqlen]
    out = {"input_ids": np.asarray([ids], np.int32)}
    out.update(pre)
    return out
