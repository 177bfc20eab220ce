"""Model-family dispatch: config type → model functions.

Role of the reference's arch detection (``detect_model_type``,
``utils/model.py``; mixin registry ``autoround.py:116``): the orchestrator
and API stay model-agnostic by looking the family up here.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Any, Dict

from . import (deepseek, deepseek_vl, dit, ernie45, gemma3vl, glm4moe,
               glm4vmoe, glmdsa, gptoss, llama, llama4, llava, longcat,
               minimax, mistral3, mixtral, mllama, mmdit, qwen25omni,
               qwen25vl, qwen2vl, qwen3next, qwen3omni, qwen3vlmoe,
               step35)

__all__ = ["get_model_fns", "ALL_PRESETS"]


def get_model_fns(cfg) -> SimpleNamespace:
    """Return the namespace of model functions for a config.

    Every family exposes: init_params, block_fwd, embed_fwd, final_fwd,
    rope_tables, model_fwd, block_linear_names.
    """
    if isinstance(cfg, mmdit.MMDiTConfig):
        return SimpleNamespace(
            init_params=mmdit.init_params,
            block_fwd=mmdit.block_fwd,
            embed_fwd=mmdit.embed_fwd,
            final_fwd=mmdit.final_fwd,
            rope_tables=llama.rope_tables,  # unused by MMDiT blocks
            model_fwd=mmdit.model_fwd,
            block_linear_names=mmdit.block_linear_names,
        )
    if isinstance(cfg, dit.DiTConfig):
        return SimpleNamespace(
            init_params=dit.init_params,
            block_fwd=dit.block_fwd,
            embed_fwd=dit.embed_fwd,
            final_fwd=dit.final_fwd,
            rope_tables=llama.rope_tables,  # unused by DiT blocks
            model_fwd=dit.model_fwd,
            block_linear_names=dit.block_linear_names,
        )
    if isinstance(cfg, qwen3omni.Qwen3OmniConfig):
        return SimpleNamespace(
            init_params=qwen3omni.init_params,
            block_fwd=mixtral.block_fwd,
            embed_fwd=qwen3omni.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=qwen3vlmoe.rope_tables,
            rope_tables_for_inputs=qwen3vlmoe.rope_tables_for_inputs,
            chain_extras=qwen3vlmoe.chain_extras,
            model_fwd=qwen3omni.model_fwd,
            block_linear_names=qwen3omni.block_linear_names,
        )
    if isinstance(cfg, qwen3vlmoe.Qwen3VLMoeConfig):
        return SimpleNamespace(
            init_params=qwen3vlmoe.init_params,
            block_fwd=mixtral.block_fwd,
            embed_fwd=qwen3vlmoe.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=qwen3vlmoe.rope_tables,
            rope_tables_for_inputs=qwen3vlmoe.rope_tables_for_inputs,
            chain_extras=qwen3vlmoe.chain_extras,
            model_fwd=qwen3vlmoe.model_fwd,
            block_linear_names=qwen3vlmoe.block_linear_names,
        )
    if isinstance(cfg, qwen25omni.Qwen25OmniConfig):
        return SimpleNamespace(
            init_params=qwen25omni.init_params,
            block_fwd=llama.block_fwd,
            embed_fwd=qwen25omni.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=qwen25vl.rope_tables,
            rope_tables_for_inputs=qwen25vl.rope_tables_for_inputs,
            model_fwd=qwen25omni.model_fwd,
            block_linear_names=qwen25omni.block_linear_names,
        )
    if isinstance(cfg, qwen25vl.Qwen25VLConfig):
        return SimpleNamespace(
            init_params=qwen25vl.init_params,
            block_fwd=llama.block_fwd,
            embed_fwd=qwen25vl.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=qwen25vl.rope_tables,
            rope_tables_for_inputs=qwen25vl.rope_tables_for_inputs,
            model_fwd=qwen25vl.model_fwd,
            block_linear_names=qwen25vl.block_linear_names,
        )
    if isinstance(cfg, qwen2vl.Qwen2VLConfig):
        return SimpleNamespace(
            init_params=qwen2vl.init_params,
            block_fwd=llama.block_fwd,
            embed_fwd=qwen2vl.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=qwen2vl.rope_tables,
            rope_tables_for_inputs=qwen2vl.rope_tables_for_inputs,
            model_fwd=qwen2vl.model_fwd,
            block_linear_names=qwen2vl.block_linear_names,
        )
    if isinstance(cfg, gemma3vl.Gemma3VLConfig):
        return SimpleNamespace(
            init_params=gemma3vl.init_params,
            block_fwd=llama.block_fwd,
            embed_fwd=gemma3vl.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=gemma3vl.model_fwd,
            block_linear_names=gemma3vl.block_linear_names,
        )
    if isinstance(cfg, mistral3.Mistral3Config):
        return SimpleNamespace(
            init_params=mistral3.init_params,
            block_fwd=llama.block_fwd,
            embed_fwd=mistral3.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=mistral3.model_fwd,
            block_linear_names=mistral3.block_linear_names,
        )
    if isinstance(cfg, llava.LlavaConfig):
        return SimpleNamespace(
            init_params=llava.init_params,
            block_fwd=llama.block_fwd,
            embed_fwd=llava.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=llava.model_fwd,
            block_linear_names=llava.block_linear_names,
        )
    if isinstance(cfg, llama4.Llama4Config):
        return SimpleNamespace(
            init_params=llama4.init_params,
            block_fwd=llama4.block_fwd,
            block_fwd_for=llama4.block_fwd_for,  # rope vs NoPE variants
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=llama4.model_fwd,
            block_linear_names=llama4.block_linear_names,
        )
    if isinstance(cfg, gptoss.GptOssConfig):
        return SimpleNamespace(
            init_params=gptoss.init_params,
            block_fwd=gptoss.block_fwd,
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=gptoss.rope_tables,
            model_fwd=gptoss.model_fwd,
            block_linear_names=gptoss.block_linear_names,
        )
    if isinstance(cfg, glm4vmoe.Glm4vMoeConfig):
        return SimpleNamespace(
            init_params=glm4vmoe.init_params,
            block_fwd=glm4moe.block_fwd,
            embed_fwd=glm4vmoe.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=glm4vmoe.rope_tables,
            rope_tables_for_inputs=glm4vmoe.rope_tables_for_inputs,
            model_fwd=glm4vmoe.model_fwd,
            block_linear_names=glm4vmoe.block_linear_names,
        )
    if isinstance(cfg, glm4moe.Glm4MoeConfig):
        return SimpleNamespace(
            init_params=glm4moe.init_params,
            block_fwd=glm4moe.block_fwd,
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=glm4moe.model_fwd,
            block_linear_names=glm4moe.block_linear_names,
        )
    if isinstance(cfg, mllama.MllamaConfig):
        return SimpleNamespace(
            init_params=mllama.init_params,
            block_fwd=mllama._self_block_fwd,
            block_fwd_for=mllama.block_fwd_for,  # self vs cross blocks
            embed_fwd=mllama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=mllama.model_fwd,
            block_linear_names=mllama.block_linear_names,
        )
    if isinstance(cfg, deepseek_vl.DeepseekVLConfig):
        return SimpleNamespace(
            init_params=deepseek_vl.init_params,
            block_fwd=deepseek.block_fwd,
            embed_fwd=deepseek_vl.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=deepseek.rope_tables,
            model_fwd=deepseek_vl.model_fwd,
            block_linear_names=deepseek_vl.block_linear_names,
        )
    if isinstance(cfg, glmdsa.GlmMoeDsaConfig):
        return SimpleNamespace(
            init_params=glmdsa.init_params,
            block_fwd=glmdsa.block_fwd,
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=deepseek.rope_tables,
            model_fwd=glmdsa.model_fwd,
            block_linear_names=glmdsa.block_linear_names,
        )
    if isinstance(cfg, step35.Step35Config):
        return SimpleNamespace(
            init_params=step35.init_params,
            block_fwd=step35.block_fwd,
            block_fwd_for=step35.block_fwd_for,  # full vs sliding attn
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=step35.model_fwd,
            block_linear_names=step35.block_linear_names,
        )
    if isinstance(cfg, longcat.LongcatConfig):
        return SimpleNamespace(
            init_params=longcat.init_params,
            block_fwd=longcat.block_fwd,
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=deepseek.rope_tables,
            model_fwd=longcat.model_fwd,
            block_linear_names=longcat.block_linear_names,
        )
    if isinstance(cfg, deepseek.DeepseekConfig):
        return SimpleNamespace(
            init_params=deepseek.init_params,
            block_fwd=deepseek.block_fwd,
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=deepseek.rope_tables,
            model_fwd=deepseek.model_fwd,
            block_linear_names=deepseek.block_linear_names,
        )
    if isinstance(cfg, qwen3next.Qwen3NextConfig):
        return SimpleNamespace(
            init_params=qwen3next.init_params,
            block_fwd=qwen3next.block_fwd,
            block_fwd_for=qwen3next.block_fwd_for,  # linear vs full attn
            block_with_cache=qwen3next.block_with_cache,  # hybrid serving
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=qwen3next.model_fwd,
            block_linear_names=qwen3next.block_linear_names,
        )
    if isinstance(cfg, minimax.MiniMaxConfig):
        return SimpleNamespace(
            init_params=minimax.init_params,
            block_fwd=minimax.block_fwd,
            block_fwd_for=minimax.block_fwd_for,  # lightning vs full attn
            block_with_cache=minimax.block_with_cache,  # hybrid serving
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=minimax.model_fwd,
            block_linear_names=minimax.block_linear_names,
        )
    if isinstance(cfg, ernie45.Ernie45Config):
        return SimpleNamespace(
            init_params=ernie45.init_params,
            block_fwd=ernie45.block_fwd,
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=ernie45.model_fwd,
            block_linear_names=ernie45.block_linear_names,
        )
    if isinstance(cfg, mixtral.MixtralConfig):
        return SimpleNamespace(
            init_params=mixtral.init_params,
            block_fwd=mixtral.block_fwd,
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=mixtral.model_fwd,
            block_linear_names=mixtral.block_linear_names,
        )
    if isinstance(cfg, llama.LlamaConfig):
        return SimpleNamespace(
            init_params=llama.init_params,
            block_fwd=llama.block_fwd,
            embed_fwd=llama.embed_fwd,
            final_fwd=llama.final_fwd,
            rope_tables=llama.rope_tables,
            model_fwd=llama.model_fwd,
            block_linear_names=llama.block_linear_names,
        )
    raise TypeError(f"unknown model config type {type(cfg)}")


ALL_PRESETS: Dict[str, Any] = {}
ALL_PRESETS.update(llama.CONFIG_PRESETS)
ALL_PRESETS.update(deepseek.CONFIG_PRESETS)
ALL_PRESETS.update(gptoss.CONFIG_PRESETS)
ALL_PRESETS.update(glm4moe.CONFIG_PRESETS)
ALL_PRESETS.update(llama4.CONFIG_PRESETS)
ALL_PRESETS.update(qwen3next.CONFIG_PRESETS)
ALL_PRESETS.update(minimax.CONFIG_PRESETS)
ALL_PRESETS.update(mixtral.CONFIG_PRESETS)
ALL_PRESETS.update(ernie45.CONFIG_PRESETS)
ALL_PRESETS.update(qwen3vlmoe.CONFIG_PRESETS)
ALL_PRESETS.update(qwen3omni.CONFIG_PRESETS)
ALL_PRESETS.update(longcat.CONFIG_PRESETS)
ALL_PRESETS.update(glmdsa.CONFIG_PRESETS)
ALL_PRESETS.update(step35.CONFIG_PRESETS)
ALL_PRESETS.update(glm4vmoe.CONFIG_PRESETS)
ALL_PRESETS.update(mistral3.CONFIG_PRESETS)
ALL_PRESETS.update(qwen25vl.CONFIG_PRESETS)
ALL_PRESETS.update(qwen25omni.CONFIG_PRESETS)
ALL_PRESETS.update(llava.CONFIG_PRESETS)
ALL_PRESETS.update(qwen2vl.CONFIG_PRESETS)
ALL_PRESETS.update(gemma3vl.CONFIG_PRESETS)
ALL_PRESETS.update(dit.CONFIG_PRESETS)
ALL_PRESETS.update(mmdit.CONFIG_PRESETS)
