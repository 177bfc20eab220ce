"""Per-layer quantization plan resolution.

Role of the reference's layer-config resolver
(``auto_round/compressors/layer_config/resolver.py:369``
``resolve_layer_config``): expand the model-wide scheme + user overrides
(exact names, regexes, partial schemes) + an ignore list + the
quant-lm-head flag into a frozen per-layer plan ``{layer_name: scheme}``.

Layer names are ``blocks.<i>.<linear>`` plus ``lm_head`` — the flat
addressing of our functional pytrees.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Optional, Union

from ..schemes import QuantizationScheme, parse_scheme

__all__ = ["resolve_layer_schemes", "handle_special_scheme"]


def handle_special_scheme(scheme, linear_names, quant_lm_head: bool):
    """Expand the special auto-round recipes (reference
    ``_handle_special_schemes``, ``schemes.py:822-888``) into
    (base_scheme, per-layer overrides, effective_quant_lm_head, gguf_base):

      * ``GGUF:Q2_K_MIXED`` — MoE recipe: routed experts tune on the
        Q2_K grid, everything else Q4_K_S, lm_head/embedding Q8_0.
      * ``W4A16_MIXED``     — routed experts int4, the rest int8; the
        lm_head int8 when quant_lm_head.

    Returns None for non-special schemes.
    """
    if not isinstance(scheme, str):
        return None
    s = scheme.lower()
    if s == "gguf:q2_k_mixed":
        overrides = {ln: "GGUF:Q2_K_S" for ln in linear_names
                     if "experts." in ln and "shared" not in ln}
        # lm_head/embedding -> Q8_0 (reference assigns both unconditionally)
        overrides["lm_head"] = QuantizationScheme(
            bits=8, group_size=32, sym=True, data_type="int")
        return "GGUF:Q4_K_S", overrides, True, "GGUF:Q4_K_S"
    if s == "w4a16_mixed":
        overrides = {ln: "W4A16" for ln in linear_names
                     if "experts." in ln and "shared" not in ln}
        return "W8A16", overrides, quant_lm_head, None
    return None


def prune_missing_layers(
    plan: Dict[str, QuantizationScheme], params,
) -> Dict[str, QuantizationScheme]:
    """Drop ``blocks.*`` plan entries whose path doesn't exist in the
    params pytree.  Heterogeneous-block models (DeepSeek: the
    ``first_k_dense`` layers have a dense MLP, the rest have expert
    leaves) enumerate the UNION of linear names per block; entries a
    given block lacks are expected, not errors.  Special names
    (``lm_head``/``embed_tokens``) keep their existing fallback handling.
    """
    from ..utils.pytree import get_by_path
    out = {}
    for n, s in plan.items():
        if n.startswith("blocks."):
            try:
                get_by_path(params, n)
            except (KeyError, IndexError, TypeError, ValueError):
                continue
        out[n] = s
    return out


def resolve_layer_schemes(
    num_layers: int,
    linear_names: Iterable[str],
    scheme: Union[str, QuantizationScheme],
    layer_config: Optional[Dict[str, Union[str, dict, QuantizationScheme]]] = None,
    ignore_layers: Optional[Iterable[str]] = None,
    quant_lm_head: bool = False,
) -> Dict[str, QuantizationScheme]:
    """Build {flat_layer_name: scheme} for every quantizable linear.

    ``layer_config`` keys may be exact flat names (``blocks.3.q_proj``),
    bare linear names applying to all blocks (``down_proj``), or regexes.
    Values may be partial dicts — unset fields inherit the base scheme
    (reference semantics, ``resolver.py:160,253``).
    """
    base = parse_scheme(scheme)
    linear_names = list(linear_names)
    names = [f"blocks.{i}.{ln}" for i in range(num_layers) for ln in linear_names]
    if quant_lm_head:
        names.append("lm_head")

    plan = {n: base for n in names}

    if layer_config:
        for pattern, override in layer_config.items():
            if isinstance(override, (str, QuantizationScheme)):
                ov_scheme = parse_scheme(override)
                merge = False
            else:
                ov_scheme = override
                merge = True
            matched = False
            for n in names:
                if (n == pattern or n.split(".")[-1] == pattern
                        or n.endswith("." + pattern)
                        or re.fullmatch(pattern, n)):
                    matched = True
                    plan[n] = (plan[n].with_overrides(**ov_scheme)
                               if merge else ov_scheme)
            if not matched:
                raise ValueError(
                    f"layer_config pattern {pattern!r} matched no layer")

    if ignore_layers:
        for pattern in ignore_layers:
            for n in list(plan):
                if (n == pattern or n.split(".")[-1] == pattern
                        or n.endswith("." + pattern)
                        or re.fullmatch(pattern, n)):
                    del plan[n]

    # drop unquantized entries
    return {n: s for n, s in plan.items() if s.is_weight_quantized}


def apply_gguf_cascade(
    plan: Dict[str, QuantizationScheme],
    params,
    num_layers: int,
    gguf_name: str,
    quant_lm_head: bool = False,
    pinned: Iterable[str] = (),
    model_cfg=None,
) -> Dict[str, QuantizationScheme]:
    """Rewrite a uniform GGUF plan with the export-time per-layer type
    cascade (reference ``backends/gguf.py:485-617``) so each layer TUNES on
    the exact byte grid the file will store — the tuned d̂/m̂/supers then
    pass through export verbatim instead of being re-quantized onto a
    different grid.  Also applies the 256-divisibility fallback (reference
    ``gen_auto_scheme.py:206-249``): odd-shaped layers drop to Q8_0-grid
    int8 or stay unquantized.
    """
    from ..export.gguf import (BLOCK_ELEMS, GGMLType, QK, select_layer_qtype)
    from ..schemes import PRESET_SCHEMES

    name = gguf_name.split(":", 1)[-1].lower()
    base_map = {"q2_k": GGMLType.Q2_K, "q2_k_s": GGMLType.Q2_K,
                "q3_k": GGMLType.Q3_K, "q3_k_s": GGMLType.Q3_K,
                "q3_k_m": GGMLType.Q3_K, "q4_k": GGMLType.Q4_K,
                "q4_k_s": GGMLType.Q4_K, "q4_k_m": GGMLType.Q4_K,
                "q5_k": GGMLType.Q5_K, "q5_k_s": GGMLType.Q5_K,
                "q5_k_m": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}
    base_t = base_map.get(name)
    if base_t is None:
        return plan  # q4_0/q8_0 etc.: uniform simple formats, no cascade
    mixed = name.endswith("_m")
    n_gqa, n_expert = 1, 0
    if model_cfg is not None:
        nh = getattr(model_cfg, "num_heads", 0)
        nkv = getattr(model_cfg, "num_kv_heads", 0) or nh
        n_gqa = max(1, nh // nkv) if nh else 1
        n_expert = (getattr(model_cfg, "num_experts", 0)
                    or getattr(model_cfg, "n_routed_experts", 0) or 0)
    type2scheme = {GGMLType.Q2_K: PRESET_SCHEMES["GGUF:Q2_K_S"],
                   GGMLType.Q3_K: PRESET_SCHEMES["GGUF:Q3_K_S"],
                   GGMLType.Q4_K: PRESET_SCHEMES["GGUF:Q4_K_S"],
                   GGMLType.Q5_K: PRESET_SCHEMES["GGUF:Q5_K_S"],
                   GGMLType.Q6_K: PRESET_SCHEMES["GGUF:Q6_K"]}
    kind_map = {"q_proj": "attn_q", "k_proj": "attn_k", "v_proj": "attn_v",
                "o_proj": "attn_output", "gate_proj": "ffn_gate",
                "up_proj": "ffn_up", "down_proj": "ffn_down"}

    def shape_of(flat):
        from ..utils.pytree import get_by_path
        return get_by_path(params, flat).shape

    pinned = set(pinned)
    scheme2type = {sch.key(): t for t, sch in type2scheme.items()}

    out: Dict[str, QuantizationScheme] = {}
    for flat, s in plan.items():
        parts = flat.split(".")
        if flat == "lm_head":
            kind, bi = "output", 0
        elif parts[0] == "blocks":
            kind, bi = kind_map.get(parts[-1], "other"), int(parts[1])
        else:
            kind, bi = "other", 0
        try:
            O, I = shape_of(flat if flat != "lm_head" or "lm_head" in params
                            else "embed_tokens")
        except Exception:
            out[flat] = s
            continue
        if flat in pinned or any(flat.endswith("." + p) or flat == p
                                 for p in pinned):
            # recipe-pinned layer (special mixed schemes): keep its type,
            # apply only the 256-divisibility fallback
            t = scheme2type.get(s.key())
            if t is None:
                out[flat] = s
                continue
            if I % BLOCK_ELEMS.get(t, 1):
                t = GGMLType.Q8_0 if I % QK == 0 else None
        elif mixed:
            t = select_layer_qtype(base_t, bi, num_layers, kind, I,
                                   n_gqa=n_gqa, n_expert=n_expert)
        else:
            # match the export writer's non-mixed path exactly:
            # divisibility fallback only
            t = base_t
            if I % BLOCK_ELEMS.get(t, 1):
                t = GGMLType.Q8_0 if I % QK == 0 else None
        if t is None or t == GGMLType.F16:
            continue  # stays FP
        if t == GGMLType.Q8_0:
            out[flat] = QuantizationScheme(bits=8, group_size=32, sym=True,
                                           data_type="int")
        else:
            out[flat] = type2scheme[t]

    # GGUF files quantize the token embedding too (reference marks the
    # Embedding module to-quantize on gguf formats and runs
    # quantize_embedding_layer, quantization/base.py:79-145) — add it to
    # the plan so the orchestrator quantizes it and re-caches the q-chain
    if "embed_tokens" not in out:
        try:
            _, H = shape_of("embed_tokens")
        except Exception:
            H = 0
        if H:
            t = (select_layer_qtype(base_t, 0, num_layers, "token_embd", H)
                 if mixed else base_t)
            if H % BLOCK_ELEMS.get(t, 1):
                t = GGMLType.Q8_0 if H % QK == 0 else GGMLType.F16
            if t == GGMLType.Q8_0:
                out["embed_tokens"] = QuantizationScheme(
                    bits=8, group_size=32, sym=True, data_type="int")
            elif t in type2scheme:
                out["embed_tokens"] = type2scheme[t]
    return out
