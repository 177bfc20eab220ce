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

__all__ = ["resolve_layer_schemes"]


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
                        or re.fullmatch(pattern, n)):
                    del plan[n]

    # drop unquantized entries
    return {n: s for n, s in plan.items() if s.is_weight_quantized}
