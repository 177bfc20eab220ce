"""Zero-shot RTN / optimized-RTN layer quantization.

Role of the reference's ``RTNQuantizer`` / ``OptimizedRTNQuantizer``
(``auto_round/algorithms/quantization/rtn/quantizer.py:27-139``): quantize
a layer with no tuning — plain round-to-nearest, or the imatrix-weighted
scale search (``opt_rtn_*`` dtype variants).  Pure functions; the
orchestrator maps them over layers.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from ..dtypes.intq import QdqResult
from ..dtypes.registry import get_quant_func
from ..schemes import QuantizationScheme

__all__ = ["rtn_quantize_layer"]


def rtn_quantize_layer(
    w: jax.Array,
    scheme: QuantizationScheme,
    imatrix: Optional[jax.Array] = None,
    **extras,
) -> QdqResult:
    """Quantize one weight zero-shot.  Uses the opt_rtn variant when an
    imatrix is supplied and one is registered for the dtype (mirrors the
    reference's auto-enable of opt-RTN, ``autoround.py:252``)."""
    mode = "rtn"
    if scheme.super_bits is not None:
        extras.setdefault("super_bits", scheme.super_bits)
        extras.setdefault("super_group_size", scheme.super_group_size)
    if imatrix is not None:
        try:
            fn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym,
                                mode="opt_rtn")
            return fn(w, bits=scheme.bits, group_size=scheme.group_size,
                      imatrix=imatrix, **extras)
        except KeyError:
            pass
    fn = get_quant_func(scheme.data_type, scheme.bits, scheme.sym, mode=mode)
    return fn(w, bits=scheme.bits, group_size=scheme.group_size, **extras)
