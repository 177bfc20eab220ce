"""Pure-JAX fake-quant numeric core (role of reference ``auto_round/data_type/``)."""

from .fp8 import qdq_fp8_block, qdq_fp8_sym
from .grouping import from_groups, to_groups
from .intq import QdqResult, opt_rtn_int_sym, qdq_int_asym, qdq_int_sym
from .mxfp import MX_FORMATS, qdq_mx
from .nvfp import nvfp4_global_scale, qdq_nvfp4
from .registry import QUANT_FUNCS, get_quant_func, register_dtype
from . import extra  # registers w4fp8 / float-zp dtypes
from .ste import cast_ste, ceil_ste, clip_ste, floor_ste, round_ste

__all__ = [
    "QdqResult", "qdq_int_sym", "qdq_int_asym", "opt_rtn_int_sym",
    "qdq_mx", "MX_FORMATS", "qdq_nvfp4", "nvfp4_global_scale",
    "qdq_fp8_sym", "qdq_fp8_block",
    "QUANT_FUNCS", "get_quant_func", "register_dtype",
    "round_ste", "floor_ste", "ceil_ste", "clip_ste", "cast_ste",
    "to_groups", "from_groups",
]
