"""Fake-quant function registry.

Role of the reference's ``QUANT_FUNC_WITH_DTYPE`` registry + name
resolution (``auto_round/data_type/register.py:16``,
``data_type/utils.py:104-175``): maps a (data_type, bits, sym, mode)
request to a pure qdq function.  Every registered function has the uniform
signature::

    fn(w, *, bits, group_size, v=None, min_scale=None, max_scale=None,
       **extras) -> QdqResult

``mode`` selects the family: "tuned" (AutoRound, accepts v/min/max params),
"rtn" (zero-shot round-to-nearest), "opt_rtn" (imatrix-weighted search).
Resolution tries ``{mode}_{data_type}_{sym}``, then ``{mode}_{data_type}``,
then falls back to the tuned entry (every tuned fn degenerates to RTN when
its tunable params are None — same degeneracy the reference exploits via
``iters=0``).
"""

from __future__ import annotations

from typing import Callable, Dict

from . import fp8, gguf, intq, mxfp, nvfp

__all__ = ["QUANT_FUNCS", "register_dtype", "get_quant_func"]

QUANT_FUNCS: Dict[str, Callable] = {}


def register_dtype(name: str):
    def deco(fn):
        QUANT_FUNCS[name] = fn
        return fn
    return deco


def _reg(name, fn):
    QUANT_FUNCS[name] = fn


# --- int ---
_reg("int_sym", lambda w, bits, group_size, **kw: intq.qdq_int_sym(
    w, bits, group_size,
    v=kw.get("v"), min_scale=kw.get("min_scale"), max_scale=kw.get("max_scale"),
    clip_lo=kw.get("clip_lo", 0.0), clip_hi=kw.get("clip_hi", 1.0)))
_reg("int_asym", lambda w, bits, group_size, **kw: intq.qdq_int_asym(
    w, bits, group_size,
    v=kw.get("v"), min_scale=kw.get("min_scale"), max_scale=kw.get("max_scale"),
    clip_lo=kw.get("clip_lo", 0.0), clip_hi=kw.get("clip_hi", 1.0)))
_reg("rtn_int_sym", lambda w, bits, group_size, **kw: intq.rtn_int_sym(w, bits, group_size))
_reg("rtn_int_asym", lambda w, bits, group_size, **kw: intq.rtn_int_asym(w, bits, group_size))
_reg("opt_rtn_int_sym", lambda w, bits, group_size, **kw: intq.opt_rtn_int_sym(
    w, bits, group_size, imatrix=kw.get("imatrix")))

# --- mx ---
def _mx(mode_rounding_default):
    def make(name):
        def fn(w, bits, group_size, **kw):
            return mxfp.qdq_mx(
                w, data_type=name, group_size=group_size,
                v=kw.get("v"), max_scale=kw.get("max_scale"),
                rounding=kw.get("rounding", mode_rounding_default),
                divisor=kw.get("divisor"))
        return fn
    return make

for _name in ["mx_fp4", "mx_fp6_e2m3", "mx_fp6_e3m2", "mx_fp8", "mx_fp8_e5m2",
              "mx_int2", "mx_int4", "mx_int8"]:
    _reg(_name, _mx("floor")(_name))
    _reg("rtn_" + _name, _mx("rceil")(_name))

for _name in ["mx_fp4", "mx_fp6_e2m3", "mx_fp6_e3m2", "mx_fp8",
              "mx_fp8_e5m2", "mx_int2", "mx_int4", "mx_int8"]:
    _reg("opt_rtn_" + _name,
         (lambda name: lambda w, bits, group_size, **kw: mxfp.opt_rtn_mx(
             w, data_type=name, group_size=group_size,
             imatrix=kw.get("imatrix")))(_name))
_reg("opt_rtn_mx_fp", lambda w, bits, group_size, **kw: mxfp.opt_rtn_mx(
    w, data_type={4: "mx_fp4", 6: "mx_fp6_e2m3", 8: "mx_fp8"}[bits],
    group_size=group_size, imatrix=kw.get("imatrix")))
_reg("opt_rtn_mx_int", lambda w, bits, group_size, **kw: mxfp.opt_rtn_mx(
    w, data_type=f"mx_int{bits}", group_size=group_size,
    imatrix=kw.get("imatrix")))

# generic names resolved by bits: "mx_fp" + bits
_reg("mx_fp", lambda w, bits, group_size, **kw: mxfp.qdq_mx(
    w, data_type={4: "mx_fp4", 6: "mx_fp6_e2m3", 8: "mx_fp8"}[bits],
    group_size=group_size, v=kw.get("v"), max_scale=kw.get("max_scale"),
    rounding=kw.get("rounding", "floor"), divisor=kw.get("divisor")))
_reg("rtn_mx_fp", lambda w, bits, group_size, **kw: mxfp.qdq_mx(
    w, data_type={4: "mx_fp4", 6: "mx_fp6_e2m3", 8: "mx_fp8"}[bits],
    group_size=group_size, rounding=kw.get("rounding", "rceil"),
    divisor=kw.get("divisor")))
_reg("mx_int", lambda w, bits, group_size, **kw: mxfp.qdq_mx(
    w, data_type=f"mx_int{bits}", group_size=group_size,
    v=kw.get("v"), max_scale=kw.get("max_scale"), rounding="floor"))
_reg("rtn_mx_int", lambda w, bits, group_size, **kw: mxfp.qdq_mx(
    w, data_type=f"mx_int{bits}", group_size=group_size, rounding="floor"))

# --- nvfp ---
_reg("nv_fp", lambda w, bits, group_size, **kw: nvfp.qdq_nvfp4(
    w, group_size=group_size, v=kw.get("v"), max_scale=kw.get("max_scale"),
    global_scale=kw.get("global_scale")))
_reg("nv_fp4", QUANT_FUNCS["nv_fp"])
_reg("nv_fp4_with_static_gs", QUANT_FUNCS["nv_fp"])
_reg("rtn_nv_fp", lambda w, bits, group_size, **kw: nvfp.rtn_nvfp4(
    w, group_size=group_size, global_scale=kw.get("global_scale")))
_reg("rtn_nv_fp4", QUANT_FUNCS["rtn_nv_fp"])

# fp4_v2: E2M1 elements with UNSIGNED E5M3 group scales (reference
# ``data_type/nvfp.py:215-236`` fp4_v2 / fp4_v2_with_global_scale)
_reg("fp4_v2", lambda w, bits, group_size, **kw: nvfp.qdq_fp4_v2(
    w, group_size=group_size, v=kw.get("v"), max_scale=kw.get("max_scale"),
    global_scale=kw.get("global_scale")))
_reg("rtn_fp4_v2", lambda w, bits, group_size, **kw: nvfp.qdq_fp4_v2(
    w, group_size=group_size, global_scale=kw.get("global_scale")))
_reg("fp4_v2_with_global_scale",
     lambda w, bits, group_size, **kw: nvfp.qdq_fp4_v2(
         w, group_size=group_size, v=kw.get("v"),
         max_scale=kw.get("max_scale"),
         global_scale=kw.get("global_scale"), use_global_scale=True))
_reg("rtn_fp4_v2_with_global_scale",
     lambda w, bits, group_size, **kw: nvfp.qdq_fp4_v2(
         w, group_size=group_size, global_scale=kw.get("global_scale"),
         use_global_scale=True))

# --- fp8 ---
_reg("fp8", lambda w, bits, group_size, **kw: (
    fp8.qdq_fp8_block(w, block=group_size)
    if isinstance(group_size, tuple)
    else fp8.qdq_fp8_sym(w, group_size=group_size,
                         max_scale=kw.get("max_scale"), scale=kw.get("scale"))))
_reg("fp8_sym", QUANT_FUNCS["fp8"])
_reg("rtn_fp8", QUANT_FUNCS["fp8"])
_reg("fp8_e5m2", lambda w, bits, group_size, **kw: fp8.qdq_fp8_sym(
    w, group_size=group_size, fp8_format="e5m2"))
_reg("block_fp8", lambda w, bits, group_size, **kw: fp8.qdq_fp8_block(
    w, block=group_size if isinstance(group_size, tuple) else (128, 128)))


# --- gguf double-quant (k-quants) ---
def _dq_kw(kw):
    return {k: v for k, v in kw.items()
            if k in ("v", "min_scale", "max_scale", "super_bits",
                     "super_group_size", "imatrix", "clip_lo", "clip_hi")
            and v is not None}

_reg("int_sym_dq", lambda w, bits, group_size, **kw: gguf.qdq_int_dq_sym(
    w, bits, group_size, **_dq_kw(kw)))
_reg("int_asym_dq", lambda w, bits, group_size, **kw: gguf.qdq_int_dq_asym(
    w, bits, group_size, **_dq_kw(kw)))
_reg("rtn_int_sym_dq", lambda w, bits, group_size, **kw: gguf.rtn_int_dq_sym(
    w, bits, group_size, **_dq_kw(kw)))
_reg("rtn_int_asym_dq", lambda w, bits, group_size, **kw: gguf.rtn_int_dq_asym(
    w, bits, group_size, **_dq_kw(kw)))
_reg("opt_rtn_int_sym_dq", QUANT_FUNCS["rtn_int_sym_dq"])
_reg("opt_rtn_int_asym_dq", QUANT_FUNCS["rtn_int_asym_dq"])
# aliases matching the resolver's "{data_type}_{sym}" probe for
# scheme.data_type == "int_dq"
_reg("int_dq_sym", QUANT_FUNCS["int_sym_dq"])
_reg("int_dq_asym", QUANT_FUNCS["int_asym_dq"])
_reg("rtn_int_dq_sym", QUANT_FUNCS["rtn_int_sym_dq"])
_reg("rtn_int_dq_asym", QUANT_FUNCS["rtn_int_asym_dq"])
_reg("opt_rtn_int_dq_sym", QUANT_FUNCS["rtn_int_sym_dq"])
_reg("opt_rtn_int_dq_asym", QUANT_FUNCS["rtn_int_asym_dq"])


def get_quant_func(data_type: str, bits: int, sym: bool, mode: str = "tuned"):
    """Resolve (data_type, bits, sym, mode) → qdq callable.

    Mirrors the reference's prefix/suffix resolution order
    (``data_type/utils.py:104-175``): exact mode-prefixed name first, then
    sym-suffixed, then bits-suffixed, then the tuned entry as fallback.
    """
    prefix = "" if mode == "tuned" else mode + "_"
    suffix = "_sym" if sym else "_asym"
    for name in (
        prefix + data_type + suffix,
        prefix + data_type + str(bits) + suffix,
        prefix + data_type,
        prefix + data_type + str(bits),
        data_type + suffix,
        data_type,
    ):
        if name in QUANT_FUNCS:
            return QUANT_FUNCS[name]
    raise KeyError(
        f"No quant func for data_type={data_type!r} bits={bits} sym={sym} "
        f"mode={mode!r}; registered: {sorted(QUANT_FUNCS)}")
