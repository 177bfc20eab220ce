"""ctypes bindings for the native packing library (native/arpack.cpp).

Builds ``libarpack.so`` on first use with g++ (cached next to the source);
every entry point has a numpy fallback so the package works without a
toolchain.  ``AR_DISABLE_NATIVE=1`` forces the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .logger import logger, warning_once

__all__ = ["get_lib", "pack_rows", "unpack_rows", "pack_w4_planes_np",
           "native_available"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "arpack.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                   "libarpack.so")


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if not os.path.exists(src):
        return None
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        logger.info("built native packing library: %s", so)
        return so
    except Exception as e:
        warning_once(f"native arpack build failed ({e}); using numpy fallback")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("AR_DISABLE_NATIVE") == "1":
        return None
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    i64, i32p, u8p = ctypes.c_int64, \
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"), \
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.pack_rows_u32.argtypes = [u8p, i64, i64, ctypes.c_int, i32p]
    lib.unpack_rows_u32.argtypes = [i32p, i64, i64, ctypes.c_int, u8p]
    lib.pack_w4_planes.argtypes = [u8p, i64, i64, i64, i32p]
    lib.pack_gptq_qweight.argtypes = [u8p, i64, i64, ctypes.c_int, i32p]
    # self-test before trusting the binary (a stale .so built on another
    # host with -march=native could be subtly wrong or SIGILL later)
    try:
        codes = np.arange(16, dtype=np.uint8).reshape(2, 8) & 0xF
        out = np.empty((2, 1), np.int32)
        lib.pack_rows_u32(np.ascontiguousarray(codes), 2, 8, 4, out)
        back = np.empty((2, 8), np.uint8)
        lib.unpack_rows_u32(out, 2, 8, 4, back)
        if not np.array_equal(back, codes):
            raise RuntimeError("roundtrip mismatch")
    except Exception as e:
        warning_once(f"native arpack self-test failed ({e}); numpy fallback")
        return None
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def pack_rows(codes: np.ndarray, bits: int) -> np.ndarray:
    """Native-accelerated equivalent of export.packing.pack_rows."""
    lib = get_lib()
    if lib is None or bits > 8:
        from ..export.packing import pack_rows as np_pack
        return np_pack(codes, bits)
    N, K = codes.shape
    per = 32 // bits
    words = -(-K // per)
    out = np.empty((N, words), np.int32)
    lib.pack_rows_u32(np.ascontiguousarray(codes, np.uint8), N, K, bits, out)
    return out


def unpack_rows(words: np.ndarray, bits: int, K: int) -> np.ndarray:
    lib = get_lib()
    if lib is None or bits > 8:
        from ..export.packing import unpack_rows as np_unpack
        return np_unpack(words, bits, K)
    N = words.shape[0]
    out = np.empty((N, K), np.uint8)
    lib.unpack_rows_u32(np.ascontiguousarray(words, np.int32), N, K, bits,
                        out)
    return out


def pack_w4_planes_np(codes: np.ndarray, group_size: int = 128) -> np.ndarray:
    """Native nibble-plane pack (serving layout) on host numpy arrays."""
    lib = get_lib()
    O, K = codes.shape
    if lib is None:
        import jax.numpy as jnp
        from ..ops.qmatmul import pack_w4_planes
        return np.asarray(pack_w4_planes(jnp.asarray(codes.astype(np.int32)),
                                         group_size))
    out = np.empty((O, K // 8), np.int32)
    lib.pack_w4_planes(np.ascontiguousarray(codes, np.uint8), O, K,
                       group_size, out)
    return out
