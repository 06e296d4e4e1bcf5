"""Native (C++) repack acceleration with transparent numpy fallback.

Builds ``librepack.so`` on first use with the baked-in g++ toolchain (no pip;
see repack.cpp header).  ``native_repack()`` returns None when the format
isn't accelerated or the library is unavailable — callers fall back to the
numpy path in quant/repack.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "repack.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False


def _build_dir() -> str:
    d = os.environ.get("LGT_NATIVE_BUILD_DIR",
                       os.path.join(_HERE, "_build"))
    os.makedirs(d, exist_ok=True)
    return d


def load_library() -> ctypes.CDLL | None:
    """Build (once) and dlopen the native library; None on failure."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if os.environ.get("LGT_NO_NATIVE"):
            _LIB_FAILED = True
            return None
        so_path = os.path.join(_build_dir(), "librepack.so")
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
                cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                       "-pthread", _SRC, "-o", so_path + ".tmp"]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(so_path + ".tmp", so_path)
            lib = ctypes.CDLL(so_path)
        except (OSError, subprocess.SubprocessError) as e:  # no toolchain etc.
            print(f"[native] repack library unavailable ({e}); using numpy",
                  flush=True)
            _LIB_FAILED = True
            return None
        i64, u8p, i8p, f32p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                               ctypes.POINTER(ctypes.c_int8),
                               ctypes.POINTER(ctypes.c_float))
        lib.repack_q8_0.argtypes = [u8p, i64, i64, i8p, f32p, ctypes.c_int]
        lib.repack_q4_k.argtypes = [u8p, i64, i64, u8p, f32p, u8p, f32p, u8p,
                                    ctypes.c_int, ctypes.c_int]
        lib.repack_q6_k.argtypes = [u8p, i64, i64, i8p, f32p, i8p,
                                    ctypes.c_int, ctypes.c_int]
        _LIB = lib
        return _LIB


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_repack(raw: np.ndarray, fmt: str, out_f: int, in_f: int,
                  n_threads: int | None = None):
    """Returns a quant.repack.RepackedWeight or None (fallback to numpy)."""
    lib = load_library()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = max(1, os.cpu_count() or 1)
    raw = np.ascontiguousarray(raw[: _wire_bytes(fmt, out_f, in_f)])

    from ..quant.repack import RepackedWeight

    if fmt == "q8_0":
        codes = np.empty((out_f, in_f), np.int8)
        d = np.empty((out_f, in_f // 32), np.float32)
        lib.repack_q8_0(_ptr(raw, ctypes.c_uint8), out_f, in_f,
                        _ptr(codes, ctypes.c_int8), _ptr(d, ctypes.c_float),
                        n_threads)
        return RepackedWeight(codes=codes, d=d, sc=None, dmin=None, mn=None,
                              fmt="q8_0", bits=8, sub_size=32, d_size=32,
                              code_bias=0, out_features=out_f, in_features=in_f)
    # Hierarchical formats are always emitted COMPACT (the canonical form
    # quant.repack.rw also produces); the flat device-layout policy is
    # applied downstream by to_quant_linear / runtime.device_upload via the
    # bit-exact flatten_repacked relayout.
    if fmt == "q4_k":
        nd = in_f // 256
        codes = np.empty((out_f, in_f // 2), np.uint8)
        d = np.empty((out_f, nd), np.float32)
        dmin = np.empty((out_f, nd), np.float32)
        sc = np.empty((out_f, nd * 8), np.uint8)
        mn = np.empty((out_f, nd * 8), np.uint8)
        lib.repack_q4_k(_ptr(raw, ctypes.c_uint8), out_f, in_f,
                        _ptr(codes, ctypes.c_uint8), _ptr(d, ctypes.c_float),
                        _ptr(sc, ctypes.c_uint8), _ptr(dmin, ctypes.c_float),
                        _ptr(mn, ctypes.c_uint8), n_threads, 1)
        # NOTE: repack_q4_k writes codes in the TRUE (sub=32, dsz=256)
        # block-minor order and sc/mn in (s, σ) order — see repack.cpp.
        return RepackedWeight(codes=codes, d=d, sc=sc, dmin=dmin, mn=mn,
                              fmt="q4_k", bits=4, sub_size=32, d_size=256,
                              code_bias=0, out_features=out_f,
                              in_features=in_f)
    if fmt == "q6_k":
        nd = in_f // 256
        codes = np.empty((out_f, in_f), np.int8)
        d = np.empty((out_f, nd), np.float32)
        sc = np.empty((out_f, nd * 16), np.int8)
        lib.repack_q6_k(_ptr(raw, ctypes.c_uint8), out_f, in_f,
                        _ptr(codes, ctypes.c_int8), _ptr(d, ctypes.c_float),
                        _ptr(sc, ctypes.c_int8), n_threads, 1)
        return RepackedWeight(codes=codes, d=d, sc=sc, dmin=None, mn=None,
                              fmt="q6_k", bits=8, sub_size=16, d_size=256,
                              code_bias=0, out_features=out_f,
                              in_features=in_f)
    return None


def _wire_bytes(fmt: str, out_f: int, in_f: int) -> int:
    per = {"q8_0": (32, 34), "q4_k": (256, 144), "q6_k": (256, 210)}[fmt]
    return out_f * (in_f // per[0]) * per[1]
