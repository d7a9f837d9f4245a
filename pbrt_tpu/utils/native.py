"""Loader for the native runtime library (C++ via ctypes).

Builds runtime/libpbrt_tpu_runtime.so on first use (g++ -O3) and caches it.
The native layer hosts CPU-side framework components that the reference
implements in C++ (BVH build today; schedulers/loaders as they land) —
the Python implementations remain as reference/fallback paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    'runtime',
)
_SO = os.path.join(_DIR, "libpbrt_tpu_runtime.so")
_SOURCES = ["bvh_builder.cpp"]

_lib = None
_tried = False


def _build() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_SO) and os.path.getmtime(_SO) > newest_src:
        return True
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _SO, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        warnings.warn(f"native runtime build failed ({e}); using Python fallback")
        return False


def get_lib():
    """Returns the loaded library or None (Python fallbacks used)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.pbrt_tpu_build_bvh.restype = ctypes.c_int
    lib.pbrt_tpu_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib
