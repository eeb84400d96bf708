"""Native (C++) host-side components, loaded via ctypes.

The reference framework's builders/loaders are C++; this package holds the
TPU-native counterparts for host-side hot paths — currently the packet-accel
builder (accel_build.cpp), whose numpy implementation costs ~29 s at 8.4M
triangles while the fused C++ pass runs in ~1 s.

Design: compile-on-first-use into the user cache dir (no pybind11 in this
environment — plain C ABI + ctypes; no compile step at install time). Any
failure (no compiler, read-only cache, ABI drift) silently falls back to the
numpy path: native code is an accelerator here, never a requirement. Output
is bit-identical to numpy (tests/test_native_accel.py) so the fallback is
invisible to everything downstream.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "accel_build.cpp")
_ABI = 1128161  # must match tpu_ray_accel_abi() in accel_build.cpp

_lib = None
_tried = False


def _cache_dir() -> str | None:
    d = os.environ.get(
        "TPU_RAY_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "tpu_ray"))
    return d or None


def accel_lib():
    """The compiled accel-builder library, or None (numpy fallback)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("TPU_RAY_NATIVE", "1") in ("0", "off", "false"):
        return None
    cache = _cache_dir()
    if cache is None or not os.path.exists(_SRC):
        return None
    try:
        src = open(_SRC, "rb").read()
        tag = hashlib.sha1(src + str(_ABI).encode()).hexdigest()[:16]
        so_path = os.path.join(cache, f"accel_build_{tag}.so")
        if not os.path.exists(so_path):
            os.makedirs(cache, exist_ok=True)
            tmp = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17",
                 "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.tpu_ray_accel_abi.restype = ctypes.c_int64
        if int(lib.tpu_ray_accel_abi()) != _ABI:
            return None
        c_i64, c_i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_f64p = ctypes.POINTER(ctypes.c_double)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tpu_ray_accel_build.restype = ctypes.c_int
        lib.tpu_ray_accel_build.argtypes = [
            c_f64p, c_i64, c_i64p, c_i64, c_i64p,
            c_f32p, c_i64, c_f32p, c_i64, c_f32p, c_i64, c_i32p, c_i64]
        _lib = lib
    except Exception as e:  # noqa: BLE001 — any failure means "use numpy"
        print(f"[tpu_ray.native] accel builder unavailable ({e!r}); "
              f"using the numpy path", file=sys.stderr)
        _lib = None
    return _lib
