"""Native (C++) components, compiled on demand and loaded via ctypes.

The reference ships its performance-critical host code as C++ DLLs loaded at
runtime (core_api_base.cpp:119-132). Here the native pieces are built from
source on first use with g++ into a content-hashed shared object cached under
the repo's .cache/ (the analog of the reference's per-arch PTX disk cache,
rendercore_optix7/rendercore.cpp:133-160). Everything has a pure-python
fallback, so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_REPO = _HERE.parent.parent
_CACHE = Path(os.environ.get("LH2_NATIVE_CACHE", _REPO / ".cache" / "native"))

_lib = None
_lib_failed = False

_SOURCES = ["bvh_builder.cpp"]


def _build_library() -> Path:
    srcs = [_HERE / s for s in _SOURCES]
    h = hashlib.sha1()
    for s in srcs:
        h.update(s.read_bytes())
    so = _CACHE / f"lh2native_{h.hexdigest()[:12]}.so"
    if so.exists():
        return so
    _CACHE.mkdir(parents=True, exist_ok=True)
    tmp = so.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", str(tmp)] + [str(s) for s in srcs]
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    os.replace(tmp, so)
    return so


def load() -> "ctypes.CDLL | None":
    """Load (building if needed) the native library; None on any failure."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        lib = ctypes.CDLL(str(_build_library()))
        lib.lh2_native_abi_version.restype = ctypes.c_int
        assert lib.lh2_native_abi_version() == 1
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.lh2_build_bvh.restype = ctypes.c_int32
        lib.lh2_build_bvh.argtypes = [
            f32p, f32p, f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            f32p, f32p, i32p, i32p, i32p, i32p, ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def build_sah_bvh_native(v0, v1, v2, max_leaf: int = 4, bins: int = 8):
    """Native twin of builder.build_sah_bvh; returns the same dict or None."""
    lib = load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = v0.shape[0]
    cap = max(2 * t, 2)
    nmin = np.empty((cap, 3), np.float32)
    nmax = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    prim = np.empty(max(t, 1), np.int32)
    n = lib.lh2_build_bvh(v0, v1, v2, t, max_leaf, bins,
                          nmin, nmax, left, right, count, prim, cap)
    if n <= 0:
        return None
    return dict(nmin=nmin[:n].copy(), nmax=nmax[:n].copy(),
                left=left[:n].copy(), right=right[:n].copy(),
                count=count[:n].copy(), prim=prim.copy(),
                n_nodes=int(n), n_prims=t)
