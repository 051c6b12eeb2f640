"""Loader for the native (C) group kernels in native/fieldops.c.

Compiles the shared library on first use (gcc, -O3) into the repo's build
dir and binds it via ctypes.  Every consumer falls back to the pure-Python
Jacobian path when the toolchain or binary is unavailable, so the native
layer is an accelerator, never a requirement.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "fieldops.c")


def _lib_path() -> str:
    """Binary name keyed by a hash of the C source: a stale build (or a
    checked-in artifact from a clone, where git does not preserve mtimes)
    can never shadow a changed fieldops.c."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, "native", "build", f"libfieldops-{digest}.so")


_LIB = _lib_path()

_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    try:
        subprocess.run(
            ["cc", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.g1_add_jac.argtypes = [ctypes.POINTER(ctypes.c_uint64)] * 3
        lib.g1_scalar_mul.argtypes = [ctypes.POINTER(ctypes.c_uint64)] * 3
        lib.g1_msm.argtypes = [ctypes.POINTER(ctypes.c_uint64),
                               ctypes.POINTER(ctypes.c_uint64),
                               ctypes.c_long,
                               ctypes.POINTER(ctypes.c_uint64)]
        lib.g1_batch_scalar_mul.argtypes = lib.g1_msm.argtypes
        _lib = lib
        return lib
    except OSError:
        return None


# ----------------------------- marshalling ----------------------------------

def _u64s(x: int, n: int = 4) -> List[int]:
    return [(x >> (64 * i)) & ((1 << 64) - 1) for i in range(n)]


def _from_u64s(arr, off: int) -> int:
    v = 0
    for i in range(4):
        v |= int(arr[off + i]) << (64 * i)
    return v


def _pack_jac(points) -> "ctypes.Array":
    """points: list of host Jacobian tuples (X, Y, Z) ints."""
    buf = (ctypes.c_uint64 * (12 * len(points)))()
    for i, (x, y, z) in enumerate(points):
        vals = _u64s(x) + _u64s(y) + _u64s(z)
        for j, v in enumerate(vals):
            buf[12 * i + j] = v
    return buf


def _unpack_jac(buf, i: int = 0):
    return (_from_u64s(buf, 12 * i), _from_u64s(buf, 12 * i + 4),
            _from_u64s(buf, 12 * i + 8))


def native_jac_mul(point_jac, scalar: int):
    """scalar * point (Jacobian in/out); returns None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pin = _pack_jac([point_jac])
    sc = (ctypes.c_uint64 * 4)(*_u64s(scalar))
    out = (ctypes.c_uint64 * 12)()
    lib.g1_scalar_mul(pin, sc, out)
    return _unpack_jac(out)


def native_msm(scalars: List[int], points_jac) -> Optional[tuple]:
    lib = get_lib()
    if lib is None:
        return None
    n = len(scalars)
    pin = _pack_jac(points_jac)
    sc = (ctypes.c_uint64 * (4 * n))()
    for i, s in enumerate(scalars):
        for j, v in enumerate(_u64s(s)):
            sc[4 * i + j] = v
    out = (ctypes.c_uint64 * 12)()
    lib.g1_msm(pin, sc, ctypes.c_long(n), out)
    return _unpack_jac(out)


def native_batch_scalar_mul(points_jac, scalars: List[int]):
    lib = get_lib()
    if lib is None:
        return None
    n = len(scalars)
    pin = _pack_jac(points_jac)
    sc = (ctypes.c_uint64 * (4 * n))()
    for i, s in enumerate(scalars):
        for j, v in enumerate(_u64s(s)):
            sc[4 * i + j] = v
    out = (ctypes.c_uint64 * (12 * n))()
    lib.g1_batch_scalar_mul(pin, sc, ctypes.c_long(n), out)
    return [_unpack_jac(out, i) for i in range(n)]
