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
        lib.g1_group_ntt.argtypes = [ctypes.POINTER(ctypes.c_uint64),
                                     ctypes.POINTER(ctypes.c_uint64),
                                     ctypes.c_long, ctypes.c_int]
        lib.g2_batch_scalar_mul.argtypes = lib.g1_msm.argtypes
        lib.g2_msm.argtypes = lib.g1_msm.argtypes
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


# ------------------- numpy-fast marshalling (bulk group NTT) -----------------

def _np_u64_limbs(ints, nlimb: int):
    """list of python ints -> (n, nlimb) uint64 array (vectorized)."""
    import numpy as np
    arr = np.array(ints, dtype=object)
    out = np.empty((len(ints), nlimb), dtype=np.uint64)
    mask = (1 << 64) - 1
    for j in range(nlimb):
        out[:, j] = [int(x) for x in ((arr >> (64 * j)) & mask)]
    return out


def _np_from_u64_limbs(arr):
    """(n, nlimb) uint64 -> list of python ints."""
    import numpy as np
    n, nlimb = arr.shape
    acc = np.zeros(n, dtype=object)
    for j in range(nlimb):
        acc |= arr[:, j].astype(object) << (64 * j)
    return [int(x) for x in acc]


def _g2_jac_to_affine(coords: List[int]):
    """u64-decoded (x0,x1,y0,y1,z0,z1) canonical Jacobian -> G2 affine."""
    from .fields.host import FQ_MOD, inv_mod
    x0, x1, y0, y1, z0, z1 = coords
    if z0 == 0 and z1 == 0:
        return None
    p = FQ_MOD
    norm = (z0 * z0 + z1 * z1) % p
    ninv = inv_mod(norm, p)
    iz = (z0 * ninv % p, (-z1) * ninv % p)          # 1/z in Fq2

    def m(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % p, (a[0] * b[1] + a[1] * b[0]) % p)

    iz2 = m(iz, iz)
    iz3 = m(iz2, iz)
    ax = m((x0, x1), iz2)
    ay = m((y0, y1), iz3)
    return (ax, ay)


def _pack_g2_affine(points) -> "ctypes.Array":
    buf = (ctypes.c_uint64 * (24 * len(points)))()
    for i, pt in enumerate(points):
        if pt is None:
            continue  # all zeros = identity (z = 0)
        (x0, x1), (y0, y1) = pt
        vals = _u64s(x0) + _u64s(x1) + _u64s(y0) + _u64s(y1) + _u64s(1) + _u64s(0)
        for j, v in enumerate(vals):
            buf[24 * i + j] = v
    return buf


def _pack_scalars(scalars: List[int]) -> "ctypes.Array":
    sc = (ctypes.c_uint64 * (4 * len(scalars)))()
    for i, s in enumerate(scalars):
        for j, v in enumerate(_u64s(s)):
            sc[4 * i + j] = v
    return sc


def native_g2_batch_scalar_mul(points_affine, scalars: List[int]):
    """out[i] = scalar[i] * point[i] over G2; None when native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(scalars)
    pin = _pack_g2_affine(points_affine)
    out = (ctypes.c_uint64 * (24 * n))()
    lib.g2_batch_scalar_mul(pin, _pack_scalars(scalars), ctypes.c_long(n), out)
    return [_g2_jac_to_affine([_from_u64s(out, 24 * i + 4 * c) for c in range(6)])
            for i in range(n)]


def native_g2_msm(scalars: List[int], points_affine):
    """Pippenger MSM over G2; None when native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(scalars)
    pin = _pack_g2_affine(points_affine)
    out = (ctypes.c_uint64 * 24)()
    lib.g2_msm(pin, _pack_scalars(scalars), ctypes.c_long(n), out)
    return _g2_jac_to_affine([_from_u64s(out, 4 * c) for c in range(6)])


def native_group_ntt(points_jac, twiddles: List[int], k: int):
    """In-place-semantics radix-2 NTT over G1 Jacobian points (canonical
    coords).  points_jac: list of (X, Y, Z) int tuples, len n = 2^k;
    twiddles: [w^0 .. w^{n/2-1}].  Returns transformed list, or None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "g1_group_ntt"):
        return None
    import numpy as np
    n = len(points_jac)
    assert n == 1 << k
    flat = [c for p in points_jac for c in p]
    buf = np.ascontiguousarray(_np_u64_limbs(flat, 4).reshape(n, 12))
    tw = np.ascontiguousarray(_np_u64_limbs(twiddles, 4))
    lib.g1_group_ntt(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                     tw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                     ctypes.c_long(n), ctypes.c_int(k))
    coords = _np_from_u64_limbs(buf.reshape(3 * n, 4))
    return [tuple(coords[3 * i:3 * i + 3]) for i in range(n)]
