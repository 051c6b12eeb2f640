"""Byte encodings for scalars and curve points.

Byte-compatible with the reference (so that proofs serialize identically):
  - scalars: 32-byte little-endian canonical form
    (arithmetic/curves/src/derive/field.rs to_repr/from_repr)
  - G1 compressed: 32-byte LE x-coordinate with the parity of y stored in the
    top bit of the last byte; identity = all zeros
    (arithmetic/curves/src/derive/curve.rs:600-646 GroupEncoding)
  - `from_bytes_wide`: 64 LE bytes reduced mod r (used by Challenge255,
    halo2_proofs/src/transcript.rs:297-309)
"""
from __future__ import annotations

from typing import Optional, Tuple

from ..fields.host import FQ_MOD, FR_MOD, sqrt_mod
from ..curves.host import G1_B, G1Affine


def fr_to_bytes(x: int) -> bytes:
    return (x % FR_MOD).to_bytes(32, "little")


def fr_from_bytes(b: bytes) -> int:
    x = int.from_bytes(b, "little")
    if x >= FR_MOD:
        raise ValueError("non-canonical scalar encoding")
    return x


def fr_from_bytes_wide(b: bytes) -> int:
    assert len(b) == 64
    return int.from_bytes(b, "little") % FR_MOD


def fq_to_bytes(x: int) -> bytes:
    return (x % FQ_MOD).to_bytes(32, "little")


def fq_from_bytes(b: bytes) -> int:
    x = int.from_bytes(b, "little")
    if x >= FQ_MOD:
        raise ValueError("non-canonical base field encoding")
    return x


def g1_to_bytes(pt: G1Affine) -> bytes:
    """Compressed encoding: x LE with y-parity in bit 7 of byte 31."""
    if pt is None:
        return bytes(32)
    x, y = pt
    b = bytearray(fq_to_bytes(x))
    sign = (y & 1) << 7
    b[31] |= sign
    return bytes(b)


def g1_from_bytes(b: bytes) -> G1Affine:
    assert len(b) == 32
    tmp = bytearray(b)
    ysign = tmp[31] >> 7
    tmp[31] &= 0x7F
    x = fq_from_bytes(bytes(tmp))
    if x == 0 and ysign == 0:
        return None
    rhs = (x * x * x + G1_B) % FQ_MOD
    # native x^((q+1)/4) candidate (one C exponentiation) replaces the two
    # Python pows (Legendre + sqrt) of sqrt_mod; non-residues surface as a
    # failed square check
    from ..native_loader import native_fq_sqrt
    y = native_fq_sqrt(rhs)
    if y is not None and y * y % FQ_MOD != rhs:
        y = None
    elif y is None:
        y = sqrt_mod(rhs, FQ_MOD)
    if y is None:
        raise ValueError("invalid point encoding: x not on curve")
    if (y & 1) != ysign:
        y = FQ_MOD - y
    return (x, y)


def g1_to_raw_bytes(pt: G1Affine) -> bytes:
    """Uncompressed x||y (SerdeObject RawBytes format)."""
    if pt is None:
        return bytes(64)
    return fq_to_bytes(pt[0]) + fq_to_bytes(pt[1])


def g1_from_raw_bytes(b: bytes, check: bool = True) -> G1Affine:
    """Uncompressed read.  With check=True (default) the point is validated
    on-curve, like the reference's SerdeObject::read_raw — a corrupted key
    file fails loudly instead of yielding undefined verifier behavior.
    (G1 has cofactor 1 on BN254, so on-curve implies subgroup membership.)"""
    assert len(b) == 64
    x = fq_from_bytes(b[:32])
    y = fq_from_bytes(b[32:])
    if x == 0 and y == 0:
        return None
    pt = (x, y)
    if check:
        from ..curves.host import g1_is_on_curve
        if not g1_is_on_curve(pt):
            raise ValueError("G1 point not on curve")
    return pt


def g2_to_raw_bytes(pt) -> bytes:
    if pt is None:
        return bytes(128)
    (x0, x1), (y0, y1) = pt
    return b"".join(fq_to_bytes(c) for c in (x0, x1, y0, y1))


def g2_from_raw_bytes(b: bytes, check: bool = True, subgroup_check: bool = False):
    """Uncompressed read with optional validation.  check=True validates
    on-curve (cheap, always safe).  subgroup_check=True additionally verifies
    r-torsion membership by scalar multiplication — BN254 G2 has a nontrivial
    cofactor, so an on-curve point may still lie outside the subgroup; keyio
    enables this for the handful of per-key G2 points (not bulk SRS lists)."""
    assert len(b) == 128
    c = [fq_from_bytes(b[i * 32:(i + 1) * 32]) for i in range(4)]
    if all(v == 0 for v in c):
        return None
    pt = ((c[0], c[1]), (c[2], c[3]))
    if check:
        from ..curves.host import g2_is_on_curve
        if not g2_is_on_curve(pt):
            raise ValueError("G2 point not on curve")
    if subgroup_check:
        from ..curves.host import g2_mul
        if g2_mul(pt, FR_MOD) is not None:
            raise ValueError("G2 point not in the r-torsion subgroup")
    return pt


def g2_to_bytes(pt) -> bytes:
    """Compressed G2 (64 B): x.c0 || x.c1 LE with y.c0's parity in bit 7 of
    the last byte — the reference's GroupEncoding convention
    (derive/curve.rs:635-643: sign = y.to_bytes()[0] & 1)."""
    if pt is None:
        return bytes(64)
    (x0, x1), (y0, _y1) = pt
    b = bytearray(fq_to_bytes(x0) + fq_to_bytes(x1))
    b[63] |= (y0 & 1) << 7
    return bytes(b)


def g2_from_bytes(b: bytes):
    """Decompress; raises on x not on curve (mirrors from_bytes,
    derive/curve.rs:606-625)."""
    from ..fields.host import fq2_add, fq2_mul, fq2_neg, fq2_sqrt
    from ..curves.host import G2_B
    assert len(b) == 64
    tmp = bytearray(b)
    ysign = tmp[63] >> 7
    tmp[63] &= 0x7F
    x = (fq_from_bytes(bytes(tmp[:32])), fq_from_bytes(bytes(tmp[32:])))
    if x == (0, 0) and ysign == 0:
        return None
    rhs = fq2_add(fq2_mul(fq2_mul(x, x), x), G2_B)
    y = fq2_sqrt(rhs)
    if y is None:
        raise ValueError("invalid G2 encoding: x not on curve")
    if (y[0] & 1) != ysign:
        y = fq2_neg(y)
    return (x, y)
