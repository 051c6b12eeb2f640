"""CQ table generators for the SHA-256 bitwise ops (reference sha/src/tables.rs).

Tables are quadruples (x, y, z, f(x, y, z)):
  - rot0/rot1: x,y,z are the three limbs of one word; f = ROTR combination
    of the recombined word (rot0 = ROTR2^ROTR13^ROTR22, rot1 = ROTR6^11^25)
  - maj/ch: x,y,z are same-position limbs of three words; f bitwise
  - decomposition: maps a in [0, 2^K) to its word-length-mod limbs

Limb schemes (tables.rs:63-75): ShortLimbs = 16-bit words split 6/5/5,
LongLimbs = 32-bit split 12/10/10, TestLimbs = 8-bit split 4/2/2.

NOTE: the reference's `Bits::BITS_LEN` is 8 for u8/u16/u32 alike
(tables.rs:29-37), so its rotations only permute the low 8 bits — wrong for
Short/Long limbs (only its 8-bit TestLimbs tests exercise it).  We rotate
over the actual word length; the TestLimbs vectors still match the
reference's committed test expectations (tables.rs:156-212).

Table generation is a vectorized numpy sweep (the 2^22-row LongLimbs rot
tables and 2^32 enumeration are batch jobs, not Python loops).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


@dataclass(frozen=True)
class Limbs:
    first: int    # high-limb bit length
    second: int   # middle/low limb bit length

    @property
    def word_len(self) -> int:
        return self.first + 2 * self.second


SHORT_LIMBS = Limbs(6, 5)     # 16-bit words
LONG_LIMBS = Limbs(12, 10)    # 32-bit words
TEST_LIMBS = Limbs(4, 2)      # 8-bit words (reference test scheme)
MINI_LIMBS = Limbs(2, 1)      # 4-bit words (fast e2e circuit tests)


def _xyz_grid(l: Limbs):
    xs = np.arange(1 << l.first, dtype=np.uint64)
    ys = np.arange(1 << l.second, dtype=np.uint64)
    zs = np.arange(1 << l.second, dtype=np.uint64)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    return X.ravel(), Y.ravel(), Z.ravel()


def _combine(l: Limbs, x, y, z):
    return (x << np.uint64(2 * l.second)) | (y << np.uint64(l.second)) | z


def _rotr(l: Limbs, w, n: int):
    bits = np.uint64(l.word_len)
    n = np.uint64(n % l.word_len)
    mask = np.uint64((1 << l.word_len) - 1)
    return ((w >> n) | (w << (bits - n))) & mask


def _to_table(x, y, z, f) -> List[Tuple[int, int, int, int]]:
    return list(zip(x.tolist(), y.tolist(), z.tolist(), f.tolist()))


def create_rotation_table(l: Limbs, r1: int, r2: int, r3: int):
    x, y, z = _xyz_grid(l)
    w = _combine(l, x, y, z)
    f = _rotr(l, w, r1) ^ _rotr(l, w, r2) ^ _rotr(l, w, r3)
    return _to_table(x, y, z, f)


def create_rot0_table(l: Limbs):
    return create_rotation_table(l, 2, 13, 22)


def create_rot1_table(l: Limbs):
    return create_rotation_table(l, 6, 11, 25)


def create_maj_table(l: Limbs):
    x, y, z = _xyz_grid(l)
    return _to_table(x, y, z, (x & y) ^ (x & z) ^ (y & z))


def create_ch_table(l: Limbs):
    x, y, z = _xyz_grid(l)
    return _to_table(x, y, z, (x & y) ^ (~x & z))


def create_ssig_table(l: Limbs, r1: int, r2: int, shr: int):
    """Message-schedule sigma table: ROTR r1 ^ ROTR r2 ^ SHR shr of the
    recombined word.  Beyond reference parity: the reference has no schedule
    tables (its SHA circuit was never finished)."""
    x, y, z = _xyz_grid(l)
    w = _combine(l, x, y, z)
    f = _rotr(l, w, r1) ^ _rotr(l, w, r2) ^ (w >> np.uint64(shr % l.word_len))
    return _to_table(x, y, z, f)


def create_ssig0_table(l: Limbs):
    return create_ssig_table(l, 7, 18, 3)


def create_ssig1_table(l: Limbs):
    return create_ssig_table(l, 17, 19, 10)


def _sym_grid(bits: int):
    xs = np.arange(1 << bits, dtype=np.uint64)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return X.ravel(), Y.ravel(), Z.ravel()


def create_limb_maj_table(bits: int):
    """Per-limb-position majority: all triples of `bits`-wide values.
    (The reference's maj table mixes limb widths 6/5/5 in one row, which
    cannot express same-position limb maj; these symmetric tables can.)"""
    x, y, z = _sym_grid(bits)
    return _to_table(x, y, z, (x & y) ^ (x & z) ^ (y & z))


def create_limb_ch_table(bits: int):
    x, y, z = _sym_grid(bits)
    return _to_table(x, y, z, (x & y) ^ (~x & z))


def create_decomposition_table(l: Limbs, k: int):
    a = np.arange(1 << k, dtype=np.uint64)
    a_mod = a & np.uint64((1 << l.word_len) - 1)
    x = a_mod >> np.uint64(2 * l.second)
    y = (a_mod >> np.uint64(l.second)) & np.uint64((1 << l.second) - 1)
    z = a_mod & np.uint64((1 << l.second) - 1)
    return _to_table(a, x, y, z)
