"""CQ tables for the real (FIPS-180-4) SHA-256 circuit.

The reference's LongLimbs scheme (sha/src/tables.rs:63-75) would need 2^32
tables for 32-bit words — infeasible to preprocess.  This module instead
exploits GF(2)-linearity of the sigma functions over *halves*:

    Sigma(x) = Sigma(hi << half) XOR Sigma(lo)          (rotations/shifts
                                                         are bit-linear)

so each sigma needs only two 2^{half}-row tables (one per half), emitting
the result byte-by-byte so the remaining hi XOR lo combination runs through
2^{2*piece}-row byte XOR tables.  Bitwise maj/ch use the round-1 symmetric
per-limb tables over a 6-limb word split.  Everything stays <= 2^18 rows
at word_bits=32; the same construction at word_bits=8 gives a seconds-scale
CI instantiation of the identical circuit code.

All tables are emitted as per-column value lists keyed by component name,
ready for StaticTableValues preprocessing.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from . import sha256 as model


@dataclass(frozen=True)
class HalfScheme:
    """Word decomposition parameters, all derived from the word width."""
    word_bits: int

    @property
    def half(self) -> int:
        return self.word_bits // 2

    @property
    def piece(self) -> int:
        """XOR piece width; word = 4 pieces (8-bit bytes at word_bits=32)."""
        return self.word_bits // 4

    @property
    def n_pieces(self) -> int:
        return 4

    @property
    def limb_widths(self) -> List[int]:
        """Six maj/ch limbs, MSB first ([6,6,5,5,5,5] at 32 bits)."""
        base = self.word_bits // 6
        rem = self.word_bits - 6 * base
        return [base + 1] * rem + [base] * (6 - rem)

    @property
    def limb_shifts(self) -> List[int]:
        shifts = []
        pos = self.word_bits
        for w in self.limb_widths:
            pos -= w
            shifts.append(pos)
        return shifts


SCHEME32 = HalfScheme(32)   # FIPS-180-4 SHA-256
SCHEME8 = HalfScheme(8)     # miniature same-shape scheme for fast CI e2e
SCHEME16 = HalfScheme(16)


SIGMA_FNS = {
    "bs0": model.big_sigma0,
    "bs1": model.big_sigma1,
    "ss0": model.small_sigma0,
    "ss1": model.small_sigma1,
}


def _np_sigma(fn_name: str, x: np.ndarray, wb: int) -> np.ndarray:
    """Vectorized sigma over uint64 arrays."""
    mask = np.uint64((1 << wb) - 1)
    bits = np.uint64(wb)

    def rotr(v, n):
        n = np.uint64(n % wb)
        return ((v >> n) | (v << (bits - n))) & mask

    if fn_name == "bs0":
        return rotr(x, 2) ^ rotr(x, 13) ^ rotr(x, 22)
    if fn_name == "bs1":
        return rotr(x, 6) ^ rotr(x, 11) ^ rotr(x, 25)
    if fn_name == "ss0":
        return rotr(x, 7) ^ rotr(x, 18) ^ (x >> np.uint64(3 % wb))
    if fn_name == "ss1":
        return rotr(x, 17) ^ rotr(x, 19) ^ (x >> np.uint64(10 % wb))
    raise ValueError(fn_name)


def sigma_half_columns(s: HalfScheme, fn_name: str, hi: bool) -> Dict[str, List[int]]:
    """Columns for one sigma half-table: {"i": input half, "b0".."b3": pieces
    of sigma(half placed in its word position)}."""
    n = 1 << s.half
    x = np.arange(n, dtype=np.uint64)
    arg = (x << np.uint64(s.half)) if hi else x
    val = _np_sigma(fn_name, arg, s.word_bits)
    pm = np.uint64((1 << s.piece) - 1)
    cols = {"i": x.tolist()}
    for j in range(s.n_pieces):
        cols[f"b{j}"] = ((val >> np.uint64(j * s.piece)) & pm).tolist()
    return cols


def xor_piece_columns(s: HalfScheme) -> Dict[str, List[int]]:
    """(x, y, x^y) over all piece pairs — 2^{2*piece} rows."""
    n = 1 << (2 * s.piece)
    idx = np.arange(n, dtype=np.uint64)
    x = idx >> np.uint64(s.piece)
    y = idx & np.uint64((1 << s.piece) - 1)
    return {"x": x.tolist(), "y": y.tolist(), "z": (x ^ y).tolist()}


def limb_fn_columns(bits: int, fn: str) -> Dict[str, List[int]]:
    """maj/ch over all triples of `bits`-wide limbs — 2^{3*bits} rows."""
    n = 1 << bits
    xs = np.arange(n, dtype=np.uint64)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    X, Y, Z = X.ravel(), Y.ravel(), Z.ravel()
    if fn == "maj":
        f = (X & Y) ^ (X & Z) ^ (Y & Z)
    else:
        f = (X & Y) ^ (~X & Z)
        f &= np.uint64(n - 1)
    return {"x": X.tolist(), "y": Y.tolist(), "z": Z.tolist(), "f": f.tolist()}


def id_columns(bits: int) -> Dict[str, List[int]]:
    """Identity/range table: row i holds value i."""
    return {"i": list(range(1 << bits))}


def build_all_columns(s: HalfScheme) -> Dict[str, Dict[str, List[int]]]:
    """Every table family the circuit needs: name -> {component -> values}."""
    out: Dict[str, Dict[str, List[int]]] = {}
    out["idh"] = id_columns(s.half)
    out["xorp"] = xor_piece_columns(s)
    for fn in SIGMA_FNS:
        out[f"{fn}h"] = sigma_half_columns(s, fn, hi=True)
        out[f"{fn}l"] = sigma_half_columns(s, fn, hi=False)
    for bits in sorted(set(s.limb_widths)):
        out[f"maj{bits}"] = limb_fn_columns(bits, "maj")
        out[f"ch{bits}"] = limb_fn_columns(bits, "ch")
    return out


def all_component_names(s: HalfScheme) -> Dict[str, List[str]]:
    """family -> component names, without materializing any column data
    (build_all_columns costs ~2 s at word_bits=32; configure/synthesize only
    need the names for StaticTableIds)."""
    out: Dict[str, List[str]] = {"idh": ["i"],
                                 "xorp": ["x", "y", "z"]}
    sigma = ["i"] + [f"b{j}" for j in range(s.n_pieces)]
    for fn in SIGMA_FNS:
        out[f"{fn}h"] = list(sigma)
        out[f"{fn}l"] = list(sigma)
    for bits in sorted(set(s.limb_widths)):
        out[f"maj{bits}"] = ["x", "y", "z", "f"]
        out[f"ch{bits}"] = ["x", "y", "z", "f"]
    return out
