"""Fiat-Shamir transcript, byte-compatible with the reference's Blake2b
transcript (halo2_proofs/src/transcript.rs).

Format:
  - state: Blake2b, 64-byte digest, personalization b"Halo2-Transcript"
  - domain separation prefixes: 0 = challenge squeeze, 1 = point, 2 = scalar
  - points are absorbed as uncompressed x||y canonical reprs (32B LE each) but
    *written to the proof* compressed (32B); scalars absorbed/written as 32B LE
  - squeeze: absorb [0], fork the state, finalize to 64 bytes, reduce mod r
    (Challenge255 / from_bytes_wide semantics, transcript.rs:139-144, 297-309)

The transcript is tiny and inherently sequential, so it is host-side by
design; device code only ever receives the squeezed scalar challenges.
"""
from __future__ import annotations

import hashlib
from typing import List

from ..fields.host import FR_MOD
from ..curves.host import G1Affine
from . import serde

_PREFIX_CHALLENGE = b"\x00"
_PREFIX_POINT = b"\x01"
_PREFIX_SCALAR = b"\x02"


def _new_state() -> "hashlib.blake2b":
    return hashlib.blake2b(digest_size=64, person=b"Halo2-Transcript")


class Blake2bWrite:
    """Prover-side transcript: absorbs and serializes prover messages."""

    def __init__(self) -> None:
        self._state = _new_state()
        self._proof = bytearray()

    # -- common (absorb-only) -------------------------------------------
    def common_point(self, pt: G1Affine) -> None:
        # Identity commitments (all-zero encoding) are accepted and absorbed
        # as (0, 0).  The reference errors here (transcript.rs coordinates()
        # is None for the identity), which makes degenerate-but-valid proofs
        # impossible (e.g. an identically-zero quotient piece of a tiny
        # circuit, or a zero GWC opening witness); our compressed encoding
        # round-trips the identity as 32 zero bytes, so we permit it.
        self._state.update(_PREFIX_POINT)
        x, y = pt if pt is not None else (0, 0)
        self._state.update(serde.fq_to_bytes(x))
        self._state.update(serde.fq_to_bytes(y))

    def common_scalar(self, s: int) -> None:
        self._state.update(_PREFIX_SCALAR)
        self._state.update(serde.fr_to_bytes(s))

    # -- write (absorb + proof bytes) -----------------------------------
    def write_point(self, pt: G1Affine) -> None:
        self.common_point(pt)
        self._proof += serde.g1_to_bytes(pt)

    def write_scalar(self, s: int) -> None:
        self.common_scalar(s)
        self._proof += serde.fr_to_bytes(s)

    def squeeze_challenge(self) -> int:
        self._state.update(_PREFIX_CHALLENGE)
        digest = self._state.copy().digest()
        # Challenge255: wide reduction, then canonical round-trip
        return serde.fr_from_bytes_wide(digest)

    def finalize(self) -> bytes:
        return bytes(self._proof)


class Blake2bRead:
    """Verifier-side transcript: reads prover messages from proof bytes."""

    def __init__(self, proof: bytes) -> None:
        self._state = _new_state()
        self._proof = proof
        self._pos = 0

    def _take(self, n: int) -> bytes:
        if self._pos + n > len(self._proof):
            raise ValueError("proof too short")
        out = self._proof[self._pos:self._pos + n]
        self._pos += n
        return out

    def common_point(self, pt: G1Affine) -> None:
        # Identity commitments (all-zero encoding) are accepted and absorbed
        # as (0, 0).  The reference errors here (transcript.rs coordinates()
        # is None for the identity), which makes degenerate-but-valid proofs
        # impossible (e.g. an identically-zero quotient piece of a tiny
        # circuit, or a zero GWC opening witness); our compressed encoding
        # round-trips the identity as 32 zero bytes, so we permit it.
        self._state.update(_PREFIX_POINT)
        x, y = pt if pt is not None else (0, 0)
        self._state.update(serde.fq_to_bytes(x))
        self._state.update(serde.fq_to_bytes(y))

    def common_scalar(self, s: int) -> None:
        self._state.update(_PREFIX_SCALAR)
        self._state.update(serde.fr_to_bytes(s))

    def read_point(self) -> G1Affine:
        pt = serde.g1_from_bytes(self._take(32))
        self.common_point(pt)
        return pt

    def read_scalar(self) -> int:
        s = serde.fr_from_bytes(self._take(32))
        self.common_scalar(s)
        return s

    def read_n_points(self, n: int) -> List[G1Affine]:
        return [self.read_point() for _ in range(n)]

    def read_n_scalars(self, n: int) -> List[int]:
        return [self.read_scalar() for _ in range(n)]

    def squeeze_challenge(self) -> int:
        self._state.update(_PREFIX_CHALLENGE)
        digest = self._state.copy().digest()
        return serde.fr_from_bytes_wide(digest)

    def done(self) -> bool:
        return self._pos == len(self._proof)


# --------------------------- Poseidon transcript -----------------------------
#
# Algebraic (SNARK-friendly) Fiat-Shamir: the reference ships Poseidon as an
# orphan crate and never wires it up (SURVEY "orphan layers"); here it is a
# drop-in transcript pair for recursion work, where a verifier circuit must
# re-derive challenges with a few constraints instead of a Blake2b circuit.
#
# Absorption layout (all Fr elements):
#   point  -> 4 limbs: x_lo, x_hi, y_lo, y_hi (128-bit split of each Fq
#             coordinate; identity = 4 zeros)
#   scalar -> 1 element
# Challenges are chained sponge evaluations
#   chain = Poseidon(chain, n_squeezes, absorbed-since-last-squeeze...)
# so every challenge binds the full history and consecutive squeezes with no
# intervening writes still differ.  Proof BYTES are identical to the Blake2b
# transcripts (compressed points, LE scalars) — only challenge derivation
# changes.

_LIMB = (1 << 128) - 1


class _PoseidonCore:
    def __init__(self) -> None:
        self._chain = 0
        self._buf: List[int] = []
        self._n = 0

    def _absorb_point(self, pt) -> None:
        x, y = pt if pt is not None else (0, 0)
        self._buf += [x & _LIMB, x >> 128, y & _LIMB, y >> 128]

    def _absorb_scalar(self, s: int) -> None:
        self._buf.append(s % FR_MOD)

    def _squeeze(self) -> int:
        from ..poseidon import hash_elements
        self._n += 1
        self._chain = hash_elements([self._chain, self._n] + self._buf)
        self._buf = []
        return self._chain


class PoseidonWrite(_PoseidonCore):
    """Prover transcript with Poseidon challenge derivation."""

    def __init__(self) -> None:
        super().__init__()
        self._proof = bytearray()

    def common_point(self, pt: G1Affine) -> None:
        self._absorb_point(pt)

    def common_scalar(self, s: int) -> None:
        self._absorb_scalar(s)

    def write_point(self, pt: G1Affine) -> None:
        self.common_point(pt)
        self._proof += serde.g1_to_bytes(pt)

    def write_scalar(self, s: int) -> None:
        self.common_scalar(s)
        self._proof += serde.fr_to_bytes(s)

    def squeeze_challenge(self) -> int:
        return self._squeeze()

    def finalize(self) -> bytes:
        return bytes(self._proof)


class PoseidonRead(_PoseidonCore):
    """Verifier transcript with Poseidon challenge derivation."""

    def __init__(self, proof: bytes) -> None:
        super().__init__()
        self._proof = proof
        self._pos = 0

    def _take(self, n: int) -> bytes:
        if self._pos + n > len(self._proof):
            raise ValueError("proof too short")
        out = self._proof[self._pos:self._pos + n]
        self._pos += n
        return out

    def common_point(self, pt: G1Affine) -> None:
        self._absorb_point(pt)

    def common_scalar(self, s: int) -> None:
        self._absorb_scalar(s)

    def read_point(self) -> G1Affine:
        pt = serde.g1_from_bytes(self._take(32))
        self.common_point(pt)
        return pt

    def read_scalar(self) -> int:
        s = serde.fr_from_bytes(self._take(32))
        self.common_scalar(s)
        return s

    def read_n_points(self, n: int) -> List[G1Affine]:
        return [self.read_point() for _ in range(n)]

    def read_n_scalars(self, n: int) -> List[int]:
        return [self.read_scalar() for _ in range(n)]

    def squeeze_challenge(self) -> int:
        return self._squeeze()

    def done(self) -> bool:
        return self._pos == len(self._proof)
