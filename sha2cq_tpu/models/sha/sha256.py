"""Real SHA-2 compression, generic over the word length.

At word_bits = 32 this is FIPS-180-4 SHA-256 (validated against hashlib in
tests); at smaller word widths it is the same algorithm with rotation/shift
amounts reduced mod the width and constants truncated — the witness oracle
for the CQ circuit at test-scale limb schemes (models/sha/circuit.py).

The reference never built this: sha-reference/ is an xor-model without
schedule or constants (see models/sha/reference.py); this module supplies
the missing real-addition semantics the circuit proves.
"""
from __future__ import annotations

from typing import List, Sequence

# FIPS-180-4 constants
K32 = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]
H32 = [
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
]


def rotr(x: int, n: int, w: int) -> int:
    n %= w
    mask = (1 << w) - 1
    return ((x >> n) | (x << (w - n))) & mask


def big_sigma0(x: int, w: int) -> int:
    return rotr(x, 2, w) ^ rotr(x, 13, w) ^ rotr(x, 22, w)


def big_sigma1(x: int, w: int) -> int:
    return rotr(x, 6, w) ^ rotr(x, 11, w) ^ rotr(x, 25, w)


def small_sigma0(x: int, w: int) -> int:
    return rotr(x, 7, w) ^ rotr(x, 18, w) ^ (x >> (3 % w))


def small_sigma1(x: int, w: int) -> int:
    return rotr(x, 17, w) ^ rotr(x, 19, w) ^ (x >> (10 % w))


def maj(a: int, b: int, c: int) -> int:
    return (a & b) ^ (a & c) ^ (b & c)


def ch(a: int, b: int, c: int) -> int:
    return (a & b) ^ (~a & c)


def k_constants(w: int) -> List[int]:
    mask = (1 << w) - 1
    return [k & mask for k in K32]


def h_constants(w: int) -> List[int]:
    mask = (1 << w) - 1
    return [h & mask for h in H32]


def message_schedule(block_words: Sequence[int], w: int) -> List[int]:
    """W_0..W_63 from the 16 message words."""
    mask = (1 << w) - 1
    W = list(block_words[:16])
    assert len(W) == 16
    for r in range(16, 64):
        W.append((small_sigma1(W[r - 2], w) + W[r - 7]
                  + small_sigma0(W[r - 15], w) + W[r - 16]) & mask)
    return W


def compress(state: Sequence[int], block_words: Sequence[int], w: int,
             rounds: int = 64) -> List[int]:
    """One compression-function application (without the final +state when
    add_state=False callers handle it)."""
    mask = (1 << w) - 1
    K = k_constants(w)
    W = message_schedule(block_words, w)
    a, b, c, d, e, f, g, h = state
    for r in range(rounds):
        t1 = (h + big_sigma1(e, w) + (ch(e, f, g) & mask) + K[r] + W[r]) & mask
        t2 = (big_sigma0(a, w) + (maj(a, b, c) & mask)) & mask
        h, g, f = g, f, e
        e = (d + t1) & mask
        d, c, b = c, b, a
        a = (t1 + t2) & mask
    return [a, b, c, d, e, f, g, h]


def sha_compress_final(state: Sequence[int], block_words: Sequence[int], w: int) -> List[int]:
    mask = (1 << w) - 1
    out = compress(state, block_words, w)
    return [(s + o) & mask for s, o in zip(state, out)]


def sha256(message: bytes) -> bytes:
    """Full FIPS SHA-256 over bytes (padding + chaining), built on the
    generic compression at w=32; oracle-checked against hashlib in tests."""
    w = 32
    length = len(message) * 8
    message = bytearray(message)
    message.append(0x80)
    while (len(message) % 64) != 56:
        message.append(0)
    message += length.to_bytes(8, "big")
    state = list(H32)
    for off in range(0, len(message), 64):
        block = message[off:off + 64]
        words = [int.from_bytes(block[i:i + 4], "big") for i in range(0, 64, 4)]
        state = sha_compress_final(state, words, w)
    return b"".join(s.to_bytes(4, "big") for s in state)
