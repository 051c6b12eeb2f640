"""Host-side BN254 group layer: G1, G2, optimal-ate pairing, PairingBatcher.

Capability parity with the reference:
  - G1/G2 affine+Jacobian point arithmetic  (arithmetic/curves/src/bn256/curve.rs,
    derive/curve.rs new_curve_impl!)
  - optimal-ate pairing: multi_miller_loop + final_exponentiation
    (bn256/engine.rs:206-660)
  - PairingBatcher: dedups G2 points and random-linear-combines G1 sides so a
    whole verification reduces to one multi-Miller loop
    (arithmetic/curves/src/batch_pairing.rs:7-95)

This module is the verifier-side oracle.  Group arithmetic the *prover* needs
in bulk (MSM over G1) runs on the TPU (`ops/msm.py`); single-point host ops
here use Python ints (no Montgomery form).
"""
from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

from ..fields import host as F
from ..fields.host import (
    FQ_MOD, FR_MOD, FQ2_ONE, FQ2_ZERO, FQ12_ONE,
    fq2_add, fq2_sub, fq2_mul, fq2_sq, fq2_neg, fq2_inv, fq2_conj, fq2_scalar,
    fq12_mul, fq12_sq, fq12_inv, fq12_conj, fq12_frob, fq12_pow,
    fq6_neg, inv_mod,
)

P = FQ_MOD

# G1: y^2 = x^3 + 3 over Fq; generator (1, 2)
G1_B = 3
G1_GEN = (1, 2)

# G2: y^2 = x^3 + 3/(9+u) over Fq2 (D-type twist); canonical generator
G2_B = fq2_mul((3, 0), fq2_inv((9, 1)))
G2_GEN = (
    (
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    (
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)

# Affine points are (x, y) tuples; the identity is None.
G1Affine = Optional[Tuple[int, int]]
G2Affine = Optional[Tuple[Tuple[int, int], Tuple[int, int]]]


# ------------------------------- G1 ----------------------------------------

def g1_is_on_curve(pt: G1Affine) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - G1_B) % P == 0


def g1_neg(pt: G1Affine) -> G1Affine:
    if pt is None:
        return None
    return (pt[0], (-pt[1]) % P)


def g1_add(a: G1Affine, b: G1Affine) -> G1Affine:
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        # doubling
        lam = (3 * x1 * x1) * inv_mod(2 * y1, P) % P
    else:
        lam = (y2 - y1) * inv_mod(x2 - x1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_double(a: G1Affine) -> G1Affine:
    return g1_add(a, a)


def g1_mul(pt: G1Affine, k: int) -> G1Affine:
    k %= FR_MOD
    result: G1Affine = None
    add = pt
    while k:
        if k & 1:
            result = g1_add(result, add)
        add = g1_add(add, add)
        k >>= 1
    return result


def g1_msm(scalars: Sequence[int], points: Sequence[G1Affine]) -> G1Affine:
    """Naive host MSM — oracle for the TPU Pippenger in ops/msm.py."""
    acc: G1Affine = None
    for s, pt in zip(scalars, points):
        acc = g1_add(acc, g1_mul(pt, s))
    return acc


# ------------------------------- G2 ----------------------------------------

def g2_is_on_curve(pt: G2Affine) -> bool:
    if pt is None:
        return True
    x, y = pt
    lhs = fq2_sq(y)
    rhs = fq2_add(fq2_mul(fq2_sq(x), x), G2_B)
    return lhs == rhs


def g2_neg(pt: G2Affine) -> G2Affine:
    if pt is None:
        return None
    return (pt[0], fq2_neg(pt[1]))


def g2_add(a: G2Affine, b: G2Affine) -> G2Affine:
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if fq2_add(y1, y2) == FQ2_ZERO:
            return None
        lam = fq2_mul(fq2_scalar(fq2_sq(x1), 3), fq2_inv(fq2_scalar(y1, 2)))
    else:
        lam = fq2_mul(fq2_sub(y2, y1), fq2_inv(fq2_sub(x2, x1)))
    x3 = fq2_sub(fq2_sub(fq2_sq(lam), x1), x2)
    y3 = fq2_sub(fq2_mul(lam, fq2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_mul(pt: G2Affine, k: int) -> G2Affine:
    k %= FR_MOD
    result: G2Affine = None
    add = pt
    while k:
        if k & 1:
            result = g2_add(result, add)
        add = g2_add(add, add)
        k >>= 1
    return result


# ----------------------------- pairing --------------------------------------
# Optimal ate pairing (reference bn256/engine.rs).  We untwist G2 into
# E(Fq12): psi(x, y) = (x * w^2, y * w^3) with w the Fq12 generator (w^2 = v,
# v^3 = xi), and run the Miller loop with line functions in Fq12.
# Correct and simple; the verifier only ever runs ONE multi-Miller loop per
# batch (PairingBatcher), so host speed here is acceptable.

# w^2 = v in Fq6 coords: (0, 1, 0); as Fq12: (v_elem, 0)
_W2 = ((FQ2_ZERO, FQ2_ONE, FQ2_ZERO), F.FQ6_ZERO)          # w^2
_W3 = (F.FQ6_ZERO, (FQ2_ZERO, FQ2_ONE, FQ2_ZERO))          # w^3 = v*w

Fq12Point = Optional[Tuple[tuple, tuple]]  # (x, y) in Fq12


def _fq2_to_fq12(a) -> tuple:
    return ((a, FQ2_ZERO, FQ2_ZERO), F.FQ6_ZERO)


def _fq_to_fq12(a: int) -> tuple:
    return (((a % P, 0), FQ2_ZERO, FQ2_ZERO), F.FQ6_ZERO)


def _untwist(q: G2Affine) -> Fq12Point:
    if q is None:
        return None
    x, y = q
    return (fq12_mul(_fq2_to_fq12(x), _W2), fq12_mul(_fq2_to_fq12(y), _W3))


def _fq12_point_neg(pt: Fq12Point) -> Fq12Point:
    if pt is None:
        return None
    return (pt[0], (fq6_neg(pt[1][0]), fq6_neg(pt[1][1])))


def _line(p1: Fq12Point, p2: Fq12Point, xt: tuple, yt: tuple) -> tuple:
    """Evaluate the line through p1, p2 (Fq12 points) at (xt, yt)."""
    x1, y1 = p1
    x2, y2 = p2
    if x1 != x2:
        lam = fq12_mul(F.fq12_sub(y2, y1), fq12_inv(F.fq12_sub(x2, x1)))
        return F.fq12_sub(fq12_mul(lam, F.fq12_sub(xt, x1)), F.fq12_sub(yt, y1))
    if y1 == y2:
        lam = fq12_mul(fq12_mul(_fq_to_fq12(3), fq12_sq(x1)), fq12_inv(fq12_mul(_fq_to_fq12(2), y1)))
        return F.fq12_sub(fq12_mul(lam, F.fq12_sub(xt, x1)), F.fq12_sub(yt, y1))
    return F.fq12_sub(xt, x1)


def _fq12_point_add(a: Fq12Point, b: Fq12Point) -> Fq12Point:
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if F.fq12_add(y1, y2) == F.FQ12_ZERO:
            return None
        lam = fq12_mul(fq12_mul(_fq_to_fq12(3), fq12_sq(x1)), fq12_inv(fq12_mul(_fq_to_fq12(2), y1)))
    else:
        lam = fq12_mul(F.fq12_sub(y2, y1), fq12_inv(F.fq12_sub(x2, x1)))
    x3 = F.fq12_sub(F.fq12_sub(fq12_sq(lam), x1), x2)
    y3 = F.fq12_sub(fq12_mul(lam, F.fq12_sub(x1, x3)), y1)
    return (x3, y3)


def _fq12_frob_point(pt: Fq12Point) -> Fq12Point:
    if pt is None:
        return None
    return (fq12_frob(pt[0], 1), fq12_frob(pt[1], 1))


def miller_loop(p: G1Affine, q: G2Affine) -> tuple:
    """f_{6x+2, Q}(P) with the two Frobenius correction lines (optimal ate)."""
    if p is None or q is None:
        return FQ12_ONE
    qq = _untwist(q)
    xt = _fq_to_fq12(p[0])
    yt = _fq_to_fq12(p[1])
    t = qq
    f = FQ12_ONE
    for i in range(F.ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
        f = fq12_mul(fq12_sq(f), _line(t, t, xt, yt))
        t = _fq12_point_add(t, t)
        if (F.ATE_LOOP_COUNT >> i) & 1:
            f = fq12_mul(f, _line(t, qq, xt, yt))
            t = _fq12_point_add(t, qq)
    # Frobenius corrections: Q1 = pi(Q), Q2 = -pi^2(Q)
    q1 = _fq12_frob_point(qq)
    nq2 = _fq12_point_neg(_fq12_frob_point(q1))
    f = fq12_mul(f, _line(t, q1, xt, yt))
    t = _fq12_point_add(t, q1)
    f = fq12_mul(f, _line(t, nq2, xt, yt))
    return f


def multi_miller_loop(pairs: Iterable[Tuple[G1Affine, G2Affine]]) -> tuple:
    f = FQ12_ONE
    for p, q in pairs:
        if p is None or q is None:
            continue
        f = fq12_mul(f, miller_loop(p, q))
    return f


def final_exponentiation(f: tuple) -> tuple:
    """f^((p^12-1)/r).  Easy part via conjugation/inversion + Frobenius; hard
    part by direct exponentiation (host-side, once per batch)."""
    # easy part: f^(p^6-1) then ^(p^2+1)
    f1 = fq12_mul(fq12_conj(f), fq12_inv(f))
    f2 = fq12_mul(fq12_frob(f1, 2), f1)
    # hard part: f2^((p^4 - p^2 + 1)/r)
    e = (P ** 4 - P ** 2 + 1) // FR_MOD
    return fq12_pow(f2, e)


def pairing(p: G1Affine, q: G2Affine) -> tuple:
    return final_exponentiation(miller_loop(p, q))


def pairing_check(pairs: Sequence[Tuple[G1Affine, G2Affine]]) -> bool:
    """prod e(Pi, Qi) == 1"""
    return final_exponentiation(multi_miller_loop(pairs)) == FQ12_ONE


# --------------------------- PairingBatcher ---------------------------------

class PairingBatcher:
    """Merges many pairing equations prod e(Ai, Bi) = 1 into a minimal
    multi-Miller loop (reference arithmetic/curves/src/batch_pairing.rs:7-95).

    Each `add_pairing` call is one equation.  If the call shares a G2 point
    with anything already batched, the running challenge is bumped and the
    call's G1 sides are all scaled by it (a fresh disjoint equation needs no
    scaling); tuples are then merged by G2 point.
    """

    def __init__(self, challenge: int):
        self.challenge = challenge % FR_MOD
        self.running = 1
        self._g1_by_g2: dict = {}
        self._order: List[G2Affine] = []

    def add_pairing(self, pairs: Sequence[Tuple[G1Affine, G2Affine]]) -> None:
        is_present = any(g2 in self._g1_by_g2 for _, g2 in pairs)
        if is_present:
            self.running = (self.running * self.challenge) % FR_MOD
            pairs = [(g1_mul(g1, self.running), g2) for g1, g2 in pairs]
        for g1, g2 in pairs:
            if g2 in self._g1_by_g2:
                self._g1_by_g2[g2] = g1_add(self._g1_by_g2[g2], g1)
            else:
                self._g1_by_g2[g2] = g1
                self._order.append(g2)

    def finalize(self) -> List[Tuple[G1Affine, G2Affine]]:
        return [(self._g1_by_g2[k], k) for k in self._order]

    def check(self) -> bool:
        return pairing_check(self.finalize())
