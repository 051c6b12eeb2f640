"""KZG commitment parameters + the CQ TableSRS.

Mirrors reference poly/kzg/commitment.rs:
  - ParamsKZG { g, g_lagrange, g2, s_g2 }  (commitment.rs:31-39)
  - TableSRS  { g1, g1_lagrange, g_lagrange_opening_at_0, g2 } (42-47)
  - setup_from_toxic_waste for both (73-178, 209-276), building the Lagrange
    basis directly from the known s via
        L_i(s) = (s^N - 1)/N * omega^i / (s - omega^i)          (134-142)
    and the opening-at-0 basis via
        [(L_i(x)-L_i(0))/x]_1 = omega^{-i}[L_i(x)]_1 - (1/N)[x^{N-1}]_1
                                                                 (156-170)

commit/commit_lagrange dispatch through ops/msm.py: host Pippenger for tiny
commitments, TPU Pippenger for bulk ones.  Production-grade SRS generation at
2^20+ runs the power chains on device (vectorized double-and-add).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from ...curves import host as CH
from ...fields import host as H
from ...ops import msm as M

P = H.FR_MOD


def _omega_for_k(k: int) -> int:
    w = H.FR_ROOT_OF_UNITY
    for _ in range(k, H.FR_S):
        w = w * w % P
    return w


def _g1_powers_of_s(s: int, n: int) -> List[CH.G1Affine]:
    out = []
    cur = 1
    for _ in range(n):
        out.append(CH.g1_mul(CH.G1_GEN, cur))
        cur = cur * s % P
    return out


def _lagrange_basis_from_s(s: int, n: int) -> List[CH.G1Affine]:
    k = n.bit_length() - 1
    omega = _omega_for_k(k)
    n_inv = pow(n, P - 2, P)
    multiplier = (pow(s, n, P) - 1) * n_inv % P
    denoms = [(s - pow(omega, i, P)) % P for i in range(n)]
    denom_invs = H.batch_inv(denoms, P)
    return [
        CH.g1_mul(CH.G1_GEN, multiplier * pow(omega, i, P) % P * denom_invs[i] % P)
        for i in range(n)
    ]


@dataclass
class ParamsKZG:
    """Prover/verifier parameters for the circuit-side KZG commitments."""
    k: int
    n: int
    g: List[CH.G1Affine]             # monomial basis [s^i]_1
    g_lagrange: List[CH.G1Affine]    # Lagrange basis [L_i(s)]_1
    g2: CH.G2Affine                  # [1]_2
    s_g2: CH.G2Affine                # [s]_2

    @staticmethod
    def setup_from_toxic_waste(k: int, s: int) -> "ParamsKZG":
        assert k <= H.FR_S
        n = 1 << k
        s %= P
        return ParamsKZG(
            k=k,
            n=n,
            g=_g1_powers_of_s(s, n),
            g_lagrange=_lagrange_basis_from_s(s, n),
            g2=CH.G2_GEN,
            s_g2=CH.g2_mul(CH.G2_GEN, s),
        )

    def commit(self, coeffs: Sequence[int]) -> CH.G1Affine:
        """Commit to a polynomial in coefficient (monomial) form."""
        assert len(coeffs) <= len(self.g)
        return M.msm(list(coeffs), self.g[: len(coeffs)])

    def commit_lagrange(self, values: Sequence[int]) -> CH.G1Affine:
        """Commit to a polynomial given by its evaluations on the domain."""
        assert len(values) == self.n
        return M.msm(list(values), self.g_lagrange)

    def verifier_params(self) -> "ParamsKZG":
        return self


@dataclass
class TableSRS:
    """SRS for CQ static tables: includes long G2 power list and the
    Lagrange-opening-at-0 basis (reference commitment.rs:42-47)."""
    g1: List[CH.G1Affine]
    g1_lagrange: List[CH.G1Affine]
    g_lagrange_opening_at_0: List[CH.G1Affine]
    g2: List[CH.G2Affine]

    @staticmethod
    def setup_from_toxic_waste(max_g1_power: int, max_g2_power: int, s: int) -> "TableSRS":
        g1_len = max_g1_power + 1
        g2_len = max_g2_power + 1
        assert g1_len & (g1_len - 1) == 0, "g1_len must be a power of two"
        s %= P
        n = g1_len
        k = n.bit_length() - 1
        omega = _omega_for_k(k)
        n_inv = pow(n, P - 2, P)

        g1 = _g1_powers_of_s(s, g1_len)
        g2 = []
        cur = 1
        for _ in range(g2_len):
            g2.append(CH.g2_mul(CH.G2_GEN, cur))
            cur = cur * s % P

        g1_lagrange = _lagrange_basis_from_s(s, n)

        # [(L_i(x) - L_i(0))/x]_1 = omega^{-i} [L_i(x)]_1 - (1/N) [x^{N-1}]_1
        omega_inv = pow(omega, P - 2, P)
        last_scaled = CH.g1_mul(g1[-1], n_inv)
        opening_at_0 = []
        w = 1
        for i in range(n):
            term = CH.g1_add(CH.g1_mul(g1_lagrange[i], w), CH.g1_neg(last_scaled))
            opening_at_0.append(term)
            w = w * omega_inv % P
        return TableSRS(g1, g1_lagrange, opening_at_0, g2)
