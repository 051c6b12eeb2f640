"""KZG MSM accumulators: MSMKZG and the two-channel DualMSM.

Mirrors reference poly/kzg/msm.rs: the verifier folds every commitment check
into two lazy MSMs (left/right); the final identity is
    e(left, [s]_2) * e(-right, [1]_2) == 1          (msm.rs:151-181)
`into_pair` hands the two tuples to the PairingBatcher so an entire
verification session is one multi-Miller loop.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

from ...curves import host as CH
from ...fields.host import FR_MOD
from ...ops import msm as M


@dataclass
class MSMKZG:
    scalars: List[int] = field(default_factory=list)
    bases: List[CH.G1Affine] = field(default_factory=list)

    def append_term(self, scalar: int, point: CH.G1Affine) -> None:
        self.scalars.append(scalar % FR_MOD)
        self.bases.append(point)

    def add_msm(self, other: "MSMKZG") -> None:
        self.scalars.extend(other.scalars)
        self.bases.extend(other.bases)

    def scale(self, factor: int) -> None:
        self.scalars = [s * factor % FR_MOD for s in self.scalars]

    def eval(self) -> CH.G1Affine:
        return M.msm(self.scalars, self.bases)

    def check(self) -> bool:
        return self.eval() is None

    def clone(self) -> "MSMKZG":
        return MSMKZG(list(self.scalars), list(self.bases))


@dataclass
class DualMSM:
    params: object  # ParamsKZG
    left: MSMKZG = field(default_factory=MSMKZG)
    right: MSMKZG = field(default_factory=MSMKZG)

    def scale(self, e: int) -> None:
        self.left.scale(e)
        self.right.scale(e)

    def add_msm(self, other: "DualMSM") -> None:
        self.left.add_msm(other.left)
        self.right.add_msm(other.right)

    def check(self) -> bool:
        left = self.left.eval()
        right = self.right.eval()
        return CH.pairing_check([
            (left, self.params.s_g2),
            (right, CH.g2_neg(self.params.g2)),
        ])

    def into_pair(self) -> List[Tuple[CH.G1Affine, CH.G2Affine]]:
        left = self.left.eval()
        right = CH.g1_neg(self.right.eval())
        return [(left, self.params.s_g2), (right, self.params.g2)]
