"""KZG verification strategies (reference poly/kzg/strategy.rs).

AccumulatorStrategy: random-scales the running DualMSM before each proof's
contributions are folded in, so many proofs share one final pairing check;
`merge_with_pairing_batcher` hands the two-channel check to the global
PairingBatcher (strategy.rs:118-121).  SingleStrategy checks immediately.
"""
from __future__ import annotations

import secrets

from ...curves.host import PairingBatcher
from ...fields.host import FR_MOD
from .msm_accum import DualMSM


class AccumulatorStrategy:
    def __init__(self, params, rng=None):
        self.params = params
        self.msm_accumulator = DualMSM(params)
        self._rng = rng

    def _random_scalar(self) -> int:
        if self._rng is not None:
            return self._rng.randrange(FR_MOD)
        return secrets.randbelow(FR_MOD)

    def process(self, f) -> "AccumulatorStrategy":
        """f: DualMSM -> DualMSM (the verifier fold)."""
        self.msm_accumulator.scale(self._random_scalar())
        self.msm_accumulator = f(self.msm_accumulator)
        return self

    def finalize(self) -> bool:
        return self.msm_accumulator.check()

    def merge_with_pairing_batcher(self, batcher: PairingBatcher) -> None:
        batcher.add_pairing(self.msm_accumulator.into_pair())


class SingleStrategy:
    def __init__(self, params):
        self.params = params
        self.msm = DualMSM(params)

    def process(self, f) -> None:
        msm = f(self.msm)
        if not msm.check():
            raise ValueError("KZG opening check failed")
