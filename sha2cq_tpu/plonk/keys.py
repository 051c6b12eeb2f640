"""VerifyingKey / ProvingKey containers (reference plonk.rs:59-75, 291-308).

The VK transcript representation hashes a canonical text description of the
pinned VK (domain, fixed commitments, permutation commitments, constraint
counts) with Blake2b personalized "Halo2-Verify-Key", exactly like
plonk.rs:221-232 — except the pinned string is our own canonical format
rather than Rust's Debug output (self-consistent across our prover/verifier).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, List

from ..fields.host import FQ_MOD, FR_MOD
from ..utils import serde
from .circuit_ir import ConstraintSystem, StaticTableId
from .static_tables import StaticCommittedTable, StaticTableConfig, StaticTableValues

P = FR_MOD


class VerifyingKey:
    def __init__(self, domain, fixed_commitments, permutation_commitments, cs,
                 selectors, static_table_mapping: Dict[StaticTableId, StaticCommittedTable]):
        self.domain = domain
        self.fixed_commitments = fixed_commitments
        self.permutation_commitments = permutation_commitments
        self.cs: ConstraintSystem = cs
        self.cs_degree = cs.degree()
        self.selectors = selectors
        self.static_table_mapping = static_table_mapping
        self.transcript_repr = self._compute_transcript_repr()

    def _pinned_str(self) -> str:
        parts = [
            f"base_modulus={FQ_MOD:#x}",
            f"scalar_modulus={FR_MOD:#x}",
            f"domain(k={self.domain.k},extended_k={self.domain.extended_k},omega={self.domain.omega:#x})",
            "fixed_commitments=" + ",".join(
                serde.g1_to_bytes(c).hex() for c in self.fixed_commitments),
            "permutation=" + ",".join(
                serde.g1_to_bytes(c).hex() for c in self.permutation_commitments),
            f"cs(fixed={self.cs.num_fixed_columns},advice={self.cs.num_advice_columns},"
            f"instance={self.cs.num_instance_columns},gates={len(self.cs.gates)},"
            f"lookups={len(self.cs.lookups)},static_lookups={len(self.cs.static_lookups)},"
            f"perm_cols={len(self.cs.permutation.columns)},degree={self.cs_degree})",
        ]
        return ";".join(parts)

    def _compute_transcript_repr(self) -> int:
        h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
        s = self._pinned_str().encode()
        h.update(len(s).to_bytes(8, "little"))
        h.update(s)
        return serde.fr_from_bytes_wide(h.digest())

    def hash_into(self, transcript) -> None:
        transcript.common_scalar(self.transcript_repr)


@dataclass
class PermutationProvingKey:
    permutations: List[List[int]]   # sigma polys, Lagrange values
    polys: List[List[int]]          # coeff form
    cosets: List[List[int]]         # extended coset form


@dataclass
class ProvingKey:
    vk: VerifyingKey
    l0: List[int]                    # extended coset
    l_last: List[int]
    l_active_row: List[int]
    fixed_values: List[List[int]]    # Lagrange
    fixed_polys: List[List[int]]     # coeff
    fixed_cosets: List[List[int]]    # extended
    permutation: PermutationProvingKey
    static_table_mapping: Dict[StaticTableId, StaticTableValues]
    static_table_configs: Dict[int, StaticTableConfig]
    b0_g1_bound: List

    def get_vk(self) -> VerifyingKey:
        return self.vk
