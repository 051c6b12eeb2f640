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

    @staticmethod
    def _expr_str(e) -> str:
        """Canonical s-expression of an Expression node, pinning the full gate
        polynomial structure (reference pins Rust Debug of PinnedConstraintSystem,
        plonk.rs:221-258 — our format is self-consistent rather than Debug-equal)."""
        k = e.kind
        if k == "const":
            return f"c{e.value:x}"
        if k == "selector":
            return f"sel{e.value}"
        if k in ("fixed", "advice", "instance"):
            return f"{k[0]}q{e.query_index}[{e.column.index},{e.rotation}]"
        if k == "challenge":
            return f"ch{e.value}"
        if k == "neg":
            return f"(-{VerifyingKey._expr_str(e.a)})"
        if k == "sum":
            return f"(+{VerifyingKey._expr_str(e.a)} {VerifyingKey._expr_str(e.b)})"
        if k == "prod":
            return f"(*{VerifyingKey._expr_str(e.a)} {VerifyingKey._expr_str(e.b)})"
        if k == "scaled":
            return f"(s{e.value:x} {VerifyingKey._expr_str(e.a)})"
        raise ValueError(k)

    def _pinned_str(self) -> str:
        """Canonical text of the *entire* pinned VK: domain, commitments, and the
        full constraint system — every gate polynomial, every query list, every
        lookup / static-lookup expression, and the static-table G2 commitments.
        Two circuits differing in any of these now derive distinct Fiat-Shamir
        challenges (the reference hashes the full pinned CS, plonk.rs pinned())."""
        es = self._expr_str
        cs = self.cs
        q = lambda qs: ",".join(f"({c.index},{r})" for c, r in qs)
        static_tables = []
        for tid in sorted(self.static_table_mapping, key=lambda t: t.name):
            t = self.static_table_mapping[tid]
            static_tables.append(
                f"{tid.name}:size={t.size},zv={serde.g2_to_raw_bytes(t.zv).hex()},"
                f"t={serde.g2_to_raw_bytes(t.t).hex()},"
                f"x_b0={serde.g2_to_raw_bytes(t.x_b0_bound).hex()}")
        parts = [
            f"base_modulus={FQ_MOD:#x}",
            f"scalar_modulus={FR_MOD:#x}",
            f"domain(k={self.domain.k},extended_k={self.domain.extended_k},omega={self.domain.omega:#x})",
            "fixed_commitments=" + ",".join(
                serde.g1_to_bytes(c).hex() for c in self.fixed_commitments),
            "permutation=" + ",".join(
                serde.g1_to_bytes(c).hex() for c in self.permutation_commitments),
            f"cs(fixed={cs.num_fixed_columns},advice={cs.num_advice_columns},"
            f"instance={cs.num_instance_columns},challenges={cs.num_challenges},"
            f"degree={self.cs_degree})",
            "advice_phase=" + ",".join(map(str, cs.advice_column_phase)),
            "challenge_phase=" + ",".join(map(str, cs.challenge_phase)),
            "gates=" + "|".join(
                ",".join(es(p) for p in g.polys) for g in cs.gates),
            "advice_queries=" + q(cs.advice_queries),
            "instance_queries=" + q(cs.instance_queries),
            "fixed_queries=" + q(cs.fixed_queries),
            "perm_cols=" + ",".join(
                f"({c.kind},{c.index})" for c in cs.permutation.columns),
            "lookups=" + "|".join(
                ",".join(es(e) for e in lk.input_expressions) + "->" +
                ",".join(es(e) for e in lk.table_expressions)
                for lk in cs.lookups),
            "static_lookups=" + "|".join(
                ",".join(es(e) for e in sl.input_expressions) + "->" +
                ",".join(t.name for t in sl.table_ids)
                for sl in cs.static_lookups),
            "static_tables=" + "|".join(static_tables),
            f"constants=" + ",".join(f"({c.kind},{c.index})" for c in cs.constants),
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
