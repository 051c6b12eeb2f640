"""VerifyingKey / ProvingKey containers (reference plonk.rs:59-75, 291-308).

The VK transcript representation hashes a canonical text description of the
pinned VK with Blake2b personalized "Halo2-Verify-Key", exactly like
plonk.rs:221-232.  Two pinned formats are supported:

- DEFAULT (rust-compatible): a byte-exact replica of Rust's
  `format!("{:?}", vk.pinned())` — the derived/custom Debug output of
  PinnedVerificationKey (plonk.rs:278-287), PinnedEvaluationDomain
  (poly/domain.rs:497-504), PinnedConstraintSystem + PinnedGates + Expression
  (plonk/circuit.rs:1091-1145,1405-1449), Column/Any/Advice/Phase/Rotation,
  permutation::{Argument,VerifyingKey} (plonk/permutation.rs:20-24,81-84)
  and the curve/field Debug formats (curves/src/derive/{field.rs:85-94,
  curve.rs:552-560}).  This makes Fiat-Shamir challenges — and hence entire
  proofs — interoperable with the Rust reference verifier.  Like the
  reference, it does NOT pin static lookups or static table commitments
  (the verifier's pairing identities bind them from its own VK instead).
- SHA2CQ_PINNED_VK=strict: our richer self-consistent format that
  additionally pins static lookup expressions and static table G2
  commitments (stronger circuit binding; not Rust-interoperable).
"""
from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Dict, List

from ..fields.host import FQ_MOD, FR_MOD
from ..utils import serde
from .circuit_ir import ConstraintSystem, StaticTableId
from .static_tables import StaticCommittedTable, StaticTableConfig, StaticTableValues

P = FR_MOD

# MODULUS strings exactly as the reference's field impls publish them
# (curves/src/bn256/{fq.rs:70,fr.rs:36}) — pinned as &'static str Debug
# (i.e. quoted) in PinnedVerificationKey.
FQ_MODULUS_STR = "0x30644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd47"
FR_MODULUS_STR = "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001"


def _fr_dbg(v: int) -> str:
    """Rust Debug of a field element: 0x + 64 lowercase hex digits of the
    canonical (non-Montgomery) big-endian value (derive/field.rs:85-94)."""
    return f"0x{v % P:064x}"


def _g1_dbg(pt) -> str:
    """Rust Debug of G1Affine: `(x, y)` or `Infinity` (derive/curve.rs:552)."""
    if pt is None:
        return "Infinity"
    return f"(0x{pt[0] % FQ_MOD:064x}, 0x{pt[1] % FQ_MOD:064x})"


def _column_dbg(col, advice_phase=None) -> str:
    """Rust Debug of Column<Any>/Column<Advice|Fixed|Instance>: the derived
    struct format with Any/Advice's custom inner Debug that omits the phase
    when it is FirstPhase (circuit.rs:157-165,199-213)."""
    if col.kind == "advice":
        phase = col.phase if advice_phase is None else advice_phase
        inner = "Advice" if phase == 0 else f"Advice {{ phase: Phase({phase}) }}"
    elif col.kind == "fixed":
        inner = "Fixed"
    else:
        inner = "Instance"
    return f"Column {{ index: {col.index}, column_type: {inner} }}"


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
            f"zk_static_lookups={int(getattr(cs, 'zk_static_lookups', False))}",
        ]
        return ";".join(parts)

    # ---- rust-compatible pinned format ------------------------------------

    def _expr_dbg(self, e) -> str:
        """Byte-exact replica of the reference's custom Expression Debug
        (circuit.rs:1091-1145): query enum variants print their query struct
        directly, and an advice query's phase is shown only when it is not
        FirstPhase."""
        k = e.kind
        if k == "const":
            return f"Constant({_fr_dbg(e.value)})"
        if k == "selector":
            # vk hashing always happens post selector->fixed conversion;
            # a surviving virtual selector would not be Rust-comparable
            raise ValueError("selector expression in pinned VK")
        if k == "fixed":
            return (f"Fixed {{ query_index: {e.query_index}, "
                    f"column_index: {e.column.index}, "
                    f"rotation: Rotation({e.rotation}) }}")
        if k == "advice":
            phase = self.cs.advice_column_phase[e.column.index]
            ph = f", phase: Phase({phase})" if phase != 0 else ""
            return (f"Advice {{ query_index: {e.query_index}, "
                    f"column_index: {e.column.index}, "
                    f"rotation: Rotation({e.rotation}){ph} }}")
        if k == "instance":
            return (f"Instance {{ query_index: {e.query_index}, "
                    f"column_index: {e.column.index}, "
                    f"rotation: Rotation({e.rotation}) }}")
        if k == "challenge":
            # ours stores "usable in phase p+1"; Rust pins the sealed phase
            # it was declared after (circuit.rs:1936-1948)
            phase = self.cs.challenge_phase[e.value] - 1
            return (f"Challenge(Challenge {{ index: {e.value}, "
                    f"phase: Phase({phase}) }})")
        if k == "neg":
            return f"Negated({self._expr_dbg(e.a)})"
        if k == "sum":
            return f"Sum({self._expr_dbg(e.a)}, {self._expr_dbg(e.b)})"
        if k == "prod":
            return f"Product({self._expr_dbg(e.a)}, {self._expr_dbg(e.b)})"
        if k == "scaled":
            return f"Scaled({self._expr_dbg(e.a)}, {_fr_dbg(e.value)})"
        raise ValueError(k)

    def _pinned_str_rust(self) -> str:
        """`format!("{:?}", vk.pinned())` byte-for-byte (plonk.rs:226): the
        derived Debug of PinnedVerificationKey over the custom/derived Debugs
        of its members.  Field order, separators, phase-elision and None/Some
        all follow the Rust formatter, so our Fiat-Shamir transcript seeds
        match the reference's for the same circuit."""
        cs = self.cs
        dom = self.domain

        def queries(qs):
            return "[" + ", ".join(
                f"({_column_dbg(c)}, Rotation({r}))" for c, r in qs) + "]"

        gates = "[" + ", ".join(
            self._expr_dbg(p) for g in cs.gates for p in g.polys) + "]"
        cs_fields = [
            f"num_fixed_columns: {cs.num_fixed_columns}",
            f"num_advice_columns: {cs.num_advice_columns}",
            f"num_instance_columns: {cs.num_instance_columns}",
            f"num_selectors: {cs.num_selectors}",
        ]
        if cs.num_challenges > 0:
            cs_fields += [
                f"num_challenges: {cs.num_challenges}",
                "advice_column_phase: [" + ", ".join(
                    f"Phase({p})" for p in cs.advice_column_phase) + "]",
                "challenge_phase: [" + ", ".join(
                    f"Phase({p - 1})" for p in cs.challenge_phase) + "]",
            ]
        lookups = "[" + ", ".join(
            "Argument { input_expressions: [" +
            ", ".join(self._expr_dbg(e) for e in lk.input_expressions) +
            "], table_expressions: [" +
            ", ".join(self._expr_dbg(e) for e in lk.table_expressions) + "] }"
            for lk in cs.lookups) + "]"
        min_deg = ("None" if cs.minimum_degree is None
                   else f"Some({cs.minimum_degree})")
        cs_fields += [
            f"gates: {gates}",
            f"advice_queries: {queries(cs.advice_queries)}",
            f"instance_queries: {queries(cs.instance_queries)}",
            f"fixed_queries: {queries(cs.fixed_queries)}",
            "permutation: Argument { columns: [" + ", ".join(
                _column_dbg(c) for c in cs.permutation.columns) + "] }",
            f"lookups: {lookups}",
            "constants: [" + ", ".join(
                _column_dbg(c) for c in cs.constants) + "]",
            f"minimum_degree: {min_deg}",
        ]
        return (
            "PinnedVerificationKey { "
            f'base_modulus: "{FQ_MODULUS_STR}", '
            f'scalar_modulus: "{FR_MODULUS_STR}", '
            f"domain: PinnedEvaluationDomain {{ k: {dom.k}, "
            f"extended_k: {dom.extended_k}, omega: {_fr_dbg(dom.omega)} }}, "
            "cs: PinnedConstraintSystem { " + ", ".join(cs_fields) + " }, "
            "fixed_commitments: [" + ", ".join(
                _g1_dbg(c) for c in self.fixed_commitments) + "], "
            "permutation: VerifyingKey { commitments: [" + ", ".join(
                _g1_dbg(c) for c in self.permutation_commitments) + "] } }"
        )

    def _compute_transcript_repr(self) -> int:
        h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
        if os.environ.get("SHA2CQ_PINNED_VK") == "strict":
            s = self._pinned_str().encode()
        else:
            s = self._pinned_str_rust().encode()
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
