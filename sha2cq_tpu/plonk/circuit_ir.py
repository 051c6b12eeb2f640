"""PLONKish circuit IR: columns, expressions, ConstraintSystem.

Mirrors reference halo2_proofs/src/plonk/circuit.rs:
  - Column kinds Advice(phase)/Fixed/Instance, Selector (circuit.rs:101-400)
  - Expression tree with degree accounting (687-1026)
  - ConstraintSystem: create_gate, dynamic lookup/lookup_any (1533-1576),
    CQ lookup_static (1579-1602), enable_equality -> permutation argument,
    query-index interning (1604-1660), degree() incl. static lookups
    (1979-2018), blinding_factors (2020-2047), minimum_rows (2049-2059)
  - selector -> fixed conversion (the reference routes this through
    compress_selectors; we convert each selector to its own fixed column,
    which is semantically identical and keeps keygen simple; packing
    optimization can swap in underneath)

The IR is pure Python metadata; *evaluation* of expressions over witness
grids is vectorized on device (plonk/evaluation.py) — the reference's
GraphEvaluator (plonk/evaluation.rs) becomes a jnp expression walker.
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

from ..fields.host import FR_MOD

P = FR_MOD

FIRST_PHASE = 0
SECOND_PHASE = 1
THIRD_PHASE = 2


# ------------------------------- columns ------------------------------------

@dataclass(frozen=True)
class Column:
    index: int
    kind: str            # "advice" | "fixed" | "instance"
    phase: int = 0

    def __repr__(self):
        return f"{self.kind}[{self.index}]@{self.phase}" if self.kind == "advice" else f"{self.kind}[{self.index}]"


@dataclass(frozen=True)
class Selector:
    index: int
    simple: bool = True


@dataclass(frozen=True)
class TableColumn:
    """Fixed column wrapper for dynamic-lookup tables (circuit.rs:368)."""
    inner: Column


@dataclass(frozen=True)
class Challenge:
    index: int
    phase: int


@dataclass(frozen=True)
class StaticTableId:
    """Identifier binding a circuit's static-lookup argument to a registered
    table (plonk/static_lookup.rs:38-45)."""
    name: str


# ------------------------------ expressions ---------------------------------

class Expression:
    """Node in the polynomial-expression AST.  kind in:
    const, selector, fixed, advice, instance, challenge, neg, sum, prod,
    scaled.  Query nodes carry (query_index, column, rotation)."""

    __slots__ = ("kind", "value", "a", "b", "query_index", "column", "rotation")

    def __init__(self, kind, value=None, a=None, b=None, query_index=None,
                 column=None, rotation=None):
        self.kind = kind
        self.value = value
        self.a = a
        self.b = b
        self.query_index = query_index
        self.column = column
        self.rotation = rotation

    # -- constructors
    @staticmethod
    def const(v: int) -> "Expression":
        return Expression("const", value=v % P)

    # -- operators
    def __add__(self, other):
        other = _as_expr(other)
        return Expression("sum", a=self, b=other)

    def __radd__(self, other):
        return _as_expr(other) + self

    def __sub__(self, other):
        return self + (-_as_expr(other))

    def __rsub__(self, other):
        return _as_expr(other) + (-self)

    def __neg__(self):
        return Expression("neg", a=self)

    def __mul__(self, other):
        if isinstance(other, int):
            return Expression("scaled", a=self, value=other % P)
        return Expression("prod", a=self, b=other)

    def __rmul__(self, other):
        return self * other

    def degree(self) -> int:
        k = self.kind
        if k == "const":
            return 0
        if k in ("selector", "fixed", "advice", "instance"):
            return 1
        if k == "challenge":
            return 0
        if k == "neg" or k == "scaled":
            return self.a.degree()
        if k == "sum":
            return max(self.a.degree(), self.b.degree())
        if k == "prod":
            return self.a.degree() + self.b.degree()
        raise ValueError(k)

    def contains_simple_selector(self) -> bool:
        if self.kind == "selector":
            return True
        out = False
        if self.a is not None:
            out |= self.a.contains_simple_selector()
        if self.b is not None:
            out |= self.b.contains_simple_selector()
        return out

    def evaluate(self, ops: dict):
        """Generic fold.  ops maps kind -> callable; query kinds receive the
        expression node itself."""
        k = self.kind
        if k == "const":
            return ops["const"](self.value)
        if k in ("selector", "fixed", "advice", "instance", "challenge"):
            return ops[k](self)
        if k == "neg":
            return ops["neg"](self.a.evaluate(ops))
        if k == "sum":
            return ops["sum"](self.a.evaluate(ops), self.b.evaluate(ops))
        if k == "prod":
            return ops["prod"](self.a.evaluate(ops), self.b.evaluate(ops))
        if k == "scaled":
            return ops["scaled"](self.a.evaluate(ops), self.value)
        raise ValueError(k)

    def evaluate_lazy(self, ops: dict, zero) -> object:
        """Short-circuiting fold (reference plonk/circuit.rs:867-1026
        Expression::evaluate_lazy): a product whose left factor evaluates to
        `zero` skips the right subtree entirely.  Selector-gated gates make
        this the common case on inactive rows — the MockProver's row loop is
        ~deg(gate)x faster on sparse selectors."""
        k = self.kind
        if k == "const":
            return ops["const"](self.value)
        if k in ("selector", "fixed", "advice", "instance", "challenge"):
            return ops[k](self)
        if k == "neg":
            return ops["neg"](self.a.evaluate_lazy(ops, zero))
        if k == "sum":
            return ops["sum"](self.a.evaluate_lazy(ops, zero),
                              self.b.evaluate_lazy(ops, zero))
        if k == "prod":
            left = self.a.evaluate_lazy(ops, zero)
            if left == zero:
                return left
            return ops["prod"](left, self.b.evaluate_lazy(ops, zero))
        if k == "scaled":
            return ops["scaled"](self.a.evaluate_lazy(ops, zero), self.value)
        raise ValueError(k)

    def map_nodes(self, f: Callable[["Expression"], Optional["Expression"]]) -> "Expression":
        """Rebuild the tree, replacing nodes where f returns non-None."""
        r = f(self)
        if r is not None:
            return r
        if self.kind in ("neg", "scaled"):
            return Expression(self.kind, value=self.value, a=self.a.map_nodes(f))
        if self.kind in ("sum", "prod"):
            return Expression(self.kind, a=self.a.map_nodes(f), b=self.b.map_nodes(f))
        return self


def _as_expr(v) -> Expression:
    if isinstance(v, Expression):
        return v
    if isinstance(v, int):
        return Expression.const(v)
    raise TypeError(v)


# ------------------------------ arguments -----------------------------------

@dataclass
class Gate:
    name: str
    polys: List[Expression]


@dataclass
class PermutationArgument:
    """Columns participating in the copy-constraint argument
    (plonk/permutation.rs)."""
    columns: List[Column] = field(default_factory=list)

    def add_column(self, col: Column) -> None:
        if col not in self.columns:
            self.columns.append(col)

    def required_degree(self) -> int:
        # reference permutation.rs:66-87: 2 + chunk_len where columns are
        # chunked so the constraint fits; with chunking by (degree-2) the
        # argument itself needs degree >= 3
        return 3

    def get_chunk_len(self, cs_degree: int) -> int:
        return cs_degree - 2


@dataclass
class LookupArgument:
    """Dynamic (classic halo2) lookup (plonk/lookup.rs)."""
    name: str
    input_expressions: List[Expression]
    table_expressions: List[Expression]

    def required_degree(self) -> int:
        # reference lookup.rs:37-84: max(4, 2 + input_degree + table_degree)
        inp = max((e.degree() for e in self.input_expressions), default=1)
        tab = max((e.degree() for e in self.table_expressions), default=1)
        return max(4, 2 + max(1, inp) + max(1, tab))


@dataclass
class StaticLookupArgument:
    """CQ static lookup: vector of (input expression, table id) pairs that
    must hit the same table row (plonk/static_lookup.rs:169-191)."""
    name: str
    input_expressions: List[Expression]
    table_ids: List[StaticTableId]

    def required_degree(self) -> int:
        # B(x)*(f(x)*l_active + beta) - 1 => max(3, 2 + deg f)
        deg = max((e.degree() for e in self.input_expressions), default=1)
        return max(3, 2 + deg)


# ---------------------------- constraint system -----------------------------

class VirtualCells:
    def __init__(self, cs: "ConstraintSystem"):
        self.cs = cs
        self.queried_selectors: List[Selector] = []
        self.queried_cells: List[Tuple[Column, int]] = []

    def query_selector(self, s: Selector) -> Expression:
        self.queried_selectors.append(s)
        return Expression("selector", value=s.index)

    def query_advice(self, col: Column, rotation: int) -> Expression:
        assert col.kind == "advice"
        idx = self.cs.query_advice_index(col, rotation)
        self.queried_cells.append((col, rotation))
        return Expression("advice", query_index=idx, column=col, rotation=rotation)

    def query_fixed(self, col: Column, rotation: int) -> Expression:
        assert col.kind == "fixed"
        idx = self.cs.query_fixed_index(col, rotation)
        self.queried_cells.append((col, rotation))
        return Expression("fixed", query_index=idx, column=col, rotation=rotation)

    def query_instance(self, col: Column, rotation: int) -> Expression:
        assert col.kind == "instance"
        idx = self.cs.query_instance_index(col, rotation)
        self.queried_cells.append((col, rotation))
        return Expression("instance", query_index=idx, column=col, rotation=rotation)

    def query_challenge(self, ch: Challenge) -> Expression:
        return Expression("challenge", value=ch.index)

    def query_any(self, col: Column, rotation: int) -> Expression:
        return {
            "advice": self.query_advice,
            "fixed": self.query_fixed,
            "instance": self.query_instance,
        }[col.kind](col, rotation)


class ConstraintSystem:
    def __init__(self):
        self.num_fixed_columns = 0
        self.num_advice_columns = 0
        self.num_instance_columns = 0
        self.num_selectors = 0
        self.num_challenges = 0
        self.advice_column_phase: List[int] = []
        self.challenge_phase: List[int] = []
        self.selector_map: List[Column] = []
        self.gates: List[Gate] = []
        self.advice_queries: List[Tuple[Column, int]] = []
        self.num_advice_queries: List[int] = []
        self.instance_queries: List[Tuple[Column, int]] = []
        self.fixed_queries: List[Tuple[Column, int]] = []
        self.permutation = PermutationArgument()
        self.lookups: List[LookupArgument] = []
        self.static_lookups: List[StaticLookupArgument] = []
        self.general_column_annotations: Dict = {}
        self.constants: List[Column] = []
        self.minimum_degree: Optional[int] = None
        # zk static lookups (plonk/static_lookup.py): blinded CQ commitments
        # and a gate term gated by l_active so B's blinding rows are free.
        # Off by default = exact reference semantics (its CQ is non-zk,
        # static_lookup/prover.rs:122-124).  Must be set before keygen.
        self.zk_static_lookups: bool = False

    # -- columns
    def advice_column(self, phase: int = FIRST_PHASE) -> Column:
        col = Column(self.num_advice_columns, "advice", phase)
        self.num_advice_columns += 1
        self.advice_column_phase.append(phase)
        self.num_advice_queries.append(0)
        return col

    def advice_column_in(self, phase: int) -> Column:
        return self.advice_column(phase)

    def fixed_column(self) -> Column:
        col = Column(self.num_fixed_columns, "fixed")
        self.num_fixed_columns += 1
        return col

    def instance_column(self) -> Column:
        col = Column(self.num_instance_columns, "instance")
        self.num_instance_columns += 1
        return col

    def selector(self) -> Selector:
        s = Selector(self.num_selectors, simple=True)
        self.num_selectors += 1
        return s

    def complex_selector(self) -> Selector:
        s = Selector(self.num_selectors, simple=False)
        self.num_selectors += 1
        return s

    def challenge_usable_after(self, phase: int) -> Challenge:
        ch = Challenge(self.num_challenges, phase + 1)
        self.num_challenges += 1
        self.challenge_phase.append(phase + 1)
        return ch

    def lookup_table_column(self) -> TableColumn:
        return TableColumn(self.fixed_column())

    def enable_constant(self, col: Column) -> None:
        self.constants.append(col)
        self.enable_equality(col)

    def enable_equality(self, col: Column) -> None:
        self.query_any_index(col, 0)
        self.permutation.add_column(col)

    # -- query interning
    def _intern(self, queries: List[Tuple[Column, int]], key) -> int:
        for i, q in enumerate(queries):
            if q == key:
                return i
        queries.append(key)
        return len(queries) - 1

    def query_advice_index(self, col: Column, rot: int) -> int:
        i = self._intern(self.advice_queries, (col, rot))
        if i == len(self.advice_queries) - 1:
            self.num_advice_queries[col.index] += 1
        return i

    def query_fixed_index(self, col: Column, rot: int) -> int:
        return self._intern(self.fixed_queries, (col, rot))

    def query_instance_index(self, col: Column, rot: int) -> int:
        return self._intern(self.instance_queries, (col, rot))

    def query_any_index(self, col: Column, rot: int) -> int:
        return {
            "advice": self.query_advice_index,
            "fixed": self.query_fixed_index,
            "instance": self.query_instance_index,
        }[col.kind](col, rot)

    def get_any_query_index(self, col: Column, rot: int = 0) -> int:
        queries = {
            "advice": self.advice_queries,
            "fixed": self.fixed_queries,
            "instance": self.instance_queries,
        }[col.kind]
        for i, q in enumerate(queries):
            if q == (col, rot):
                return i
        raise KeyError((col, rot))

    # -- gates and lookups
    def create_gate(self, name: str, f: Callable[[VirtualCells], Sequence[Expression]]) -> None:
        cells = VirtualCells(self)
        polys = list(f(cells))
        assert polys, f"gate {name} has no constraints"
        self.gates.append(Gate(name, polys))

    def lookup(self, name: str, f: Callable[[VirtualCells], Sequence[Tuple[Expression, TableColumn]]]) -> int:
        cells = VirtualCells(self)
        pairs = []
        for inp, table in f(cells):
            assert not inp.contains_simple_selector(), \
                "expression containing simple selector supplied to lookup argument"
            te = cells.query_fixed(table.inner, 0)
            pairs.append((inp, te))
        self.lookups.append(LookupArgument(
            name, [p[0] for p in pairs], [p[1] for p in pairs]))
        return len(self.lookups) - 1

    def lookup_any(self, name: str, f: Callable[[VirtualCells], Sequence[Tuple[Expression, Expression]]]) -> int:
        cells = VirtualCells(self)
        pairs = list(f(cells))
        self.lookups.append(LookupArgument(
            name, [p[0] for p in pairs], [p[1] for p in pairs]))
        return len(self.lookups) - 1

    def lookup_static(self, name: str, f: Callable[[VirtualCells], Sequence[Tuple[Expression, StaticTableId]]]) -> int:
        cells = VirtualCells(self)
        pairs = []
        for inp, tid in f(cells):
            assert not inp.contains_simple_selector(), \
                "expression containing simple selector supplied to lookup argument"
            pairs.append((inp, tid))
        self.static_lookups.append(StaticLookupArgument(
            name, [p[0] for p in pairs], [p[1] for p in pairs]))
        return len(self.static_lookups) - 1

    # -- selector conversion (keygen-time)
    def convert_selectors_to_fixed(self, selector_activations: List[List[bool]]):
        """Each selector becomes a dedicated fixed column; every Selector
        expression node is substituted with the corresponding fixed query.
        Returns the fixed-column assignments (list of 0/1 rows per selector).
        Functionally equivalent to the reference's selector compression
        (plonk/circuit/compress_selectors.rs) without the packing."""
        polys = []
        self.selector_map = []
        replacements: Dict[int, Expression] = {}
        for sel_idx, activations in enumerate(selector_activations):
            col = self.fixed_column()
            self.selector_map.append(col)
            qi = self.query_fixed_index(col, 0)
            replacements[sel_idx] = Expression(
                "fixed", query_index=qi, column=col, rotation=0)
            polys.append([1 if b else 0 for b in activations])

        def sub(e: Expression) -> Optional[Expression]:
            if e.kind == "selector":
                return replacements[e.value]
            return None

        for gate in self.gates:
            gate.polys = [p.map_nodes(sub) for p in gate.polys]
        for lk in self.lookups:
            lk.input_expressions = [e.map_nodes(sub) for e in lk.input_expressions]
            lk.table_expressions = [e.map_nodes(sub) for e in lk.table_expressions]
        for sl in self.static_lookups:
            sl.input_expressions = [e.map_nodes(sub) for e in sl.input_expressions]
        return polys

    def compress_selectors_to_fixed(self, selector_activations: List[List[bool]],
                                    max_allowed_degree: Optional[int] = None):
        """Selector *packing* (reference compress_selectors.rs:352 parity):
        mutually-exclusive selectors share one fixed column holding distinct
        tags; each Selector node is substituted with the tag-interpolated
        expression.  Returns the fixed-column value lists (field elements).

        Degree budget defaults to the current constraint-system degree, so
        packing never raises the quotient degree."""
        from .compress_selectors import SelectorDescription, process

        if not selector_activations:
            self.selector_map = []
            return []

        one = Expression.const(1)

        def degree_sans_selector(poly: Expression) -> int:
            return poly.map_nodes(
                lambda e: one if e.kind == "selector" else None).degree()

        sel_deg = [0] * len(selector_activations)
        for gate in self.gates:
            for poly in gate.polys:
                if not poly.contains_simple_selector():
                    continue
                d = degree_sans_selector(poly)
                sels = set()

                def walk(e):
                    if e.kind == "selector":
                        sels.add(e.value)
                    if e.a is not None:
                        walk(e.a)
                    if e.b is not None:
                        walk(e.b)

                walk(poly)
                for s_i in sels:
                    sel_deg[s_i] = max(sel_deg[s_i], d)

        budget = max_allowed_degree or max(self.degree(), 3)
        descs = [SelectorDescription(i, acts, sel_deg[i])
                 for i, acts in enumerate(selector_activations)]
        columns, assignments = process(
            descs, budget, Expression.const,
            lambda a, b: Expression("prod", a=a, b=b),
            lambda a, b: Expression("sum", a=a, b=Expression("neg", a=b)))

        cols = [self.fixed_column() for _ in columns]
        self.selector_map = [None] * len(selector_activations)
        replacements: Dict[int, Expression] = {}
        for asg in assignments:
            col = cols[asg.combination_index]
            self.selector_map[asg.selector] = col
            qi = self.query_fixed_index(col, 0)
            q = Expression("fixed", query_index=qi, column=col, rotation=0)
            replacements[asg.selector] = asg.expression_factory(q)

        def sub(e: Expression) -> Optional[Expression]:
            if e.kind == "selector":
                return replacements[e.value]
            return None

        for gate in self.gates:
            gate.polys = [p.map_nodes(sub) for p in gate.polys]
        for lk in self.lookups:
            lk.input_expressions = [e.map_nodes(sub) for e in lk.input_expressions]
            lk.table_expressions = [e.map_nodes(sub) for e in lk.table_expressions]
        for sl in self.static_lookups:
            sl.input_expressions = [e.map_nodes(sub) for e in sl.input_expressions]
        return columns

    # -- degree accounting
    def degree(self) -> int:
        degree = self.permutation.required_degree()
        degree = max(degree, max((l.required_degree() for l in self.lookups), default=1))
        degree = max(degree, max((l.required_degree() for l in self.static_lookups), default=1))
        degree = max(degree, max(
            (p.degree() for g in self.gates for p in g.polys), default=0))
        return max(degree, self.minimum_degree or 1)

    def blinding_factors(self) -> int:
        factors = max(self.num_advice_queries, default=1)
        factors = max(factors, 1)
        factors = max(3, factors)
        return factors + 1 + 1

    def minimum_rows(self) -> int:
        return self.blinding_factors() + 3

    def phases(self) -> List[int]:
        return sorted(set([FIRST_PHASE] + self.advice_column_phase))
