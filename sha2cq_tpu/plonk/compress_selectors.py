"""Selector compression: pack many boolean selectors into few fixed columns.

Parity with reference plonk/circuit/compress_selectors.rs:352: selectors
whose activation rows are mutually exclusive can share one fixed
"combination" column — the column holds a distinct nonzero tag per selector,
and each selector's expression becomes

    q * prod_{other tags h} (h - q) * prod^-1      (degree = #selectors)

which is nonzero exactly on that selector's rows (where q = its tag) and
zero both on other selectors' rows and on empty rows (q = 0).  Packing is
greedy under a max-degree budget: a selector with gate-degree d can join a
combination as long as (#selectors in combination) + d <= max_degree.

Selectors that appear in no gate (or exceed the budget alone) fall back to
a dedicated 0/1 column, like convert_selectors_to_fixed.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Tuple

from ..fields.host import FR_MOD, inv_mod

P = FR_MOD


@dataclass
class SelectorDescription:
    selector: int                # selector index
    activations: List[bool]      # per-row
    max_degree: int              # largest gate degree this selector gates


@dataclass
class SelectorAssignment:
    selector: int
    combination_index: int       # which fixed column
    expression_factory: Callable  # (query_expr) -> Expression


def process(selectors: List[SelectorDescription], max_degree: int,
            expr_const, expr_mul, expr_sub):
    """Pack selectors into combination columns.

    Returns (combination_value_columns, assignments):
      combination_value_columns: per new fixed column, the per-row field
        values to assign;
      assignments: per selector, its column index and an expression factory
        mapping the column's query expression to the selector expression.

    expr_const/expr_mul/expr_sub are Expression constructors so this module
    stays IR-agnostic (mirrors the closure-driven reference API).
    """
    if not selectors:
        return [], []

    n = len(selectors[0].activations)
    combinations: List[List[SelectorDescription]] = []

    # simple (degree-0-budget or always-on) selectors get their own column
    leftovers = []
    for desc in sorted(selectors, key=lambda d: -d.max_degree):
        placed = False
        if desc.max_degree > 0:
            for combo in combinations:
                # adding a member raises EVERY member's selector-expression
                # degree to the new combination length, so the bound uses the
                # max gate degree across the whole would-be combination
                worst = max(desc.max_degree, max(d.max_degree for d in combo))
                if len(combo) + 1 + worst > max_degree:
                    continue
                if any(a and b for other in combo
                       for a, b in zip(other.activations, desc.activations)):
                    continue
                combo.append(desc)
                placed = True
                break
            if not placed and 1 + desc.max_degree <= max_degree:
                combinations.append([desc])
                placed = True
        if not placed:
            leftovers.append(desc)

    columns: List[List[int]] = []
    assignments: List[SelectorAssignment] = []

    for combo in combinations:
        col_idx = len(columns)
        values = [0] * n
        tags = list(range(1, len(combo) + 1))
        for tag, desc in zip(tags, combo):
            for row, active in enumerate(desc.activations):
                if active:
                    values[row] = tag
        columns.append(values)
        for tag, desc in zip(tags, combo):
            others = [t for t in tags if t != tag]

            def factory(q, _tag=tag, _others=others):
                # q * prod (h - q), normalized to 1 on active rows
                norm = _tag
                for h in _others:
                    norm = norm * (h - _tag) % P
                e = q
                for h in _others:
                    e = expr_mul(e, expr_sub(expr_const(h), q))
                return expr_mul(e, expr_const(inv_mod(norm, P)))

            assignments.append(SelectorAssignment(desc.selector, col_idx, factory))

    for desc in leftovers:
        col_idx = len(columns)
        columns.append([1 if a else 0 for a in desc.activations])
        assignments.append(SelectorAssignment(
            desc.selector, col_idx, lambda q: q))

    return columns, assignments
