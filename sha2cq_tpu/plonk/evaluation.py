"""Constraint evaluation: expressions over value grids and the h(X) poly.

Reference: plonk/evaluation.rs.  The reference compiles Expression trees into
a CSE'd `GraphEvaluator` and runs it pointwise with rayon threads
(evaluation.rs:187-551).  Here evaluation is a fold over the expression tree
whose leaves are whole *columns* (host: python lists; device: (16, n) limb
arrays) — the vectorization axis replaces the row loop, which is the natural
XLA formulation (no graph compilation needed; XLA does the CSE/fusion).

`evaluate_h` mirrors evaluation.rs:285-551 exactly, including the y-folding
order of terms: custom gates, permutation (l0 / l_last / chaining / product
terms), dynamic lookups (5 terms each), static lookups (1 term each).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

from ..fields.host import FR_MOD, FR_DELTA, batch_inv
from .circuit_ir import ConstraintSystem, Expression

P = FR_MOD


def evaluate_expr_lagrange(expr: Expression, n: int, fixed, advice, instance,
                           challenges: Sequence[int]) -> List[int]:
    """Evaluate an expression over the n-row Lagrange grids (rotations wrap).
    Mirrors plonk/evaluation.rs:778-816 `evaluate`."""

    def col(values, e):
        rot = e.rotation
        if rot == 0:
            return list(values[e.column.index])
        return [values[e.column.index][(i + rot) % n] for i in range(n)]

    ops = {
        "const": lambda v: [v] * n,
        "selector": lambda e: (_ for _ in ()).throw(ValueError("selector in prover")),
        "fixed": lambda e: col(fixed, e),
        "advice": lambda e: col(advice, e),
        "instance": lambda e: col(instance, e),
        "challenge": lambda e: [challenges[e.value]] * n,
        "neg": lambda a: [(-x) % P for x in a],
        "sum": lambda a, b: [(x + y) % P for x, y in zip(a, b)],
        "prod": lambda a, b: [(x * y) % P for x, y in zip(a, b)],
        "scaled": lambda a, v: [(x * v) % P for x in a],
    }
    return expr.evaluate(ops)


def evaluate_h(pk, advice_cosets, instance_cosets, challenges, y, beta, gamma,
               theta, lookups, static_lookups, permutations) -> List[int]:
    """Compute h(X) values on the extended coset domain (host path).

    advice_cosets/instance_cosets: per-circuit lists of extended-domain value
    lists; lookups/static_lookups/permutations: per-circuit committed state
    from the argument provers.
    """
    domain = pk.vk.domain
    cs = pk.vk.cs
    size = domain.extended_n
    rot_scale = 1 << (domain.extended_k - domain.k)
    fixed = pk.fixed_cosets
    l0, l_last, l_active = pk.l0, pk.l_last, pk.l_active_row
    values = [0] * size

    def rot_idx(idx, rot):
        return (idx + rot * rot_scale) % size

    def eval_expr_coset(expr, advice, instance):
        def col(vals, e):
            if e.rotation == 0:
                return vals[e.column.index]
            src = vals[e.column.index]
            r = e.rotation * rot_scale
            return [src[(i + r) % size] for i in range(size)]

        ops = {
            "const": lambda v: v,  # scalars broadcast below
            "selector": lambda e: (_ for _ in ()).throw(ValueError("selector")),
            "fixed": lambda e: col(fixed, e),
            "advice": lambda e: col(advice, e),
            "instance": lambda e: col(instance, e),
            "challenge": lambda e: challenges[e.value],
            "neg": lambda a: _neg(a),
            "sum": lambda a, b: _add(a, b),
            "prod": lambda a, b: _mul(a, b),
            "scaled": lambda a, v: _scale(a, v),
        }
        out = expr.evaluate(ops)
        if isinstance(out, int):
            out = [out] * size
        return out

    def _lift(a):
        return [a] * size if isinstance(a, int) else a

    def _add(a, b):
        if isinstance(a, int) and isinstance(b, int):
            return (a + b) % P
        a, b = _lift(a), _lift(b)
        return [(x + y) % P for x, y in zip(a, b)]

    def _neg(a):
        if isinstance(a, int):
            return (-a) % P
        return [(-x) % P for x in a]

    def _mul(a, b):
        if isinstance(a, int) and isinstance(b, int):
            return (a * b) % P
        a, b = _lift(a), _lift(b)
        return [(x * y) % P for x, y in zip(a, b)]

    def _scale(a, v):
        if isinstance(a, int):
            return (a * v) % P
        return [(x * v) % P for x in a]

    for (advice, instance, lookups_c, static_c, permutation) in zip(
            advice_cosets, instance_cosets, lookups, static_lookups, permutations):

        # -- custom gates, Horner in y per polynomial
        for gate in cs.gates:
            for poly in gate.polys:
                ev = eval_expr_coset(poly, advice, instance)
                values = [(v * y + e) % P for v, e in zip(values, ev)]

        # -- permutation argument (evaluation.rs:376-456)
        sets = permutation["sets"] if permutation else []
        if sets:
            # cosets are computed lazily: the device h-path never needs
            # them, so permutation_commit no longer pays the extended NTT
            from ..poly.arith import as_coeff_list
            for s in sets:
                if "coset" not in s:
                    s["coset"] = domain.coeff_to_extended_host(
                        as_coeff_list(s["poly"]))
            blinding_factors = cs.blinding_factors()
            last_rot = -(blinding_factors + 1)
            chunk_len = pk.vk.cs_degree - 2
            extended_omega = domain.extended_omega
            first = sets[0]["coset"]
            last = sets[-1]["coset"]

            # l_0 * (1 - z_first)
            values = [(v * y + (1 - first[i]) * l0[i]) % P for i, v in enumerate(values)]
            # l_last * (z_last^2 - z_last)
            values = [
                (v * y + (last[i] * last[i] - last[i]) * l_last[i]) % P
                for i, v in enumerate(values)
            ]
            # chaining: l_0 * (z_i - z_{i-1}(w^last X))
            for set_idx in range(1, len(sets)):
                cur = sets[set_idx]["coset"]
                prev = sets[set_idx - 1]["coset"]
                values = [
                    (v * y + (cur[i] - prev[rot_idx(i, last_rot)]) * l0[i]) % P
                    for i, v in enumerate(values)
                ]
            # product terms per set
            columns = cs.permutation.columns
            # precompute column value lists on coset
            def col_coset(column):
                if column.kind == "advice":
                    return advice[column.index]
                if column.kind == "fixed":
                    return fixed[column.index]
                return instance[column.index]

            # beta_term = extended_omega^i * ZETA * beta
            from ..fields.host import FR_ZETA
            delta_start = beta * FR_ZETA % P
            beta_terms = [0] * size
            cur = 1
            for i in range(size):
                beta_terms[i] = cur
                cur = cur * extended_omega % P

            for chunk_idx in range(len(sets)):
                cols = columns[chunk_idx * chunk_len:(chunk_idx + 1) * chunk_len]
                cosets = pk.permutation.cosets[chunk_idx * chunk_len:(chunk_idx + 1) * chunk_len]
                z = sets[chunk_idx]["coset"]
                delta_pow = pow(FR_DELTA, chunk_idx * chunk_len, P)
                term = [0] * size
                for i in range(size):
                    left = z[rot_idx(i, 1)]
                    for column, sigma in zip(cols, cosets):
                        vals = col_coset(column)
                        left = left * ((vals[i] + beta * sigma[i] + gamma) % P) % P
                    right = z[i]
                    current_delta = delta_start * beta_terms[i] % P * delta_pow % P
                    for column in cols:
                        vals = col_coset(column)
                        right = right * ((vals[i] + current_delta + gamma) % P) % P
                        current_delta = current_delta * FR_DELTA % P
                    term[i] = (left - right) * l_active[i] % P
                values = [(v * y + t) % P for v, t in zip(values, term)]

        # -- dynamic lookups (evaluation.rs:458-531)
        for n_lk, lk in enumerate(lookups_c or []):
            product_coset = domain.coeff_to_extended_host(lk["product_poly"])
            inp_coset = domain.coeff_to_extended_host(lk["permuted_input_poly"])
            tab_coset = domain.coeff_to_extended_host(lk["permuted_table_poly"])
            arg = cs.lookups[n_lk]
            # table_value = (theta-compressed inputs + beta)(tables + gamma)
            comp_in = [0] * size
            for e in arg.input_expressions:
                ev = eval_expr_coset(e, advice, instance)
                comp_in = [(a * theta + b) % P for a, b in zip(comp_in, ev)]
            comp_tab = [0] * size
            for e in arg.table_expressions:
                ev = eval_expr_coset(e, advice, instance)
                comp_tab = [(a * theta + b) % P for a, b in zip(comp_tab, ev)]
            new_values = values
            for i in range(size):
                v = values[i]
                r_next = rot_idx(i, 1)
                r_prev = rot_idx(i, -1)
                a_minus_s = (inp_coset[i] - tab_coset[i]) % P
                v = (v * y + (1 - product_coset[i]) * l0[i]) % P
                v = (v * y + (product_coset[i] * product_coset[i] - product_coset[i]) * l_last[i]) % P
                table_value = (comp_in[i] + beta) * (comp_tab[i] + gamma) % P
                v = (v * y + (product_coset[r_next]
                              * ((inp_coset[i] + beta) % P)
                              * ((tab_coset[i] + gamma) % P)
                              - product_coset[i] * table_value) * l_active[i]) % P
                v = (v * y + a_minus_s * l0[i]) % P
                v = (v * y + a_minus_s * ((inp_coset[i] - inp_coset[r_prev]) % P) * l_active[i]) % P
                values[i] = v

        # -- static lookups (evaluation.rs:533-548); zk mode gates the term
        # by l_active so B's random blinding rows are unconstrained
        # (static_lookup.py module docstring)
        for sl in (static_c or []):
            from ..poly.arith import as_coeff_list
            b_coset = domain.coeff_to_extended_host(as_coeff_list(sl["b"]))
            f_coset = domain.coeff_to_extended_host(as_coeff_list(sl["f"]))
            if getattr(cs, "zk_static_lookups", False):
                values = [
                    (v * y + l_active[i] *
                     (b_coset[i] * ((f_coset[i] + beta) % P) - 1)) % P
                    for i, v in enumerate(values)
                ]
            else:
                values = [
                    (v * y + (b_coset[i] * ((f_coset[i] * l_active[i] + beta) % P) - 1)) % P
                    for i, v in enumerate(values)
                ]

    return values
