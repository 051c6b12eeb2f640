"""Device (TPU) h-polynomial evaluation — the prover's hot loop #1.

Mirrors plonk/evaluation.py's host `evaluate_h` (itself mirroring reference
evaluation.rs:285-551, same y-folding order) with every pointwise loop
replaced by fused jnp limb kernels over (16, extended_n) arrays:
  - expression trees walk into mont_mul/add/sub chains (XLA fuses + CSEs —
    the role of the reference's GraphEvaluator)
  - rotations are jnp.roll on the extended domain
  - the sequential beta_term recurrence becomes a precomputed coset-powers
    table

The prover uses this path via create_proof(..., h_device=True); equality
with the host path is pinned in tests at the SHA-circuit scale.
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp

from ..fields import device as D
from ..fields import host as H
from ..fields.device import FR, NLIMB
from ..ops import ntt as NTT
from .circuit_ir import Expression

P = H.FR_MOD


def _const(v: int):
    return D.pack_scalar(v, FR).reshape(NLIMB, 1)


def _coeff_to_extended_dev(domain, coeffs_host: List[int]):
    a = D.pack(coeffs_host, FR)
    return domain.coeff_to_extended(a)


def _device_state(pk):
    """Lazily pack pk's static arrays onto the device (cached on the pk)."""
    if getattr(pk, "_dev_cache", None) is not None:
        return pk._dev_cache
    dev = {
        "fixed_cosets": [D.pack(c, FR) for c in pk.fixed_cosets],
        "l0": D.pack(pk.l0, FR),
        "l_last": D.pack(pk.l_last, FR),
        "l_active": D.pack(pk.l_active_row, FR),
        "sigma_cosets": [D.pack(c, FR) for c in pk.permutation.cosets],
    }
    pk._dev_cache = dev
    return dev


def evaluate_h_device(pk, advice_cosets_dev, instance_cosets_dev, challenges,
                      y, beta, gamma, theta, lookups, static_lookups,
                      permutations) -> jnp.ndarray:
    """Returns h values on the extended coset domain as a (16, ext_n) array.

    advice/instance cosets: per-circuit lists of (16, ext_n) device arrays.
    lookups/static_lookups/permutations: the host argument-prover outputs
    (their committed polys are lifted to device cosets here).
    """
    domain = pk.vk.domain
    cs = pk.vk.cs
    size = domain.extended_n
    rot_scale = 1 << (domain.extended_k - domain.k)
    dev = _device_state(pk)
    fixed = dev["fixed_cosets"]
    l0, l_last, l_active = dev["l0"], dev["l_last"], dev["l_active"]

    yc = _const(y)
    betac = _const(beta)
    gammac = _const(gamma)
    one = D.ones((size,), FR)
    values = D.zeros((size,), FR)

    def roll(a, rot):
        return jnp.roll(a, -rot * rot_scale, axis=1)

    def eval_expr(expr: Expression, advice, instance):
        ops = {
            "const": lambda v: _const(v),
            "selector": lambda e: (_ for _ in ()).throw(ValueError("selector")),
            "fixed": lambda e: roll(fixed[e.column.index], e.rotation),
            "advice": lambda e: roll(advice[e.column.index], e.rotation),
            "instance": lambda e: roll(instance[e.column.index], e.rotation),
            "challenge": lambda e: _const(challenges[e.value]),
            "neg": lambda a: D.neg(a, FR),
            "sum": lambda a, b: D.add(a, b, FR),
            "prod": lambda a, b: D.mont_mul(a, b, FR),
            "scaled": lambda a, v: D.mont_mul(a, _const(v), FR),
        }
        out = expr.evaluate(ops)
        if out.shape[1] == 1:
            out = jnp.broadcast_to(out, (NLIMB, size))
        return out

    def fold(acc, term):
        return D.add(D.mont_mul(acc, yc, FR), term, FR)

    for advice, instance, lookups_c, static_c, permutation in zip(
            advice_cosets_dev, instance_cosets_dev, lookups, static_lookups,
            permutations):

        # custom gates
        for gate in cs.gates:
            for poly in gate.polys:
                values = fold(values, eval_expr(poly, advice, instance))

        # permutation argument
        sets = permutation["sets"] if permutation else []
        if sets:
            bf = cs.blinding_factors()
            last_rot = -(bf + 1)
            chunk_len = pk.vk.cs_degree - 2
            set_cosets = [D.pack(s["coset"], FR) for s in sets]
            first, last = set_cosets[0], set_cosets[-1]

            values = fold(values, D.mont_mul(D.sub(one, first, FR), l0, FR))
            values = fold(values, D.mont_mul(
                D.sub(D.mont_mul(last, last, FR), last, FR), l_last, FR))
            for i in range(1, len(set_cosets)):
                values = fold(values, D.mont_mul(
                    D.sub(set_cosets[i], roll(set_cosets[i - 1], last_rot), FR),
                    l0, FR))

            # coset point table: beta * zeta * extended_omega^i
            coset_pts = NTT.powers_host(domain.extended_omega, size, P)
            delta_start = beta * H.FR_ZETA % P
            beta_terms = D.pack([delta_start * w % P for w in coset_pts], FR)

            columns = cs.permutation.columns

            def col_coset(column):
                if column.kind == "advice":
                    return advice[column.index]
                if column.kind == "fixed":
                    return fixed[column.index]
                return instance[column.index]

            for chunk_idx, z in enumerate(set_cosets):
                cols = columns[chunk_idx * chunk_len:(chunk_idx + 1) * chunk_len]
                sigmas = dev["sigma_cosets"][
                    chunk_idx * chunk_len:(chunk_idx + 1) * chunk_len]
                left = roll(z, 1)
                for column, sigma in zip(cols, sigmas):
                    vals = col_coset(column)
                    term = D.add(D.add(vals, D.mont_mul(betac, sigma, FR), FR),
                                 gammac, FR)
                    left = D.mont_mul(left, term, FR)
                right = z
                delta_pow = pow(H.FR_DELTA, chunk_idx * chunk_len, P)
                cur_delta = D.mont_mul(beta_terms, _const(delta_pow), FR)
                for column in cols:
                    vals = col_coset(column)
                    right = D.mont_mul(
                        right, D.add(D.add(vals, cur_delta, FR), gammac, FR), FR)
                    cur_delta = D.mont_mul(cur_delta, _const(H.FR_DELTA), FR)
                values = fold(values, D.mont_mul(
                    D.sub(left, right, FR), l_active, FR))

        # dynamic lookups
        for n_lk, lk in enumerate(lookups_c or []):
            product = _coeff_to_extended_dev(domain, lk["product_poly"])
            inp = _coeff_to_extended_dev(domain, lk["permuted_input_poly"])
            tab = _coeff_to_extended_dev(domain, lk["permuted_table_poly"])
            arg = cs.lookups[n_lk]
            thetac = _const(theta)
            comp_in = D.zeros((size,), FR)
            for e in arg.input_expressions:
                comp_in = D.add(D.mont_mul(comp_in, thetac, FR),
                                eval_expr(e, advice, instance), FR)
            comp_tab = D.zeros((size,), FR)
            for e in arg.table_expressions:
                comp_tab = D.add(D.mont_mul(comp_tab, thetac, FR),
                                 eval_expr(e, advice, instance), FR)
            a_minus_s = D.sub(inp, tab, FR)
            values = fold(values, D.mont_mul(D.sub(one, product, FR), l0, FR))
            values = fold(values, D.mont_mul(
                D.sub(D.mont_mul(product, product, FR), product, FR), l_last, FR))
            table_value = D.mont_mul(D.add(comp_in, betac, FR),
                                     D.add(comp_tab, gammac, FR), FR)
            left = D.mont_mul(D.mont_mul(roll(product, 1),
                                         D.add(inp, betac, FR), FR),
                              D.add(tab, gammac, FR), FR)
            values = fold(values, D.mont_mul(
                D.sub(left, D.mont_mul(product, table_value, FR), FR),
                l_active, FR))
            values = fold(values, D.mont_mul(a_minus_s, l0, FR))
            values = fold(values, D.mont_mul(
                D.mont_mul(a_minus_s, D.sub(inp, roll(inp, -1), FR), FR),
                l_active, FR))

        # CQ static lookups
        for sl in (static_c or []):
            b_coset = _coeff_to_extended_dev(domain, sl["b"])
            f_coset = _coeff_to_extended_dev(domain, sl["f"])
            term = D.mont_mul(
                b_coset,
                D.add(D.mont_mul(f_coset, l_active, FR), betac, FR), FR)
            values = fold(values, D.sub(term, one, FR))

    return values
