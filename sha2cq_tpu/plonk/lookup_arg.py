"""Dynamic (classic halo2) lookup argument prover + verifier.

Reference: plonk/lookup/{prover,verifier}.rs — theta-compression of input and
table expressions, the sorted permute_expression_pair, the grand-product Z
polynomial, 5 h-terms, and the 5 openings at x / wx / w^{-1}x.
"""
from __future__ import annotations

from typing import List, Tuple

from ..fields.host import FR_MOD, batch_inv
from ..poly import arith as A
from ..poly.kzg.gwc import ProverQuery, VerifierQuery
from .evaluation import evaluate_expr_lagrange

P = FR_MOD


def _compress(expressions, n, fixed, advice, instance, challenges, theta):
    acc = [0] * n
    for e in expressions:
        vals = evaluate_expr_lagrange(e, n, fixed, advice, instance, challenges)
        acc = [(a * theta + v) % P for a, v in zip(acc, vals)]
    return acc


def _permute_expression_pair(pk, n, rng, input_expr: List[int], table_expr: List[int]
                             ) -> Tuple[List[int], List[int]]:
    """prover.rs:407-475: sort inputs; first occurrence of each value aligns
    with the table value; leftover table values fill repeated-input rows."""
    bf = pk.vk.cs.blinding_factors()
    usable_rows = n - (bf + 1)
    permuted_input = sorted(input_expr[:usable_rows])
    leftover: dict = {}
    for v in table_expr[:usable_rows]:
        leftover[v] = leftover.get(v, 0) + 1
    permuted_table = [0] * usable_rows
    repeated_rows = []
    for row, v in enumerate(permuted_input):
        if row == 0 or v != permuted_input[row - 1]:
            permuted_table[row] = v
            if leftover.get(v, 0) > 0:
                leftover[v] -= 1
            else:
                raise ValueError(f"lookup input {v} not in table")
        else:
            repeated_rows.append(row)
    for v in sorted(leftover):
        for _ in range(leftover[v]):
            permuted_table[repeated_rows.pop()] = v
    assert not repeated_rows
    permuted_input += [rng.randrange(P) for _ in range(bf + 1)]
    permuted_table += [rng.randrange(P) for _ in range(bf + 1)]
    return permuted_input, permuted_table


def lookup_commit_permuted(arg, pk, params, theta, advice, fixed, instance,
                           challenges, rng, transcript) -> dict:
    n = params.n
    domain = pk.vk.domain
    compressed_input = _compress(arg.input_expressions, n, fixed, advice,
                                 instance, challenges, theta)
    compressed_table = _compress(arg.table_expressions, n, fixed, advice,
                                 instance, challenges, theta)
    permuted_input, permuted_table = _permute_expression_pair(
        pk, n, rng, compressed_input, compressed_table)
    transcript.write_point(params.commit_lagrange(permuted_input))
    transcript.write_point(params.commit_lagrange(permuted_table))
    return {
        "compressed_input": compressed_input,
        "compressed_table": compressed_table,
        "permuted_input": permuted_input,
        "permuted_table": permuted_table,
        "permuted_input_poly": domain.lagrange_to_coeff_host(permuted_input),
        "permuted_table_poly": domain.lagrange_to_coeff_host(permuted_table),
    }


def lookup_commit_product(permuted: dict, pk, params, beta, gamma, rng,
                          transcript) -> dict:
    n = params.n
    domain = pk.vk.domain
    bf = pk.vk.cs.blinding_factors()
    denom = [
        (beta + pi) * (gamma + pt) % P
        for pi, pt in zip(permuted["permuted_input"], permuted["permuted_table"])
    ]
    denom = batch_inv(denom, P)
    product = [
        d * ((ci + beta) % P) % P * ((ct + gamma) % P) % P
        for d, ci, ct in zip(denom, permuted["compressed_input"], permuted["compressed_table"])
    ]
    z = [1]
    for row in range(n - bf - 1):
        z.append(z[-1] * product[row] % P)
    z += [rng.randrange(P) for _ in range(bf)]
    assert len(z) == n
    transcript.write_point(params.commit_lagrange(z))
    return {
        "permuted_input_poly": permuted["permuted_input_poly"],
        "permuted_table_poly": permuted["permuted_table_poly"],
        "product_poly": domain.lagrange_to_coeff_host(z),
        # Lagrange forms retained for the device h-path (one batched NTT)
        "permuted_input": permuted["permuted_input"],
        "permuted_table": permuted["permuted_table"],
        "product_lagrange": z,
    }


def lookup_evaluate(committed: dict, pk, x: int, transcript) -> dict:
    domain = pk.vk.domain
    x_inv = domain.rotate_omega(x, -1)
    x_next = domain.rotate_omega(x, 1)
    evals = [
        A.eval_polynomial(committed["product_poly"], x),
        A.eval_polynomial(committed["product_poly"], x_next),
        A.eval_polynomial(committed["permuted_input_poly"], x),
        A.eval_polynomial(committed["permuted_input_poly"], x_inv),
        A.eval_polynomial(committed["permuted_table_poly"], x),
    ]
    for e in evals:
        transcript.write_scalar(e)
    return committed


def lookup_open(committed: dict, pk, x: int) -> List[ProverQuery]:
    domain = pk.vk.domain
    x_inv = domain.rotate_omega(x, -1)
    x_next = domain.rotate_omega(x, 1)
    return [
        ProverQuery(x, committed["product_poly"]),
        ProverQuery(x, committed["permuted_input_poly"]),
        ProverQuery(x, committed["permuted_table_poly"]),
        ProverQuery(x_inv, committed["permuted_input_poly"]),
        ProverQuery(x_next, committed["product_poly"]),
    ]


# ------------------------------- verifier -----------------------------------

def lookup_read_permuted_commitments(transcript) -> dict:
    return {
        "permuted_input_commitment": transcript.read_point(),
        "permuted_table_commitment": transcript.read_point(),
    }


def lookup_read_product_commitment(permuted: dict, transcript) -> dict:
    return {"product_commitment": transcript.read_point(), **permuted}


def lookup_verifier_evaluate(committed: dict, transcript) -> dict:
    return {
        **committed,
        "product_eval": transcript.read_scalar(),
        "product_next_eval": transcript.read_scalar(),
        "permuted_input_eval": transcript.read_scalar(),
        "permuted_input_inv_eval": transcript.read_scalar(),
        "permuted_table_eval": transcript.read_scalar(),
    }


def lookup_expressions(ev: dict, arg, l_0, l_last, l_blind, theta, beta, gamma,
                       advice_evals, fixed_evals, instance_evals, challenges) -> List[int]:
    active_rows = (1 - (l_last + l_blind)) % P

    def compress(expressions):
        acc = 0
        for e in expressions:
            ops = {
                "const": lambda v: v,
                "selector": lambda q: (_ for _ in ()).throw(ValueError("selector")),
                "fixed": lambda q: fixed_evals[q.query_index],
                "advice": lambda q: advice_evals[q.query_index],
                "instance": lambda q: instance_evals[q.query_index],
                "challenge": lambda q: challenges[q.value],
                "neg": lambda a: (-a) % P,
                "sum": lambda a, b: (a + b) % P,
                "prod": lambda a, b: (a * b) % P,
                "scaled": lambda a, v: (a * v) % P,
            }
            acc = (acc * theta + e.evaluate(ops)) % P
        return acc

    left = ev["product_next_eval"] * ((ev["permuted_input_eval"] + beta) % P) % P \
        * ((ev["permuted_table_eval"] + gamma) % P) % P
    right = ev["product_eval"] * ((compress(arg.input_expressions) + beta) % P) % P \
        * ((compress(arg.table_expressions) + gamma) % P) % P

    return [
        l_0 * (1 - ev["product_eval"]) % P,
        l_last * (ev["product_eval"] * ev["product_eval"] - ev["product_eval"]) % P,
        (left - right) * active_rows % P,
        l_0 * (ev["permuted_input_eval"] - ev["permuted_table_eval"]) % P,
        (ev["permuted_input_eval"] - ev["permuted_table_eval"])
        * (ev["permuted_input_eval"] - ev["permuted_input_inv_eval"]) % P
        * active_rows % P,
    ]


def lookup_queries(ev: dict, vk, x: int) -> List[VerifierQuery]:
    x_inv = vk.domain.rotate_omega(x, -1)
    x_next = vk.domain.rotate_omega(x, 1)
    return [
        VerifierQuery(x, ev["product_commitment"], ev["product_eval"]),
        VerifierQuery(x, ev["permuted_input_commitment"], ev["permuted_input_eval"]),
        VerifierQuery(x, ev["permuted_table_commitment"], ev["permuted_table_eval"]),
        VerifierQuery(x_inv, ev["permuted_input_commitment"], ev["permuted_input_inv_eval"]),
        VerifierQuery(x_next, ev["product_commitment"], ev["product_next_eval"]),
    ]
