"""Vanishing argument (reference plonk/vanishing/{prover,verifier}.rs).

Prover: commit a random blinding poly before y; after evaluate_h, divide by
t(X) = X^n - 1 on the coset, split the quotient into n-sized pieces, commit
each; at x, fold the pieces with x^n and open the folded h plus the random
poly.  Verifier: reconstruct expected h(x) = (sum y^i expr_i)/(x^n - 1) and
fold the h-piece commitments with x^n into a lazy MSM.
"""
from __future__ import annotations

from typing import List

from ..fields.host import FR_MOD
from ..poly import arith as A
from ..poly.kzg.gwc import ProverQuery, VerifierQuery
from ..poly.kzg.msm_accum import MSMKZG

P = FR_MOD


def vanishing_commit(params, domain, rng, transcript) -> dict:
    random_poly = [rng.randrange(P) for _ in range(domain.n)]
    c = params.commit(random_poly)
    transcript.write_point(c)
    return {"random_poly": random_poly}


def vanishing_construct(committed: dict, params, domain, h_values: List[int],
                        rng, transcript) -> dict:
    h_values = domain.divide_by_vanishing_poly_host(h_values)
    h_coeffs = domain.extended_to_coeff_host(h_values)
    return vanishing_construct_from_coeffs(committed, params, domain, h_coeffs,
                                           transcript)


def vanishing_construct_from_coeffs(committed: dict, params, domain,
                                    h_coeffs: List[int], transcript) -> dict:
    n = domain.n
    h_pieces = [h_coeffs[i:i + n] for i in range(0, len(h_coeffs), n)]
    # quotient_poly_degree pieces expected
    while len(h_pieces) < domain.quotient_poly_degree:
        h_pieces.append([0] * n)
    for piece in h_pieces:
        transcript.write_point(params.commit(piece))
    return {"h_pieces": h_pieces, **committed}


def vanishing_evaluate(constructed: dict, x: int, xn: int, domain, transcript) -> dict:
    h_poly: List[int] = []
    for piece in reversed(constructed["h_pieces"]):
        h_poly = A.poly_add(A.poly_scale(h_poly, xn), piece)
    random_eval = A.eval_polynomial(constructed["random_poly"], x)
    transcript.write_scalar(random_eval)
    return {"h_poly": h_poly, "random_poly": constructed["random_poly"]}


def vanishing_open(evaluated: dict, x: int) -> List[ProverQuery]:
    return [
        ProverQuery(x, evaluated["h_poly"]),
        ProverQuery(x, evaluated["random_poly"]),
    ]


# ------------------------------- verifier -----------------------------------

def vanishing_read_before_y(transcript) -> dict:
    return {"random_commitment": transcript.read_point()}


def vanishing_read_after_y(committed: dict, vk, transcript) -> dict:
    h_commitments = [transcript.read_point()
                     for _ in range(vk.domain.quotient_poly_degree)]
    return {"h_commitments": h_commitments, **committed}


def vanishing_read_eval(constructed: dict, transcript) -> dict:
    return {"random_eval": transcript.read_scalar(), **constructed}


def vanishing_verify(partial: dict, expressions: List[int], y: int, xn: int) -> dict:
    h_eval = 0
    for v in expressions:
        h_eval = (h_eval * y + v) % P
    h_eval = h_eval * pow(xn - 1, P - 2, P) % P

    h_msm = MSMKZG()
    for c in reversed(partial["h_commitments"]):
        h_msm.scale(xn)
        h_msm.append_term(1, c)
    return {
        "h_commitment_msm": h_msm,
        "expected_h_eval": h_eval,
        "random_commitment": partial["random_commitment"],
        "random_eval": partial["random_eval"],
    }


def vanishing_queries(evaluated: dict, x: int) -> List[VerifierQuery]:
    return [
        VerifierQuery(x, evaluated["h_commitment_msm"], evaluated["expected_h_eval"]),
        VerifierQuery(x, evaluated["random_commitment"], evaluated["random_eval"]),
    ]
