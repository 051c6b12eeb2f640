"""verify_proof (reference plonk/verifier.rs:34-489).

Reads the transcript in prover order, reconstructs expected h(x) by folding
gate/permutation/lookup/CQ contributions with y, folds all openings into the
GWC DualMSM via the strategy, then returns a PairingBatcher holding the KZG
check plus the three CQ pairing identities per lookup — the caller finalizes
with one multi-Miller loop (cf. tests/my_test.rs:234-258).
"""
from __future__ import annotations

from typing import List, Sequence

from ..curves.host import PairingBatcher
from ..fields.host import FR_MOD
from ..poly.kzg.gwc import VerifierQuery, gwc_verify_proof
from ..poly.kzg.strategy import AccumulatorStrategy
from ..utils.transcript import Blake2bRead
from .keys import VerifyingKey
from .lookup_arg import (lookup_expressions, lookup_queries,
                         lookup_read_permuted_commitments,
                         lookup_read_product_commitment,
                         lookup_verifier_evaluate)
from .permutation import (permutation_common_queries, permutation_expressions,
                          permutation_queries,
                          permutation_read_product_commitments,
                          permutation_verifier_evaluate)
from .static_lookup import (static_lookup_expressions, static_lookup_queries,
                            static_lookup_read_committed,
                            static_lookup_read_log_derivative,
                            static_lookup_register_pairings,
                            static_lookup_verifier_evaluate)
from .vanishing import (vanishing_queries, vanishing_read_after_y,
                        vanishing_read_before_y, vanishing_read_eval,
                        vanishing_verify)

P = FR_MOD


def verify_proof(params, vk: VerifyingKey, strategy: AccumulatorStrategy,
                 instances: Sequence[Sequence[Sequence[int]]],
                 transcript: Blake2bRead,
                 multiopen: str = "gwc") -> PairingBatcher:
    cs = vk.cs
    domain = vk.domain
    n = params.n
    num_proofs = len(instances)
    for inst in instances:
        if len(inst) != cs.num_instance_columns:
            raise ValueError("InvalidInstances")

    vk.hash_into(transcript)
    for inst in instances:
        for col in inst:
            for v in col:
                transcript.common_scalar(v)

    # advice commitments per phase + phase challenges
    advice_commitments = [[None] * cs.num_advice_columns for _ in range(num_proofs)]
    challenges = [0] * cs.num_challenges
    for phase in cs.phases():
        for ac in advice_commitments:
            for i, col_phase in enumerate(cs.advice_column_phase):
                if col_phase == phase:
                    ac[i] = transcript.read_point()
        for i, ch_phase in enumerate(cs.challenge_phase):
            if ch_phase == phase:
                challenges[i] = transcript.squeeze_challenge()

    theta = transcript.squeeze_challenge()

    lookups_permuted = [
        [lookup_read_permuted_commitments(transcript) for _ in cs.lookups]
        for _ in range(num_proofs)
    ]
    static_committed = [
        [static_lookup_read_committed(arg, transcript) for arg in cs.static_lookups]
        for _ in range(num_proofs)
    ]

    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    permutations_committed = [
        permutation_read_product_commitments(vk, transcript)
        for _ in range(num_proofs)
    ]
    lookups_committed = [
        [lookup_read_product_commitment(pm, transcript) for pm in per_circuit]
        for per_circuit in lookups_permuted
    ]
    static_log = [
        [static_lookup_read_log_derivative(c, transcript) for c in per_circuit]
        for per_circuit in static_committed
    ]

    vanishing = vanishing_read_before_y(transcript)
    y = transcript.squeeze_challenge()
    vanishing = vanishing_read_after_y(vanishing, vk, transcript)

    x = transcript.squeeze_challenge()
    xn = pow(x, n, P)

    # instance evals via barycentric l_i (no instance commitments for GWC)
    min_rot, max_rot = 0, 0
    for _, rot in cs.instance_queries:
        min_rot, max_rot = min(min_rot, rot), max(max_rot, rot)
    max_instance_len = max(
        (len(col) for inst in instances for col in inst), default=0)
    l_i_s = domain.l_i_range(
        x, xn, range(-max_rot, max_instance_len + abs(min_rot)))
    instance_evals = []
    for inst in instances:
        evals = []
        for column, rot in cs.instance_queries:
            col = inst[column.index]
            offset = max_rot - rot
            evals.append(sum(
                v * l for v, l in zip(col, l_i_s[offset:offset + len(col)])) % P)
        instance_evals.append(evals)

    advice_evals = [
        transcript.read_n_scalars(len(cs.advice_queries))
        for _ in range(num_proofs)
    ]
    fixed_evals = transcript.read_n_scalars(len(cs.fixed_queries))

    vanishing = vanishing_read_eval(vanishing, transcript)
    permutations_common = transcript.read_n_scalars(len(vk.permutation_commitments))
    permutations_evaluated = [
        permutation_verifier_evaluate(pc, transcript)
        for pc in permutations_committed
    ]
    lookups_evaluated = [
        [lookup_verifier_evaluate(lk, transcript) for lk in per_circuit]
        for per_circuit in lookups_committed
    ]
    static_evaluated = [
        [static_lookup_verifier_evaluate(sl, transcript) for sl in per_circuit]
        for per_circuit in static_log
    ]

    # ---- expected h(x) ---------------------------------------------------
    bf = cs.blinding_factors()
    l_evals = domain.l_i_range(x, xn, range(-(bf + 1), 1))
    assert len(l_evals) == 2 + bf
    l_last = l_evals[0]
    l_blind = sum(l_evals[1:1 + bf]) % P
    l_0 = l_evals[1 + bf]

    expressions: List[int] = []
    for proof_idx in range(num_proofs):
        a_evals = advice_evals[proof_idx]
        i_evals = instance_evals[proof_idx]

        def eval_expr(e):
            ops = {
                "const": lambda v: v,
                "selector": lambda q: (_ for _ in ()).throw(
                    ValueError("virtual selectors are removed during optimization")),
                "fixed": lambda q: fixed_evals[q.query_index],
                "advice": lambda q: a_evals[q.query_index],
                "instance": lambda q: i_evals[q.query_index],
                "challenge": lambda q: challenges[q.value],
                "neg": lambda a: (-a) % P,
                "sum": lambda a, b: (a + b) % P,
                "prod": lambda a, b: (a * b) % P,
                "scaled": lambda a, v: (a * v) % P,
            }
            return e.evaluate(ops)

        for gate in cs.gates:
            for poly in gate.polys:
                expressions.append(eval_expr(poly))
        expressions.extend(permutation_expressions(
            permutations_evaluated[proof_idx], vk, permutations_common,
            a_evals, fixed_evals, i_evals, l_0, l_last, l_blind, beta, gamma, x))
        for lk_ev, arg in zip(lookups_evaluated[proof_idx], cs.lookups):
            expressions.extend(lookup_expressions(
                lk_ev, arg, l_0, l_last, l_blind, theta, beta, gamma,
                a_evals, fixed_evals, i_evals, challenges))
        for sl_ev in static_evaluated[proof_idx]:
            expressions.extend(static_lookup_expressions(
                sl_ev, vk, l_last, l_blind, beta, x))

    vanishing = vanishing_verify(vanishing, expressions, y, xn)

    # ---- query set -------------------------------------------------------
    queries: List[VerifierQuery] = []
    for proof_idx in range(num_proofs):
        for query_index, (column, rot) in enumerate(cs.advice_queries):
            queries.append(VerifierQuery(
                domain.rotate_omega(x, rot),
                advice_commitments[proof_idx][column.index],
                advice_evals[proof_idx][query_index]))
        queries.extend(permutation_queries(permutations_evaluated[proof_idx], vk, x))
        for lk_ev in lookups_evaluated[proof_idx]:
            queries.extend(lookup_queries(lk_ev, vk, x))
        for sl_ev in static_evaluated[proof_idx]:
            queries.extend(static_lookup_queries(sl_ev, x))
    for query_index, (column, rot) in enumerate(cs.fixed_queries):
        queries.append(VerifierQuery(
            domain.rotate_omega(x, rot),
            vk.fixed_commitments[column.index],
            fixed_evals[query_index]))
    queries.extend(permutation_common_queries(vk, permutations_common, x))
    queries.extend(vanishing_queries(vanishing, x))

    if multiopen == "gwc":
        verify_fn = gwc_verify_proof
    elif multiopen == "shplonk":
        from ..poly.kzg.shplonk import shplonk_verify_proof
        verify_fn = shplonk_verify_proof
    else:
        raise ValueError(f"unknown multiopen scheme {multiopen!r}")
    strategy = strategy.process(
        lambda msm: verify_fn(params, queries, transcript, msm))

    batcher_challenge = transcript.squeeze_challenge()
    batcher = PairingBatcher(batcher_challenge)
    strategy.merge_with_pairing_batcher(batcher)
    for per_circuit in static_evaluated:
        for sl_ev in per_circuit:
            static_lookup_register_pairings(sl_ev, vk, params, batcher, beta, theta)
    return batcher
