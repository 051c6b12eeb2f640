"""GWC (Gabizon-Williamson-Ciobotaru) multipoint opening argument.

Mirrors reference poly/kzg/multiopen/gwc/{prover,verifier}.rs and the
query-grouping in gwc.rs:36-61: queries are grouped by opening point in
first-appearance order; per point the prover commits one quotient
W = [(sum_i v^i p_i(X) - sum_i v^i e_i) / (X - z)]_1 and the verifier folds
everything into the DualMSM with challenges v (within a point) and u (across
points).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

from ...curves import host as CH
from ...fields.host import FR_MOD
from ...utils.transcript import Blake2bRead, Blake2bWrite
from .. import arith as A
from .msm_accum import DualMSM, MSMKZG

P = FR_MOD


@dataclass
class ProverQuery:
    point: int
    poly: Sequence[int]       # coefficient form
    # blind carried for API parity; KZG commitments here are unblinded
    # (reference uses Blind::default() for GWC, gwc/prover.rs:84)


@dataclass
class VerifierQuery:
    point: int
    commitment: Union[CH.G1Affine, MSMKZG]  # plain commitment or lazy MSM
    eval: int


def _group_by_point(queries):
    groups: List[tuple] = []  # (point, [queries])
    for q in queries:
        for g in groups:
            if g[0] == q.point:
                g[1].append(q)
                break
        else:
            groups.append((q.point, [q]))
    return groups


def gwc_create_proof(params, queries: Sequence[ProverQuery], transcript: Blake2bWrite) -> None:
    v = transcript.squeeze_challenge()
    from ...native_loader import get_lib
    if get_lib() is not None and max(len(q.poly) for q in queries) >= 512:
        _gwc_create_proof_native(params, queries, transcript, v)
        return
    for z, qs in _group_by_point(queries):
        poly_batch: List[int] = []
        eval_batch = 0
        power = 1
        for q in qs:
            poly = A.as_coeff_list(q.poly)
            poly_batch = A.poly_add(poly_batch, A.poly_scale(poly, power))
            eval_batch = (eval_batch + A.eval_polynomial(poly, z) * power) % P
            power = power * v % P
        poly_batch = list(poly_batch)
        poly_batch[0] = (poly_batch[0] - eval_batch) % P
        witness = A.kate_division(poly_batch, z)
        # the zero quotient commits to the identity; our transcript accepts
        # it (all-zero encoding), so degenerate-but-valid openings work
        transcript.write_point(params.commit(witness))


def _gwc_create_proof_native(params, queries, transcript, v: int) -> None:
    """Native-kernel path: the per-point poly batch is a Horner fold
    (acc = acc*v + poly) over resident (n, 4) u64 buffers, the batched eval
    one native Horner, the quotient a native kate division — the pure-Python
    version was ~an eighth of flagship prove wall-clock."""
    import numpy as np
    from ...native_loader import (fr_buf, fr_unbuf, native_fr_eval_buf,
                                  native_fr_fold_buf, native_fr_kate_buf)
    buf_cache: dict = {}

    def buf_of(q):
        if isinstance(q.poly, np.ndarray):
            return q.poly          # already a resident (n, 4) limb buffer
        b = buf_cache.get(id(q.poly))
        if b is None:
            b = fr_buf([c % P for c in q.poly])
            buf_cache[id(q.poly)] = b
        return b

    from ...ops import msm as M
    from ...utils.profiling import profiler
    witnesses = []
    for z, qs in _group_by_point(queries):
        nmax = max(len(q.poly) for q in qs)
        acc = np.zeros((nmax, 4), dtype="<u8")
        # first query takes v^0: Horner over the group in reverse
        with profiler.phase("gwc_fold"):
            for q in reversed(qs):
                native_fr_fold_buf(acc, buf_of(q), v)
            eval_batch = native_fr_eval_buf(acc, z)
        c0 = int.from_bytes(acc[0].tobytes(), "little")
        acc[0] = np.frombuffer(
            ((c0 - eval_batch) % P).to_bytes(32, "little"), dtype="<u8")
        with profiler.phase("gwc_kate"):
            witnesses.append(native_fr_kate_buf(acc, z))
    # one W commitment per opening point, all in ONE multi-MSM call
    # (SHA-256's rotation set opens at ~19 distinct points); transcript
    # order is unchanged — every W is written after the single v squeeze
    with profiler.phase("gwc_commit"):
        packed = M.packed_basis(params, "_g_packed", params.g)
        cms = M.msm_multi([(packed, None, w, params.g) for w in witnesses])
        for cm in cms:
            transcript.write_point(cm)


def gwc_verify_proof(
    params,
    queries: Sequence[VerifierQuery],
    transcript: Blake2bRead,
    msm_accumulator: DualMSM,
) -> DualMSM:
    v = transcript.squeeze_challenge()
    groups = _group_by_point(queries)
    w = [transcript.read_point() for _ in groups]
    u = transcript.squeeze_challenge()

    commitment_multi = MSMKZG()
    eval_multi = 0
    witness = MSMKZG()
    witness_with_aux = MSMKZG()

    power_of_u = 1
    for (z, qs), wi in zip(groups, w):
        commitment_batch = MSMKZG()
        eval_batch = 0
        power_of_v = 1
        for q in qs:
            if isinstance(q.commitment, MSMKZG):
                m = q.commitment.clone()
                m.scale(power_of_v)
                commitment_batch.add_msm(m)
            else:
                commitment_batch.append_term(power_of_v, q.commitment)
            eval_batch = (eval_batch + power_of_v * q.eval) % P
            power_of_v = power_of_v * v % P
        commitment_batch.scale(power_of_u)
        commitment_multi.add_msm(commitment_batch)
        eval_multi = (eval_multi + power_of_u * eval_batch) % P
        witness_with_aux.append_term(power_of_u * z % P, wi)
        witness.append_term(power_of_u, wi)
        power_of_u = power_of_u * u % P

    msm_accumulator.left.add_msm(witness)
    msm_accumulator.right.add_msm(witness_with_aux)
    msm_accumulator.right.add_msm(commitment_multi)
    msm_accumulator.right.append_term((-eval_multi) % P, params.g[0])
    return msm_accumulator
