"""SHPLONK multipoint opening argument.

Mirrors reference poly/kzg/multiopen/shplonk{.rs,/prover.rs,/verifier.rs}:
commitments are grouped by their *rotation set* (the set of points each is
opened at); per set, numerators P_ij - R_ij (R = low-degree interpolant of
the claimed evals) are y-combined and divided by the set's vanishing poly;
the v-combined quotient is committed (h1); after u, a linearisation poly is
built, divided by (X - u), normalized by the first set's difference
vanishing eval, and committed (h2).  Proof = exactly 2 G1 points regardless
of the number of openings.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

from ...fields.host import FR_MOD, inv_mod
from .. import arith as A
from .gwc import ProverQuery, VerifierQuery
from .msm_accum import DualMSM, MSMKZG

P = FR_MOD


def _eval_vanishing(roots: Sequence[int], u: int) -> int:
    acc = 1
    for r in roots:
        acc = acc * ((u - r) % P) % P
    return acc


def _commitment_key(c):
    """Group queries by *object identity*, mirroring the reference's pointer
    identity on both prover and verifier (query.rs CommitmentReference).

    Both sides reuse one object per logical column across its opening points
    (e.g. ``ev["product_commitment"]`` at x and ωx), so identity groups
    multi-point openings correctly while two distinct columns that happen to
    share a commitment *value* (duplicate fixed columns) stay separate on both
    sides — keying by value merged them only on the verifier side, making
    honest proofs fail to verify."""
    return ("obj", id(c))


def _intermediate_sets(queries):
    """-> (rotation_sets, super_point_set); each rotation set =
    {"points": [..], "entries": [(commitment_or_poly, [evals in point order])]}"""
    comm_points: List[Tuple[object, List[int]]] = []  # ordered, unique points
    evals: Dict[Tuple, Dict[int, object]] = {}
    super_points: List[int] = []
    for q in queries:
        key = _commitment_key(q.commitment if isinstance(q, VerifierQuery) else q.poly)
        if q.point not in super_points:
            super_points.append(q.point)
        for ck, pts in comm_points:
            if _commitment_key(ck) == key:
                if q.point not in pts:
                    pts.append(q.point)
                break
        else:
            comm_points.append(
                (q.commitment if isinstance(q, VerifierQuery) else q.poly, [q.point]))
        evals.setdefault(key, {})[q.point] = q

    # group commitments by rotation set (as a set)
    sets: List[dict] = []
    for comm, pts in comm_points:
        key_set = frozenset(pts)
        for s in sets:
            if frozenset(s["points"]) == key_set:
                s["entries"].append(comm)
                break
        else:
            sets.append({"points": list(pts), "entries": [comm]})
    return sets, super_points, evals


def shplonk_create_proof(params, queries: Sequence[ProverQuery], transcript) -> None:
    y = transcript.squeeze_challenge()
    from ...native_loader import get_lib
    if get_lib() is not None and max(len(q.poly) for q in queries) >= 512:
        _shplonk_create_proof_native(params, queries, transcript, y)
        return
    _shplonk_create_proof_python(params, queries, transcript, y)


def _shplonk_create_proof_python(params, queries, transcript, y: int) -> None:
    # buffer-form polys (see arith.as_coeff_list) -> lists once up front;
    # the set machinery below keys and folds them as plain int lists.  The
    # id-keyed cache preserves poly identity across queries (a poly opened
    # at several points must stay ONE set entry).
    _lists: dict = {}

    def _as_list(p):
        got = _lists.get(id(p))
        if got is None:
            got = _lists[id(p)] = A.as_coeff_list(p)
        return got

    queries = [q if isinstance(q, VerifierQuery)
               else ProverQuery(q.point, _as_list(q.poly)) for q in queries]
    sets, super_points, _ = _intermediate_sets(queries)

    # evals per (poly, point)
    def poly_eval(poly, pt):
        return A.eval_polynomial(poly, pt)

    # low-degree equivalents per set entry
    for s in sets:
        s["ldes"] = []
        for poly in s["entries"]:
            evals = [poly_eval(poly, pt) for pt in s["points"]]
            s["ldes"].append(A.lagrange_interpolate(s["points"], evals))

    v = transcript.squeeze_challenge()

    def div_by_roots(poly, roots):
        out = list(poly)
        for r in roots:
            out = A.kate_division(out, r)
        return out

    # h_x = sum_i v^i * [ (sum_j y^j (P_ij - R_ij)) / Z_i ]
    h_x: List[int] = []
    pv = 1
    for s in sets:
        n_x: List[int] = []
        py = 1
        for poly, lde in zip(s["entries"], s["ldes"]):
            diff = A.poly_add(poly, A.poly_scale(lde, P - 1))
            n_x = A.poly_add(n_x, A.poly_scale(diff, py))
            py = py * y % P
        q_i = div_by_roots(n_x, s["points"])
        h_x = A.poly_add(h_x, A.poly_scale(q_i, pv))
        pv = pv * v % P
    h_x = (h_x + [0] * params.n)[: params.n]
    transcript.write_point(params.commit(h_x))

    u = transcript.squeeze_challenge()

    # linearisation
    l_x: List[int] = []
    z_diffs = []
    pv = 1
    for s in sets:
        diffs = [pt for pt in super_points if pt not in s["points"]]
        z_i = _eval_vanishing(diffs, u)
        z_diffs.append(z_i)
        inner: List[int] = []
        py = 1
        for poly, lde in zip(s["entries"], s["ldes"]):
            r_eval = A.eval_polynomial(lde, u)
            term = list(poly)
            term[0] = (term[0] - r_eval) % P
            inner = A.poly_add(inner, A.poly_scale(term, py))
            py = py * y % P
        l_x = A.poly_add(l_x, A.poly_scale(inner, z_i * pv % P))
        pv = pv * v % P

    zt_eval = _eval_vanishing(super_points, u)
    l_x = A.poly_add(l_x, A.poly_scale(h_x, (P - zt_eval) % P))
    assert A.eval_polynomial(l_x, u) == 0, "SHPLONK linearisation sanity"
    h2 = A.kate_division(l_x, u)
    z0_diff_inv = inv_mod(z_diffs[0], P)
    h2 = A.poly_scale(h2, z0_diff_inv)
    transcript.write_point(params.commit(h2))


def _shplonk_create_proof_native(params, queries, transcript, y: int) -> None:
    """Native-kernel SHPLONK prover: every poly fold is a Horner
    native_fr_fold_buf over resident (n,4) u64 limb buffers, divisions are
    native kate kernels, and both commitments ride commit_coeff_buf — the
    pure-Python fold cost ~6 s on the SHA-256 k=13 flagship (~180 polys
    x 8192 coeffs of bigint poly_add/poly_scale), vs ~0.3 s here.
    Transcript bytes are identical to the list path (pinned in
    tests/test_kzg_multiopen.py)."""
    import numpy as np

    from ...native_loader import (fr_buf, native_fr_eval_buf,
                                  native_fr_fold_buf, native_fr_kate_buf,
                                  native_fr_scale_buf)

    buf_cache: dict = {}

    def buf_of(p):
        if isinstance(p, np.ndarray):
            return p
        b = buf_cache.get(id(p))
        if b is None:
            b = buf_cache[id(p)] = fr_buf([c % P for c in p])
        return b

    def sub_low_coeffs(acc, small):
        """acc[0..len(small)] -= small (tiny interpolants; per-coeff ints)."""
        for d, coef in enumerate(small):
            cur = int.from_bytes(acc[d].tobytes(), "little")
            acc[d] = np.frombuffer(
                ((cur - coef) % P).to_bytes(32, "little"), dtype="<u8")

    # grouping runs on the ORIGINAL query objects: _commitment_key is
    # id-based, and the prover reuses one poly object per logical column
    # across its opening points (same invariant the list path preserves
    # with its id-keyed cache)
    sets, super_points, _ = _intermediate_sets(queries)

    for s in sets:
        s["ldes"] = []
        for poly in s["entries"]:
            evals = [native_fr_eval_buf(buf_of(poly), pt)
                     for pt in s["points"]]
            s["ldes"].append(A.lagrange_interpolate(s["points"], evals))

    v = transcript.squeeze_challenge()

    # h_x = sum_i v^i * [ (sum_j y^j (P_ij - R_ij)) / Z_i ]
    q_bufs = []
    for s in sets:
        nmax = max(buf_of(p).shape[0] for p in s["entries"])
        acc = np.zeros((nmax, 4), dtype="<u8")
        for poly in reversed(s["entries"]):           # Horner in y
            native_fr_fold_buf(acc, buf_of(poly), y)
        r_fold: List[int] = []
        for lde in reversed(s["ldes"]):
            r_fold = A.poly_add(A.poly_scale(r_fold, y), lde)
        sub_low_coeffs(acc, r_fold)
        for r in s["points"]:
            acc = native_fr_kate_buf(acc, r)
        q_bufs.append(acc)
    h_x = np.zeros((params.n, 4), dtype="<u8")
    for q in reversed(q_bufs):                        # Horner in v
        native_fr_fold_buf(h_x, q, v)
    transcript.write_point(params.commit_coeff_buf(h_x))

    u = transcript.squeeze_challenge()

    # linearisation: l_x = sum_i (z_i v^i) (sum_j y^j (P_ij - r_ij(u)))
    #                      - Z_T(u) h_x
    l_x = np.zeros((params.n, 4), dtype="<u8")
    z_diffs = []
    pv = 1
    for s in sets:
        diffs = [pt for pt in super_points if pt not in s["points"]]
        z_i = _eval_vanishing(diffs, u)
        z_diffs.append(z_i)
        nmax = max(buf_of(p).shape[0] for p in s["entries"])
        inner = np.zeros((nmax, 4), dtype="<u8")
        r_eval = 0
        for poly in reversed(s["entries"]):
            native_fr_fold_buf(inner, buf_of(poly), y)
        for lde in reversed(s["ldes"]):
            r_eval = (r_eval * y + A.eval_polynomial(lde, u)) % P
        sub_low_coeffs(inner, [r_eval])
        native_fr_scale_buf(inner, z_i * pv % P)
        native_fr_fold_buf(l_x, inner, 1)             # l_x += inner
        pv = pv * v % P

    zt_eval = _eval_vanishing(super_points, u)
    hx_scaled = h_x.copy()
    native_fr_scale_buf(hx_scaled, (P - zt_eval) % P)
    native_fr_fold_buf(l_x, hx_scaled, 1)
    assert native_fr_eval_buf(l_x, u) == 0, "SHPLONK linearisation sanity"
    h2 = native_fr_kate_buf(l_x, u)
    native_fr_scale_buf(h2, inv_mod(z_diffs[0], P))
    transcript.write_point(params.commit_coeff_buf(h2))


def shplonk_verify_proof(params, queries: Sequence[VerifierQuery], transcript,
                         msm_accumulator: DualMSM) -> DualMSM:
    sets, super_points, evals = _intermediate_sets(queries)
    y = transcript.squeeze_challenge()
    v = transcript.squeeze_challenge()
    h1 = transcript.read_point()
    u = transcript.squeeze_challenge()
    h2 = transcript.read_point()

    z_0 = 0
    z_0_diff_inverse = 0
    outer = MSMKZG()
    r_outer_acc = 0
    pv = 1
    for i, s in enumerate(sets):
        diffs = [pt for pt in super_points if pt not in s["points"]]
        z_diff_i = _eval_vanishing(diffs, u)
        if i == 0:
            z_0 = _eval_vanishing(s["points"], u)
            z_0_diff_inverse = inv_mod(z_diff_i, P)
            z_diff_i = 1
        else:
            z_diff_i = z_diff_i * z_0_diff_inverse % P

        inner = MSMKZG()
        r_inner = 0
        py = 1
        for comm in s["entries"]:
            key = _commitment_key(comm)
            point_evals = [evals[key][pt].eval for pt in s["points"]]
            r_x = A.lagrange_interpolate(s["points"], point_evals)
            r_inner = (r_inner + py * A.eval_polynomial(r_x, u)) % P
            if isinstance(comm, MSMKZG):
                m = comm.clone()
                m.scale(py)
                inner.add_msm(m)
            else:
                inner.append_term(py, comm)
            py = py * y % P
        inner.scale(pv * z_diff_i % P)
        outer.add_msm(inner)
        r_outer_acc = (r_outer_acc + pv * r_inner % P * z_diff_i) % P
        pv = pv * v % P

    outer.append_term((-r_outer_acc) % P, params.g[0])
    outer.append_term((-z_0) % P, h1)
    outer.append_term(u, h2)

    msm_accumulator.left.append_term(1, h2)
    msm_accumulator.right.add_msm(outer)
    return msm_accumulator
