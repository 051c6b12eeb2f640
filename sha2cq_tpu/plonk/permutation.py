"""Permutation (copy-constraint) argument prover + verifier.

Reference: plonk/permutation/{prover,verifier}.rs.  Columns are chunked by
(cs_degree - 2); each chunk gets a running-product polynomial Z chained
through `last_z`; Z is opened at x, omega*x and (for all but the last set)
omega^{-(blinders+1)} * x.
"""
from __future__ import annotations

from typing import List

from ..fields.host import FR_DELTA, FR_MOD, batch_inv
from ..poly.kzg.gwc import ProverQuery, VerifierQuery

P = FR_MOD


def permutation_commit(pk, params, advice, fixed, instance, beta, gamma, rng,
                       transcript) -> dict:
    """prover.rs:47-201; returns {"sets": [{lagrange, poly, coset}...]}."""
    cs = pk.vk.cs
    domain = pk.vk.domain
    n = params.n
    chunk_len = pk.vk.cs_degree - 2
    blinding_factors = cs.blinding_factors()
    columns = cs.permutation.columns
    if not columns:
        return {"sets": []}

    def col_values(column):
        return {"advice": advice, "fixed": fixed, "instance": instance}[column.kind][column.index]

    from ..native_loader import get_lib
    if get_lib() is not None and n >= 1024:
        return _permutation_commit_native(
            pk, params, col_values, columns, chunk_len, blinding_factors,
            beta, gamma, rng, transcript)

    omega = domain.omega
    deltaomega_base = 1
    last_z = 1
    sets = []
    for chunk_start in range(0, len(columns), chunk_len):
        cols = columns[chunk_start:chunk_start + chunk_len]
        sigmas = pk.permutation.permutations[chunk_start:chunk_start + chunk_len]

        modified = [1] * n
        for column, sigma in zip(cols, sigmas):
            vals = col_values(column)
            for i in range(n):
                modified[i] = modified[i] * ((beta * sigma[i] + gamma + vals[i]) % P) % P
        modified = batch_inv(modified, P)
        for column in cols:
            vals = col_values(column)
            d = deltaomega_base
            for i in range(n):
                modified[i] = modified[i] * ((d * beta + gamma + vals[i]) % P) % P
                d = d * omega % P
            deltaomega_base = deltaomega_base * FR_DELTA % P

        z = [last_z]
        for row in range(1, n):
            z.append(z[row - 1] * modified[row - 1] % P)
        for row in range(n - blinding_factors, n):
            z[row] = rng.randrange(P)
        last_z = z[n - (blinding_factors + 1)]

        commitment = params.commit_lagrange(z)
        poly = domain.lagrange_to_coeff_host(z)
        transcript.write_point(commitment)
        # "coset" is computed lazily by the host evaluator (the device
        # h-path consumes only the lagrange values)
        sets.append({"lagrange": z, "poly": poly})
    return {"sets": sets}


def _permutation_commit_native(pk, params, col_values, columns, chunk_len,
                               blinding_factors, beta, gamma, rng,
                               transcript) -> dict:
    """Buffer/native grand products: the per-row Python loops above are
    ~0.5 s of a SHA-256 prove; here each pass is one C call
    (fr_perm_mul_acc / _geo / fr_prefix_prod), bit-identical."""
    import numpy as np

    from ..native_loader import (fr_buf, get_lib, native_fr_batch_inv_buf,
                                 native_fr_ntt_multi, _u64p)
    from ..ops.ntt import _host_twiddle_buf

    lib = get_lib()
    domain = pk.vk.domain
    n = params.n

    def col_buf(column):
        # fixed columns are pk-stable: cache their limb buffers; advice and
        # instance values change per proof and pack fresh (~1 ms/column)
        vals = col_values(column)
        if column.kind == "fixed":
            cache = pk.__dict__.setdefault("_perm_fixed_bufs", {})
            buf = cache.get(column.index)
            if buf is None:
                buf = cache[column.index] = fr_buf([v % P for v in vals])
            return buf
        return fr_buf([v % P for v in vals])

    sigma_bufs = pk.__dict__.get("_perm_sigma_bufs")
    if sigma_bufs is None:
        sigma_bufs = pk.__dict__["_perm_sigma_bufs"] = [
            fr_buf(s) for s in pk.permutation.permutations]

    one = fr_buf([1])[0]
    beta_b, gamma_b = fr_buf([beta % P]), fr_buf([gamma % P])
    omega_b = fr_buf([domain.omega])
    deltaomega_base = 1
    last_z = 1
    sets = []
    z_bufs = []
    for chunk_start in range(0, len(columns), chunk_len):
        cols = columns[chunk_start:chunk_start + chunk_len]
        modified = np.tile(one, (n, 1))
        for j, column in enumerate(cols):
            lib.fr_perm_mul_acc(
                _u64p(modified), _u64p(sigma_bufs[chunk_start + j]),
                _u64p(col_buf(column)), _u64p(beta_b), _u64p(gamma_b),
                n)
        native_fr_batch_inv_buf(modified)
        for column in cols:
            lib.fr_perm_mul_acc_geo(
                _u64p(modified), _u64p(col_buf(column)), _u64p(beta_b),
                _u64p(gamma_b), _u64p(fr_buf([deltaomega_base])),
                _u64p(omega_b), n)
            deltaomega_base = deltaomega_base * FR_DELTA % P

        z = np.empty((n, 4), dtype="<u8")
        lib.fr_prefix_prod(_u64p(modified), _u64p(fr_buf([last_z])),
                           _u64p(z), n)
        blind = fr_buf([rng.randrange(P) for _ in range(blinding_factors)])
        z[n - blinding_factors:] = blind
        last_z = int.from_bytes(z[n - (blinding_factors + 1)].tobytes(),
                                "little")
        z_bufs.append(z)

    cms = params.commit_lagrange_many(z_bufs)
    polys = [z.copy() for z in z_bufs]
    omega_inv = pow(domain.omega, P - 2, P)
    native_fr_ntt_multi(polys, _host_twiddle_buf(omega_inv, n, P), domain.k,
                        ninv=pow(n, P - 2, P))
    for cm, z, poly in zip(cms, z_bufs, polys):
        transcript.write_point(cm)
        sets.append({"lagrange": z, "poly": poly})
    return {"sets": sets}


def permutation_evaluate(committed: dict, pk, x: int, transcript) -> None:
    """prover.rs:236-283: write z(x), z(wx) [, z(w^last x)] per set."""
    from ..poly import arith as A
    domain = pk.vk.domain
    bf = pk.vk.cs.blinding_factors()
    sets = committed["sets"]
    for idx, s in enumerate(sets):
        transcript.write_scalar(A.eval_polynomial(s["poly"], x))
        transcript.write_scalar(A.eval_polynomial(s["poly"], domain.rotate_omega(x, 1)))
        if idx < len(sets) - 1:
            transcript.write_scalar(
                A.eval_polynomial(s["poly"], domain.rotate_omega(x, -(bf + 1))))


def permutation_open(committed: dict, pk, x: int) -> List[ProverQuery]:
    domain = pk.vk.domain
    bf = pk.vk.cs.blinding_factors()
    x_next = domain.rotate_omega(x, 1)
    x_last = domain.rotate_omega(x, -(bf + 1))
    out = []
    for s in committed["sets"]:
        out.append(ProverQuery(x, s["poly"]))
        out.append(ProverQuery(x_next, s["poly"]))
    for s in committed["sets"][:-1]:
        out.append(ProverQuery(x_last, s["poly"]))
    return out


def permutation_pk_open(pk, x: int) -> List[ProverQuery]:
    """Common sigma polys opened at x (prover.rs:216-225)."""
    return [ProverQuery(x, poly) for poly in pk.permutation.polys]


def permutation_pk_evaluate(pk, x: int, transcript) -> None:
    from ..poly import arith as A
    for poly in pk.permutation.polys:
        transcript.write_scalar(A.eval_polynomial(poly, x))


# ------------------------------- verifier -----------------------------------

def permutation_read_product_commitments(vk, transcript) -> List:
    chunk_len = vk.cs_degree - 2
    columns = vk.cs.permutation.columns
    num_sets = (len(columns) + chunk_len - 1) // chunk_len if columns else 0
    return [transcript.read_point() for _ in range(num_sets)]


def permutation_verifier_evaluate(product_commitments: List, transcript) -> List[dict]:
    sets = []
    for i, c in enumerate(product_commitments):
        ev = transcript.read_scalar()
        nxt = transcript.read_scalar()
        last = transcript.read_scalar() if i < len(product_commitments) - 1 else None
        sets.append({"commitment": c, "eval": ev, "next_eval": nxt, "last_eval": last})
    return sets


def permutation_expressions(sets: List[dict], vk, common_evals: List[int],
                            advice_evals, fixed_evals, instance_evals,
                            l_0, l_last, l_blind, beta, gamma, x) -> List[int]:
    """verifier.rs expressions, in reference order."""
    cs = vk.cs
    chunk_len = vk.cs_degree - 2
    out = []
    if sets:
        out.append(l_0 * (1 - sets[0]["eval"]) % P)
        out.append((sets[-1]["eval"] * sets[-1]["eval"] - sets[-1]["eval"]) * l_last % P)
        for i in range(1, len(sets)):
            out.append((sets[i]["eval"] - sets[i - 1]["last_eval"]) * l_0 % P)

        def eval_of(column):
            idx = cs.get_any_query_index(column, 0)
            return {"advice": advice_evals, "fixed": fixed_evals,
                    "instance": instance_evals}[column.kind][idx]

        columns = cs.permutation.columns
        for chunk_index, chunk_start in enumerate(range(0, len(columns), chunk_len)):
            cols = columns[chunk_start:chunk_start + chunk_len]
            sigma_evals = common_evals[chunk_start:chunk_start + chunk_len]
            s = sets[chunk_index]
            left = s["next_eval"]
            for column, sig in zip(cols, sigma_evals):
                left = left * ((eval_of(column) + beta * sig + gamma) % P) % P
            right = s["eval"]
            current_delta = beta * x % P * pow(FR_DELTA, chunk_index * chunk_len, P) % P
            for column in cols:
                right = right * ((eval_of(column) + current_delta + gamma) % P) % P
                current_delta = current_delta * FR_DELTA % P
            out.append((left - right) * ((1 - (l_last + l_blind)) % P) % P)
    return out


def permutation_queries(sets: List[dict], vk, x: int) -> List[VerifierQuery]:
    bf = vk.cs.blinding_factors()
    x_next = vk.domain.rotate_omega(x, 1)
    x_last = vk.domain.rotate_omega(x, -(bf + 1))
    out = []
    for s in sets:
        out.append(VerifierQuery(x, s["commitment"], s["eval"]))
        out.append(VerifierQuery(x_next, s["commitment"], s["next_eval"]))
    for s in sets[:-1]:
        out.append(VerifierQuery(x_last, s["commitment"], s["last_eval"]))
    return out


def permutation_common_queries(vk, common_evals: List[int], x: int) -> List[VerifierQuery]:
    return [VerifierQuery(x, c, e)
            for c, e in zip(vk.permutation_commitments, common_evals)]
