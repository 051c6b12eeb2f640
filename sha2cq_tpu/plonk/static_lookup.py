"""CQ static lookup argument prover + verifier.

Reference: plonk/static_lookup/{prover,verifier}.rs.  Proof cost per lookup:
7 G1 points (f, m, a, qa, a0, b0, p) + 3 scalars (b0(x), f(x), A(0)), plus
three pairing identities registered into the global PairingBatcher:
  (1) e(a,[T]_2) = e(qa,[Z_V]_2) * e(m - beta*a, [1]_2)
  (2) e(b0,[x^bound]_2) = e(p,[1]_2)
  (3) e(a - [A(0)]_1, [1]_2) = e(a0, [x]_2)

zk mode (cs.zk_static_lookups, off by default — the reference's CQ is
explicitly non-zk, prover.rs:122-124).  The committed functions are blinded
with multiples of the vanishing polynomials, so every identity above still
holds as a polynomial identity while the commitments/evals become
simulatable:

  table side (blinders r, c; V = table domain, Z_V = X^N - 1):
    A'  = A + r*Z_V          -> a'  = a  + r*[Z_V]_1
    M'  = M + c*Z_V          -> m'  = m  + c*[Z_V]_1
    Q'  = Q + r*(T~+beta)-c  -> qa' = qa + r*[T~]_1 + (r*beta-c)*[1]_1
    (A'-A'(0))/X             -> a0' = a0 + r*[x^{N-1}]_1
    A'(0) = A(0) - r         (Z_V(0) = -1)
  circuit side (H = proof domain, n rows, bf = blinding_factors()):
    B's (bf+1) inactive rows are RANDOM subject to sum = (bf+1)/beta - r*N,
    which keeps deg(B) <= n-1 (the b0 degree bound is untouched) and makes
    the existing sumcheck link n*B(0) = N*A(0)+(bf+1)/beta emit exactly the
    blinded A'(0).  The h gate term becomes l_active*(B*(f+beta)-1) — same
    degree as the reference's B*(l_active*f+beta)-1, identical on active
    rows, but imposing nothing on the blinding rows.

  [T~]_1 is the theta-compressed G1 commitment of the table polynomials
  (lazily one MSM per table, cached); [Z_V]_1/[x^{N-1}]_1 come from
  StaticTableConfig (requires the SRS's extra power [x^N]_1, TableSRS.g1_xn).
"""
from __future__ import annotations

from typing import Dict, List

from ..curves import host as CH
from ..fields.host import FR_MOD, batch_inv, inv_mod
from ..ops import msm as M
from ..poly import arith as A
from ..poly.kzg.gwc import ProverQuery, VerifierQuery
from .evaluation import evaluate_expr_lagrange

P = FR_MOD


def static_lookup_commit(arg, pk, params, theta, challenges, advice, fixed,
                         instance, transcript, rng=None) -> dict:
    """prover.rs:51-183: evaluate+compress inputs into f, count sparse
    multiplicities m, commit f (Lagrange MSM) and m (sparse over the table's
    Lagrange basis)."""
    tables = [pk.static_table_mapping[tid] for tid in arg.table_ids]
    assert all(t.size == tables[0].size for t in tables), \
        "Tables should all be of the same size"
    table_config = pk.static_table_configs[tables[0].size]

    from ..utils.profiling import profiler

    n = params.n
    with profiler.phase("eval_inputs"):
        evaluated = [
            evaluate_expr_lagrange(e, n, fixed, advice, instance, challenges)
            for e in arg.input_expressions
        ]
    from ..native_loader import fr_buf, fr_unbuf, get_lib, native_fr_fold_buf
    if get_lib() is not None and n >= 1024:
        # theta-compression as native Horner folds over (n, 4) u64 buffers
        import numpy as np
        acc = np.zeros((n, 4), dtype="<u8")
        for vals in evaluated:
            native_fr_fold_buf(acc, fr_buf([v % P for v in vals]), theta)
        f = fr_unbuf(acc)
    else:
        f = [0] * n
        for vals in evaluated:
            f = [(a * theta + v) % P for a, v in zip(f, vals)]

    bf = pk.vk.cs.blinding_factors()
    usable_rows = n - (bf + 1)
    m_sparse: Dict[int, int] = {}
    table_index_value_mappings: List[Dict[int, int]] = [dict() for _ in tables]
    prof_row = profiler.phase("m_rows")
    prof_row.__enter__()
    if all(t.value_index_mapping is not None for t in tables):
        # fast path: unique-valued tables, per-table index resolution
        for row in range(usable_rows):
            idx = None
            for t_i, (vals, table) in enumerate(zip(evaluated, tables)):
                fi = vals[row]
                index = table.value_index_mapping.get(fi)
                if index is None:
                    raise ValueError(f"{fi} not in table {arg.table_ids[t_i].name}")
                table_index_value_mappings[t_i][index] = fi
                if idx is not None and idx != index:
                    raise ValueError("Vector lookup must be on the same table row")
                idx = index
            m_sparse[idx] = m_sparse.get(idx, 0) + 1
    else:
        # joint-tuple resolution: some table has repeated values (e.g. the
        # SHA rot/maj column-tables); the row index is determined by the
        # tuple across all component tables.  The map is built once per
        # argument and cached on the pk (it has up to 2^18 entries and the
        # 32-bit SHA circuit runs ~40 lookup arguments per proof).
        cache = getattr(pk, "_joint_maps", None)
        if cache is None:
            cache = pk._joint_maps = {}
        key = tuple(id(t) for t in tables)
        joint = cache.get(key)
        if joint is None:
            joint = {}
            for i in range(tables[0].size):
                joint[tuple(t.values[i] for t in tables)] = i
            cache[key] = joint
        for row in range(usable_rows):
            key = tuple(vals[row] for vals in evaluated)
            index = joint.get(key)
            if index is None:
                raise ValueError(
                    f"{key} not a row of tables {[t.name for t in arg.table_ids]}")
            for t_i, fi in enumerate(key):
                table_index_value_mappings[t_i][index] = fi
            m_sparse[index] = m_sparse.get(index, 0) + 1

    prof_row.__exit__(None, None, None)
    zk = getattr(pk.vk.cs, "zk_static_lookups", False)
    zk_c = 0
    if zk:
        if getattr(table_config, "zv_g1", None) is None or rng is None:
            raise ValueError("zk static lookups need StaticTableConfig "
                             "zv_g1/xn1_g1 (TableSRS.g1_xn) and a prover rng")
        zk_c = rng.randrange(P)
    with profiler.phase("f_m_commits"):
        f_cm = params.commit_lagrange(f)
        idxs = sorted(m_sparse)
        m_cm = M.msm_indexed(
            [m_sparse[i] for i in idxs], idxs, table_config.g1_lagrange,
            packed=M.packed_basis(table_config, "_g1l_packed",
                                  table_config.g1_lagrange))
        if zk:
            m_cm = CH.g1_add(m_cm, CH.g1_mul(table_config.zv_g1, zk_c))
    transcript.write_point(f_cm)
    transcript.write_point(m_cm)
    return {
        "f": f,
        "m_sparse": m_sparse,
        "table_ids": arg.table_ids,
        "table_index_value_mappings": table_index_value_mappings,
        "zk_c": zk_c,
        "zk_rng": rng,
    }


def static_lookup_commit_log_derivatives(committed: dict, pk, params, domain,
                                         beta, theta, transcript) -> dict:
    """prover.rs:187-343."""
    tables = [pk.static_table_mapping[tid] for tid in committed["table_ids"]]
    table_config = pk.static_table_configs[tables[0].size]

    # A_i = m_i / (T_i + beta) over the distinct touched indices; the three
    # sparse commitments are Pippenger MSMs (native), with the theta
    # compression of the per-table quotients moved OUTSIDE the point sum:
    #   qa = sum_i A_i (sum_t theta^{T-1-t} qs_t[i])
    #      = sum_t theta^{T-1-t} (sum_i A_i qs_t[i])
    from ..utils.profiling import profiler

    idxs = sorted(committed["m_sparse"])
    with profiler.phase("a_vals"):
        tvs = []
        for index in idxs:
            tv = 0
            for t_i in range(len(tables)):
                tv = (tv * theta + committed["table_index_value_mappings"][t_i][index]) % P
            tvs.append(tv)
        denom_invs = batch_inv([(tv + beta) % P for tv in tvs], P)
        a_vals = [committed["m_sparse"][i] * dv % P for i, dv in zip(idxs, denom_invs)]
    zk = getattr(pk.vk.cs, "zk_static_lookups", False)
    zk_r = 0
    if zk:
        rng = committed["zk_rng"]
        zk_r = rng.randrange(P)
    with profiler.phase("a_commits"):
        a_cm = M.msm_indexed(
            a_vals, idxs, table_config.g1_lagrange,
            packed=M.packed_basis(table_config, "_g1l_packed",
                                  table_config.g1_lagrange))
        a0_cm = M.msm_indexed(
            a_vals, idxs, table_config.g_lagrange_opening_at_0,
            packed=M.packed_basis(table_config, "_g1l0_packed",
                                  table_config.g_lagrange_opening_at_0))
        qa_cm = None
        for table in tables:
            part = M.msm_indexed(
                a_vals, idxs, table.qs,
                packed=M.packed_basis(table, "_qs_packed", table.qs))
            qa_cm = CH.g1_add(CH.g1_mul(qa_cm, theta) if qa_cm else None, part)
        if zk:
            # a' = a + r[Z_V]; a0' = a0 + r[x^{N-1}];
            # qa' = qa + r[T~]_1 + (r*beta - c)[1]_1  (see module docstring)
            t1_bar = None
            for table in tables:
                t1 = getattr(table, "_t1_commit", None)
                if t1 is None:
                    t1 = M.msm(table.values, table_config.g1_lagrange,
                               packed=M.packed_basis(
                                   table_config, "_g1l_packed",
                                   table_config.g1_lagrange))
                    table._t1_commit = t1
                t1_bar = CH.g1_add(
                    CH.g1_mul(t1_bar, theta) if t1_bar else None, t1)
            a_cm = CH.g1_add(a_cm, CH.g1_mul(table_config.zv_g1, zk_r))
            a0_cm = CH.g1_add(a0_cm, CH.g1_mul(table_config.xn1_g1, zk_r))
            qa_cm = CH.g1_add(qa_cm, CH.g1_mul(t1_bar, zk_r))
            qa_cm = CH.g1_add(qa_cm, CH.g1_mul(
                CH.G1_GEN, (zk_r * beta - committed["zk_c"]) % P))

    bf = pk.vk.cs.blinding_factors()
    n = params.n
    usable_rows = n - (bf + 1)
    with profiler.phase("b_side"):
        beta_inv = inv_mod(beta, P)
        bs = batch_inv([(fi + beta) % P for fi in committed["f"][:usable_rows]], P)
        if zk:
            # random blinding rows constrained so the sumcheck link emits
            # the blinded A'(0) = A(0) - r: sum = (bf+1)/beta - r*N
            blind = [rng.randrange(P) for _ in range(bf)]
            total = ((bf + 1) * beta_inv - zk_r * tables[0].size) % P
            blind.append((total - sum(blind)) % P)
            bs += blind
        else:
            bs += [beta_inv] * (bf + 1)
        b_poly = domain.lagrange_to_coeff_host(bs)

    b0_coeffs = b_poly[1:]
    with profiler.phase("b0_p_commits"):
        p_cm = M.msm(b0_coeffs, pk.b0_g1_bound[: len(b0_coeffs)],
                     packed=M.packed_basis(pk, "_b0_bound_packed", pk.b0_g1_bound))
        b0_poly = b0_coeffs + [0]

        transcript.write_point(a_cm)
        transcript.write_point(qa_cm)
        transcript.write_point(a0_cm)
        b0_cm = params.commit(b0_poly)
        transcript.write_point(b0_cm)
        transcript.write_point(p_cm)

    # Sumcheck link: A(0) = (n * B(0) - (blinders+1) * beta^{-1}) / N
    b_at_zero = b_poly[0]
    n_table_inv = inv_mod(tables[0].size, P)
    a_at_zero = ((b_at_zero * n - (bf + 1) * beta_inv) % P) * n_table_inv % P

    with profiler.phase("f_ifft"):
        f_poly = domain.lagrange_to_coeff_host(committed["f"])
    return {"b": b_poly, "b0": b0_poly, "f": f_poly, "a_at_zero": a_at_zero}


def static_lookup_evaluate(constructed: dict, x: int, transcript) -> dict:
    b0_eval = A.eval_polynomial(constructed["b0"], x)
    f_eval = A.eval_polynomial(constructed["f"], x)
    transcript.write_scalar(b0_eval)
    transcript.write_scalar(f_eval)
    transcript.write_scalar(constructed["a_at_zero"])
    return constructed


def static_lookup_open(constructed: dict, x: int) -> List[ProverQuery]:
    return [
        ProverQuery(x, constructed["b0"]),
        ProverQuery(x, constructed["f"]),
    ]


# ------------------------------- verifier -----------------------------------

def static_lookup_read_committed(arg, transcript) -> dict:
    return {
        "f": transcript.read_point(),
        "m": transcript.read_point(),
        "table_ids": arg.table_ids,
    }


def static_lookup_read_log_derivative(committed: dict, transcript) -> dict:
    return {
        **committed,
        "a": transcript.read_point(),
        "qa": transcript.read_point(),
        "a0": transcript.read_point(),
        "b0": transcript.read_point(),
        "p": transcript.read_point(),
    }


def static_lookup_verifier_evaluate(committed: dict, transcript) -> dict:
    return {
        **committed,
        "b0_eval": transcript.read_scalar(),
        "f_eval": transcript.read_scalar(),
        "a_at_zero": transcript.read_scalar(),
    }


def static_lookup_register_pairings(ev: dict, vk, params, batcher, beta, theta) -> None:
    """verifier.rs:117-180: the three pairing identities, one add_pairing.

    The theta compression of the table commitments happens on the G1 side:
    e(a, sum_t theta^i [T_t]_2) = prod_t e(theta^i a, T_t), so each table
    contributes a cheap native G1 mul instead of a per-lookup G2 MSM (14
    G2 MSMs were ~50% of k=7 SHA verify), and the batcher merges the pairs
    of lookups that share a component table into one Miller-loop term."""
    tables = [vk.static_table_mapping[tid] for tid in ev["table_ids"]]
    # m - beta * a
    m_minus_beta_a = CH.g1_add(ev["m"], CH.g1_neg(CH.g1_mul(ev["a"], beta)))
    a_at_zero_cm = CH.g1_mul(CH.G1_GEN, ev["a_at_zero"])
    table_pairs = []
    for i, table in enumerate(tables):
        th = pow(theta, len(tables) - 1 - i, FR_MOD)
        table_pairs.append((CH.g1_mul(ev["a"], th), table.t))
    batcher.add_pairing(table_pairs + [
        (CH.g1_neg(ev["qa"]), tables[0].zv),
        (CH.g1_neg(m_minus_beta_a), params.g2),
        (ev["b0"], tables[0].x_b0_bound),
        (CH.g1_neg(ev["p"]), params.g2),
        (CH.g1_add(ev["a"], CH.g1_neg(a_at_zero_cm)), params.g2),
        (CH.g1_neg(ev["a0"]), params.s_g2),
    ])


def static_lookup_expressions(ev: dict, vk, l_last, l_blind, beta, x) -> List[int]:
    """verifier.rs:182-221: contribute B(x)(l_active f(x) + beta) - 1; in zk
    mode l_active(B(x)(f(x) + beta) - 1) (identical on active rows, nothing
    imposed on B's blinding rows — see module docstring)."""
    active_rows = (1 - (l_last + l_blind)) % P
    tables = [vk.static_table_mapping[tid] for tid in ev["table_ids"]]
    # NOTE: reference uses the SRS g1 length stored in committed table `size`;
    # the actual table row count equals the g1 length of its SRS.
    table_size = tables[0].size
    bf = vk.cs.blinding_factors()
    beta_inv = inv_mod(beta, P)
    n_inv = inv_mod(vk.domain.n, P)
    b_at_zero = ((table_size * ev["a_at_zero"] + (bf + 1) * beta_inv) % P) * n_inv % P
    b_eval = (ev["b0_eval"] * x + b_at_zero) % P
    if getattr(vk.cs, "zk_static_lookups", False):
        return [active_rows * (b_eval * ((ev["f_eval"] + beta) % P) - 1) % P]
    return [(b_eval * ((active_rows * ev["f_eval"] + beta) % P) - 1) % P]


def static_lookup_queries(ev: dict, x: int) -> List[VerifierQuery]:
    return [
        VerifierQuery(x, ev["b0"], ev["b0_eval"]),
        VerifierQuery(x, ev["f"], ev["f_eval"]),
    ]
