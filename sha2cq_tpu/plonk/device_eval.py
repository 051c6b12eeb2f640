"""Device (TPU) h-polynomial evaluation — the prover's hot loop #1.

Mirrors plonk/evaluation.py's host `evaluate_h` (itself mirroring reference
evaluation.rs:285-551, same y-folding order) with every pointwise loop
replaced by fused jnp limb kernels over (16, extended_n) arrays.

The whole middle of the prover — basis conversions of every committed
polynomial, the h accumulation, division by the vanishing polynomial and the
inverse transform back to coefficients — is traced into ONE jitted function
per proving key (`build_h_fn`), so a proof issues a single device dispatch
for it.  That matters doubly on the axon-tunneled TPU, where each dispatch
pays a network round trip.

The prover uses this via create_proof(..., h_device=True); byte-identical
proofs vs the host path are pinned in tests.
"""
from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp

from ..fields import device as D
from ..fields import host as H
from ..fields.device import FR, NLIMB
from ..ops import ntt as NTT
from .circuit_ir import Expression

P = H.FR_MOD


def _const(v: int):
    return D.pack_scalar(v, FR).reshape(NLIMB, 1)


def build_h_fn(pk):
    """Returns a jitted fn(inputs) -> h coefficient array (16, n*quotient).

    inputs pytree (all Montgomery limb arrays):
      advice   : (16, C_a, n)   Lagrange advice columns
      instance : (16, C_i, n)   Lagrange instance columns
      z        : (16, S, n)     permutation grand products (Lagrange)
      lookups  : list of {"product","input","table"} (16, n) Lagrange/coeff?
                 -> Lagrange for product/input/table (converted inside)
      static   : list of {"b","f"} coefficient arrays (16, n)
      scalars  : {"y","beta","gamma","theta"} (16, 1) + "challenges" (16,ch,1)
    """
    domain = pk.vk.domain
    cs = pk.vk.cs
    size = domain.extended_n
    rot_scale = 1 << (domain.extended_k - domain.k)

    fixed_cosets = jnp.stack([D.pack(c, FR) for c in pk.fixed_cosets], axis=1) \
        if pk.fixed_cosets else None
    sigma_cosets = [D.pack(c, FR) for c in pk.permutation.cosets]
    l0 = D.pack(pk.l0, FR)
    l_last = D.pack(pk.l_last, FR)
    l_active = D.pack(pk.l_active_row, FR)
    vanishing_inv = jnp.asarray(
        __import__("numpy").tile(D.np_pack(domain.t_evaluations_inv, FR),
                                 size // len(domain.t_evaluations_inv)))
    coset_pts = NTT.powers_host(domain.extended_omega, size, P)
    zeta_times_coset = D.pack([H.FR_ZETA * w % P for w in coset_pts], FR)

    bf = cs.blinding_factors()
    chunk_len = max(pk.vk.cs_degree - 2, 1)
    columns = cs.permutation.columns
    num_sets = (len(columns) + chunk_len - 1) // chunk_len if columns else 0

    def roll(a, rot):
        return jnp.roll(a, -rot * rot_scale, axis=1)

    def h_fn(inputs):
        advice_lag = inputs["advice"]
        instance_lag = inputs["instance"]
        sc = inputs["scalars"]
        y, beta, gamma, theta = sc["y"], sc["beta"], sc["gamma"], sc["theta"]
        one = D.ones((size,), FR)

        # basis conversions, batched per group
        def to_coset_batch(lag):
            coeff = domain.lagrange_to_coeff_batch(lag)
            return domain.coeff_to_extended_batch(coeff)

        advice = to_coset_batch(advice_lag) if advice_lag.shape[1] else advice_lag
        instance = (to_coset_batch(instance_lag)
                    if instance_lag.shape[1] else instance_lag)

        def eval_expr(expr: Expression):
            ops = {
                "const": lambda v: _const(v),
                "selector": lambda e: (_ for _ in ()).throw(ValueError("selector")),
                "fixed": lambda e: roll(fixed_cosets[:, e.column.index], e.rotation),
                "advice": lambda e: roll(advice[:, e.column.index], e.rotation),
                "instance": lambda e: roll(instance[:, e.column.index], e.rotation),
                "challenge": lambda e: sc["challenges"][:, e.value],
                "neg": lambda a: D.neg(a, FR),
                "sum": lambda a, b: D.add(a, b, FR),
                "prod": lambda a, b: D.mont_mul(a, b, FR),
                "scaled": lambda a, v: D.mont_mul(a, _const(v), FR),
            }
            out = expr.evaluate(ops)
            if out.shape[-1] == 1:
                out = jnp.broadcast_to(out, (NLIMB, size))
            return out

        values = D.zeros((size,), FR)

        def fold(acc, term):
            return D.add(D.mont_mul(acc, y, FR), term, FR)

        for gate in cs.gates:
            for poly in gate.polys:
                values = fold(values, eval_expr(poly))

        # permutation
        if num_sets:
            z_cosets = to_coset_batch(inputs["z"])
            sets = [z_cosets[:, i] for i in range(num_sets)]
            first, last = sets[0], sets[-1]
            last_rot = -(bf + 1)

            values = fold(values, D.mont_mul(D.sub(one, first, FR), l0, FR))
            values = fold(values, D.mont_mul(
                D.sub(D.mont_mul(last, last, FR), last, FR), l_last, FR))
            for i in range(1, num_sets):
                values = fold(values, D.mont_mul(
                    D.sub(sets[i], roll(sets[i - 1], last_rot), FR), l0, FR))

            beta_terms = D.mont_mul(zeta_times_coset, beta, FR)

            def col_coset(column):
                if column.kind == "advice":
                    return advice[:, column.index]
                if column.kind == "fixed":
                    return fixed_cosets[:, column.index]
                return instance[:, column.index]

            for chunk_idx, z in enumerate(sets):
                cols = columns[chunk_idx * chunk_len:(chunk_idx + 1) * chunk_len]
                sigmas = sigma_cosets[chunk_idx * chunk_len:(chunk_idx + 1) * chunk_len]
                left = roll(z, 1)
                for column, sigma in zip(cols, sigmas):
                    vals = col_coset(column)
                    left = D.mont_mul(left, D.add(
                        D.add(vals, D.mont_mul(beta, sigma, FR), FR), gamma, FR), FR)
                right = z
                delta_pow = pow(H.FR_DELTA, chunk_idx * chunk_len, P)
                cur_delta = D.mont_mul(beta_terms, _const(delta_pow), FR)
                for column in cols:
                    vals = col_coset(column)
                    right = D.mont_mul(
                        right, D.add(D.add(vals, cur_delta, FR), gamma, FR), FR)
                    cur_delta = D.mont_mul(cur_delta, _const(H.FR_DELTA), FR)
                values = fold(values, D.mont_mul(
                    D.sub(left, right, FR), l_active, FR))

        # dynamic lookups
        if cs.lookups:
            lk_stack = to_coset_batch(inputs["lookups"])  # (16, 3*L, n->ext)
            for n_lk, arg in enumerate(cs.lookups):
                product = lk_stack[:, 3 * n_lk]
                inp = lk_stack[:, 3 * n_lk + 1]
                tab = lk_stack[:, 3 * n_lk + 2]
                comp_in = D.zeros((size,), FR)
                for e in arg.input_expressions:
                    comp_in = D.add(D.mont_mul(comp_in, theta, FR), eval_expr(e), FR)
                comp_tab = D.zeros((size,), FR)
                for e in arg.table_expressions:
                    comp_tab = D.add(D.mont_mul(comp_tab, theta, FR), eval_expr(e), FR)
                a_minus_s = D.sub(inp, tab, FR)
                values = fold(values, D.mont_mul(D.sub(one, product, FR), l0, FR))
                values = fold(values, D.mont_mul(
                    D.sub(D.mont_mul(product, product, FR), product, FR), l_last, FR))
                table_value = D.mont_mul(D.add(comp_in, beta, FR),
                                         D.add(comp_tab, gamma, FR), FR)
                left = D.mont_mul(D.mont_mul(roll(product, 1),
                                             D.add(inp, beta, FR), FR),
                                  D.add(tab, gamma, FR), FR)
                values = fold(values, D.mont_mul(
                    D.sub(left, D.mont_mul(product, table_value, FR), FR),
                    l_active, FR))
                values = fold(values, D.mont_mul(a_minus_s, l0, FR))
                values = fold(values, D.mont_mul(
                    D.mont_mul(a_minus_s, D.sub(inp, roll(inp, -1), FR), FR),
                    l_active, FR))

        # CQ static lookups (inputs arrive in coefficient form)
        if cs.static_lookups:
            st = inputs["static"]  # (16, 2*S, n) coeff [b, f] pairs
            st_cosets = domain.coeff_to_extended_batch(st)
            for i in range(len(cs.static_lookups)):
                b_coset = st_cosets[:, 2 * i]
                f_coset = st_cosets[:, 2 * i + 1]
                term = D.mont_mul(
                    b_coset, D.add(D.mont_mul(f_coset, l_active, FR), beta, FR), FR)
                values = fold(values, D.sub(term, one, FR))

        # quotient: divide by t(X) on the coset, back to coefficients
        values = D.mont_mul(values, vanishing_inv, FR)
        return domain.extended_to_coeff(values)

    return jax.jit(h_fn)


def get_h_fn(pk):
    fn = getattr(pk, "_h_fn", None)
    if fn is None:
        fn = build_h_fn(pk)
        pk._h_fn = fn
    return fn


def prepare_h_inputs(pk, advice_values, instance_values, challenges, y, beta,
                     gamma, theta, lookups, static_lookups, permutations,
                     mesh=None) -> Dict:
    """Pack per-proof witness state into the h_fn input pytree (host->device
    transfer happens once here).

    With a mesh, the (16, C, n) column stacks are placed sharded over the
    COLUMN axis (jax.sharding.NamedSharding) — jit then partitions the whole
    fused h computation across the mesh.  Column sharding keeps every NTT
    device-local (GSPMD partitioning of the butterfly gathers over the row
    axis measured 12+ minutes of compile) and matches the reference's
    per-column rayon parallelism (SURVEY §2.4); collectives appear only at
    the y-fold accumulation joins."""
    import numpy as np
    n = pk.vk.domain.n
    cs = pk.vk.cs

    sharding = None
    ndev = 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        sharding = NamedSharding(mesh, PartitionSpec(None, "x", None))
        ndev = mesh.devices.size

    def stack(cols):
        if not cols:
            out = jnp.zeros((NLIMB, 0, n), dtype=D.U32)
        else:
            out = jnp.stack([D.pack(c, FR) for c in cols], axis=1)
        if sharding is not None:
            # pad the column axis to a multiple of the mesh size (consumers
            # index columns by position, so zero columns at the end are inert)
            pad = (-out.shape[1]) % ndev
            if pad:
                out = jnp.concatenate(
                    [out, jnp.zeros((NLIMB, pad, n), dtype=D.U32)], axis=1)
            out = jax.device_put(out, sharding)
        return out

    z_cols = [s["lagrange"] for s in (permutations[0]["sets"] if permutations else [])]
    lk_cols = []
    for lk in (lookups[0] if lookups else []):
        lk_cols.extend([lk["product_lagrange"], lk["permuted_input"],
                        lk["permuted_table"]])
    st_cols = []
    for sl in (static_lookups[0] if static_lookups else []):
        st_cols.extend([sl["b"], sl["f"]])

    ch = (jnp.stack([_const(c) for c in challenges], axis=1)
          if challenges else jnp.zeros((NLIMB, 0, 1), dtype=D.U32))
    return {
        "advice": stack(advice_values[0]),
        "instance": stack(instance_values[0]),
        "z": stack(z_cols),
        "lookups": stack(lk_cols),
        "static": stack(st_cols),
        "scalars": {
            "y": _const(y), "beta": _const(beta), "gamma": _const(gamma),
            "theta": _const(theta), "challenges": ch,
        },
    }
