"""Preprocessing for the SHA2-on-CQ circuit: master TableSRS, the nine
column-table families, and per-size StaticTableConfigs.

All tables are committed against one master SRS (sized to the largest table)
so every lookup argument shares the b0 degree-bound basis; each distinct
table size gets its own Lagrange/opening-at-0 config (keygen_pk's
static_table_configs map, reference my_test.rs:197-205 generalized to many
sizes).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

from ...curves import host as CH
from ...fields import host as H
from ...plonk.static_tables import StaticTable, StaticTableConfig, StaticTableValues
from ...poly.kzg.params import TableSRS, _lagrange_basis_from_s, _omega_for_k
from .tables import (Limbs, create_ch_table, create_decomposition_table,
                     create_limb_ch_table, create_limb_maj_table,
                     create_maj_table, create_rot0_table, create_rot1_table,
                     create_ssig0_table, create_ssig1_table)

P = H.FR_MOD


def _column_tables(rows: List[Tuple[int, int, int, int]], order=("x", "y", "z", "a")):
    """Quadruple rows -> per-column value lists keyed by component name.
    `order` maps tuple positions to component names; 'a' is the output/f
    column (kept as component id 'a' to match circuit.table_ids)."""
    cols = {name: [] for name in order}
    for row in rows:
        for name, v in zip(order, row):
            cols[name].append(int(v))
    return cols


def config_from_s(s: int, size: int) -> StaticTableConfig:
    """Per-size Lagrange + opening-at-0 bases from toxic waste."""
    g1_lagrange = _lagrange_basis_from_s(s, size)
    k = size.bit_length() - 1
    omega_inv = pow(_omega_for_k(k), P - 2, P)
    n_inv = pow(size, P - 2, P)
    # [x^{size-1}]_1 * (1/size)
    last_scaled = CH.g1_mul(CH.G1_GEN, pow(s, size - 1, P) * n_inv % P)
    opening = []
    wi = 1
    for i in range(size):
        opening.append(CH.g1_add(CH.g1_mul(g1_lagrange[i], wi), CH.g1_neg(last_scaled)))
        wi = wi * omega_inv % P
    return StaticTableConfig(size, g1_lagrange, opening)


def build_sha_setup(l: Limbs, circuit_n: int, s: int):
    """Returns (static_tables, configs, b0_g1_bound, srs).

    static_tables: short-name -> {component -> StaticTable} for the circuit.
    """
    w = l.word_len
    specs = {
        "dsum": (_column_tables(create_decomposition_table(l, w + 3), ("a", "x", "y", "z"))),
        "rot0": (_column_tables(create_rot0_table(l))),
        "rot1": (_column_tables(create_rot1_table(l))),
        "ssig0": (_column_tables(create_ssig0_table(l))),
        "ssig1": (_column_tables(create_ssig1_table(l))),
        "majf": (_column_tables(create_limb_maj_table(l.first))),
        "majs": (_column_tables(create_limb_maj_table(l.second))),
        "chf": (_column_tables(create_limb_ch_table(l.first))),
        "chs": (_column_tables(create_limb_ch_table(l.second))),
    }
    max_size = max(len(c["a"]) for c in specs.values())
    srs_len = max(max_size, circuit_n)
    srs = TableSRS.setup_from_toxic_waste(srs_len - 1, srs_len, s)

    static_tables: Dict[str, Dict[str, StaticTable]] = {}
    sizes = set()
    for tname, columns in specs.items():
        static_tables[tname] = {}
        size = len(columns["a"])
        sizes.add(size)
        for comp, values in columns.items():
            tv = StaticTableValues(values, srs.g1)
            committed = tv.commit(srs_len, srs.g2, circuit_n)
            static_tables[tname][comp] = StaticTable(opened=tv, committed=committed)

    configs = {size: config_from_s(s, size) for size in sizes}
    b0_g1_bound = srs.g1[srs_len - circuit_n + 1:]
    return static_tables, configs, b0_g1_bound, srs
