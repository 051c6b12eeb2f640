"""Key generation (reference plonk/keygen.rs).

keygen_vk: synthesize with the Verifier assembly (committed table halves
required), convert selectors to fixed columns, commit fixed + permutation
sigma polys (keygen.rs:208-275).

keygen_pk: synthesize with the Prover assembly (opened halves required),
precompute coeff/coset forms of fixed + sigma polys and the l0/l_last/
l_active_row cosets (keygen.rs:278-397).
"""
from __future__ import annotations

from typing import Dict, List

from ..fields.host import FR_DELTA, FR_MOD
from ..poly.domain import EvaluationDomain
from .circuit_ir import Column, ConstraintSystem, Selector, StaticTableId
from .keys import PermutationProvingKey, ProvingKey, VerifyingKey
from .static_tables import StaticTable

from ..circuit import SimpleFloorPlanner, planner_for, Value

P = FR_MOD


class _Assembly:
    """Keygen-time Assignment sink: records fixed cells, selector activations
    and copy cycles; ignores advice (keygen.rs:52-205)."""

    def __init__(self, k: int, cs: ConstraintSystem, ctx: str):
        self.k = k
        self.n = 1 << k
        self.cs = cs
        self.ctx = ctx  # "prover" | "verifier"
        self.usable_rows = self.n - (cs.blinding_factors() + 1)
        self.fixed = [[0] * self.n for _ in range(cs.num_fixed_columns)]
        self.selectors = [[False] * self.n for _ in range(cs.num_selectors)]
        self.static_table_mapping: Dict[StaticTableId, StaticTable] = {}
        # permutation cycle tracking (union-find-ish mapping, keygen.rs:43+)
        self.perm_columns = list(cs.permutation.columns)
        m = len(self.perm_columns)
        self.mapping = [[(i, j) for j in range(self.n)] for i in range(m)]
        self.aux = [[(i, j) for j in range(self.n)] for i in range(m)]
        self.sizes = [[1] * self.n for _ in range(m)]

    # Assignment protocol
    def enter_region(self, name):
        pass

    def exit_region(self):
        pass

    def register_static_table(self, table_id: StaticTableId, table: StaticTable):
        if self.ctx == "prover":
            assert table.opened is not None, "prover keygen requires opened table"
        else:
            assert table.committed is not None, "verifier keygen requires committed table"
        self.static_table_mapping[table_id] = table

    def enable_selector(self, selector: Selector, row: int):
        if row >= self.usable_rows:
            raise ValueError("not enough rows available")
        self.selectors[selector.index][row] = True

    def query_instance(self, column: Column, row: int) -> Value:
        if row >= self.usable_rows:
            raise ValueError("not enough rows available")
        return Value.unknown()

    def assign_advice(self, column: Column, row: int, value: Value):
        pass

    def assign_fixed(self, column: Column, row: int, value: Value):
        if row >= self.usable_rows:
            raise ValueError("not enough rows available")
        self.fixed[column.index][row] = value.assign()

    def assign_advice_slice(self, column: Column, row0: int, values):
        pass

    def assign_fixed_slice(self, column: Column, row0: int, values):
        if row0 + len(values) > self.usable_rows:
            raise ValueError("not enough rows available")
        from ..fields.host import FR_MOD
        self.fixed[column.index][row0:row0 + len(values)] = \
            [v % FR_MOD for v in values]

    def copy(self, col_a: Column, row_a: int, col_b: Column, row_b: int):
        if row_a >= self.usable_rows or row_b >= self.usable_rows:
            raise ValueError("not enough rows available")
        try:
            ca = self.perm_columns.index(col_a)
            cb = self.perm_columns.index(col_b)
        except ValueError as e:
            raise ValueError(f"column not in permutation: {e}")
        left, right = self.aux[ca][row_a], self.aux[cb][row_b]
        if left == right:
            return
        if self.sizes[left[0]][left[1]] < self.sizes[right[0]][right[1]]:
            left, right = right, left
        self.sizes[left[0]][left[1]] += self.sizes[right[0]][right[1]]
        i = right
        while True:
            self.aux[i[0]][i[1]] = left
            i = self.mapping[i[0]][i[1]]
            if i == right:
                break
        (self.mapping[ca][row_a], self.mapping[cb][row_b]) = (
            self.mapping[cb][row_b], self.mapping[ca][row_a])

    def fill_from_row(self, column: Column, from_row: int, value: Value):
        v = value.assign()
        for row in range(from_row, self.usable_rows):
            self.fixed[column.index][row] = v

    def get_challenge(self, challenge):
        return Value.unknown()

    def next_phase(self):
        pass

    def _sigma_lagrange(self, domain: EvaluationDomain) -> List[List[int]]:
        """delta^i omega^j permuted by the copy mapping (keygen.rs:103-209)."""
        n = self.n
        omega_powers = [1] * n
        for j in range(1, n):
            omega_powers[j] = omega_powers[j - 1] * domain.omega % P
        deltaomega = []
        cur = 1
        for _ in range(len(self.perm_columns)):
            deltaomega.append([o * cur % P for o in omega_powers])
            cur = cur * FR_DELTA % P
        out = []
        for i in range(len(self.perm_columns)):
            out.append([deltaomega[pi][pj] for (pi, pj) in self.mapping[i]])
        return out


def _synthesize(k: int, circuit, ctx: str):
    cs = ConstraintSystem()
    config = type(circuit).configure(cs)
    n = 1 << k
    if n < cs.minimum_rows():
        raise ValueError(f"k = {k} too small for this circuit")
    assembly = _Assembly(k, cs, ctx)
    planner_for(circuit).synthesize(assembly, circuit, config, cs.constants)
    return cs, assembly


def keygen_vk(params, circuit, compress_selectors: bool = False) -> VerifyingKey:
    """compress_selectors packs mutually-exclusive selectors into shared
    fixed columns (compress_selectors.rs parity); keygen_pk must be called
    with the same flag."""
    cs, assembly = _synthesize(params.k, circuit, "verifier")
    degree = cs.degree()
    domain = EvaluationDomain(degree, params.k)

    fixed = [list(col) for col in assembly.fixed]
    if compress_selectors:
        selector_polys = cs.compress_selectors_to_fixed(assembly.selectors)
    else:
        selector_polys = cs.convert_selectors_to_fixed(assembly.selectors)
    fixed.extend([[int(x) for x in poly] + [0] * (params.n - len(poly))
                  for poly in selector_polys])

    sigma = assembly._sigma_lagrange(domain)
    permutation_commitments = [params.commit_lagrange(s) for s in sigma]
    fixed_commitments = [params.commit_lagrange(f) for f in fixed]

    static_committed = {
        tid: t.committed for tid, t in assembly.static_table_mapping.items()}
    return VerifyingKey(domain, fixed_commitments, permutation_commitments,
                        cs, assembly.selectors, static_committed)


def keygen_pk(params, static_table_configs: Dict[int, object], b0_g1_bound: List,
              vk: VerifyingKey, circuit, compress_selectors: bool = False) -> ProvingKey:
    cs, assembly = _synthesize(params.k, circuit, "prover")
    domain = vk.domain
    n = params.n

    fixed = [list(col) for col in assembly.fixed]
    if compress_selectors:
        selector_polys = cs.compress_selectors_to_fixed(assembly.selectors)
    else:
        selector_polys = cs.convert_selectors_to_fixed(assembly.selectors)
    fixed.extend([[int(x) for x in poly] + [0] * (n - len(poly))
                  for poly in selector_polys])

    fixed_polys = [domain.lagrange_to_coeff_host(f) for f in fixed]
    fixed_cosets = [domain.coeff_to_extended_host(p) for p in fixed_polys]

    sigma = assembly._sigma_lagrange(domain)
    sigma_polys = [domain.lagrange_to_coeff_host(s) for s in sigma]
    sigma_cosets = [domain.coeff_to_extended_host(p) for p in sigma_polys]
    permutation_pk = PermutationProvingKey(sigma, sigma_polys, sigma_cosets)

    bf = cs.blinding_factors()
    l0_lag = [0] * n
    l0_lag[0] = 1
    l0 = domain.coeff_to_extended_host(domain.lagrange_to_coeff_host(l0_lag))
    l_blind_lag = [0] * n
    for i in range(n - bf, n):
        l_blind_lag[i] = 1
    l_blind = domain.coeff_to_extended_host(domain.lagrange_to_coeff_host(l_blind_lag))
    l_last_lag = [0] * n
    l_last_lag[n - bf - 1] = 1
    l_last = domain.coeff_to_extended_host(domain.lagrange_to_coeff_host(l_last_lag))
    l_active_row = [(1 - (ll + lb)) % P for ll, lb in zip(l_last, l_blind)]

    static_opened = {
        tid: t.opened for tid, t in assembly.static_table_mapping.items()}

    return ProvingKey(
        vk=vk, l0=l0, l_last=l_last, l_active_row=l_active_row,
        fixed_values=fixed, fixed_polys=fixed_polys, fixed_cosets=fixed_cosets,
        permutation=permutation_pk,
        static_table_mapping=static_opened,
        static_table_configs=static_table_configs,
        b0_g1_bound=b0_g1_bound,
    )
