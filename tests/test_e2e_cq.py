"""End-to-end CQ static-lookup proof — the my_test.rs acceptance test.

Mirrors halo2_proofs/tests/my_test.rs:179-259: K=3 circuit with two advice
columns constrained only by a vector static lookup into two 16-entry tables;
toxic-waste TableSRS (N=16) + ParamsKZG (k=3) sharing one s; MockProver
sanity; keygen; GWC proof; verify; PairingBatcher finalize == identity.
"""
import random

import pytest

from sha2cq_tpu.circuit import Value
from sha2cq_tpu.dev.mock_prover import MockProver
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.plonk import (ConstraintSystem, StaticTable, StaticTableConfig,
                              StaticTableId, StaticTableValues, create_proof,
                              keygen_pk, keygen_vk, verify_proof)
from sha2cq_tpu.plonk.static_tables import fk_all_quotient_commitments
from sha2cq_tpu.poly.kzg.params import ParamsKZG, TableSRS
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead, Blake2bWrite

P = FR_MOD

TABLE_VALUES = [0, 1, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32]
TABLE_2_VALUES = [0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


class MyCircuit:
    """my_test.rs MyCircuit: two advice columns, one vector static lookup."""

    def __init__(self, table: StaticTable, table_2: StaticTable):
        self.table = table
        self.table_2 = table_2

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        advice = meta.advice_column()
        advice_2 = meta.advice_column()
        meta.lookup_static("lookup_bits", lambda cells: [
            (cells.query_advice(advice, 0), StaticTableId("table")),
            (cells.query_advice(advice_2, 0), StaticTableId("table_2")),
        ])
        return (advice, advice_2)

    def synthesize(self, config, layouter):
        layouter.register_static_table(StaticTableId("table"), self.table)
        layouter.register_static_table(StaticTableId("table_2"), self.table_2)

        def assign(region):
            region.assign_advice(config[0], 0, Value.known(30))
            region.assign_advice(config[0], 1, Value.known(6))
            region.assign_advice(config[1], 0, Value.known(15))
            region.assign_advice(config[1], 1, Value.known(3))

        layouter.assign_region("", assign)


def _setup(k=3, seed=0x6371):  # seed spells "cq"
    rng = random.Random(seed)
    s = rng.randrange(P)
    table_size = 16
    srs = TableSRS.setup_from_toxic_waste(table_size - 1, table_size, s)
    t1v = StaticTableValues(TABLE_VALUES, srs.g1)
    t2v = StaticTableValues(TABLE_2_VALUES, srs.g1)
    t1 = StaticTable(opened=t1v, committed=t1v.commit(len(srs.g1), srs.g2, 1 << k))
    t2 = StaticTable(opened=t2v, committed=t2v.commit(len(srs.g1), srs.g2, 1 << k))
    params = ParamsKZG.setup_from_toxic_waste(k, s)
    from sha2cq_tpu.curves import host as CH
    configs = {table_size: StaticTableConfig(
        table_size, srs.g1_lagrange, srs.g_lagrange_opening_at_0,
        zv_g1=CH.g1_add(srs.g1_xn, CH.g1_neg(srs.g1[0])),
        xn1_g1=srs.g1[table_size - 1])}
    b0_g1_bound = srs.g1[(1 << k) + 1:]
    return rng, srs, t1, t2, params, configs, b0_g1_bound


def test_fk_matches_naive():
    """FK all-openings == per-root kate_division loop (the reference's TODO,
    static_lookup.rs:107)."""
    rng = random.Random(1)
    s = rng.randrange(P)
    srs = TableSRS.setup_from_toxic_waste(7, 8, s)
    vals = [rng.randrange(P) for _ in range(8)]
    fast = StaticTableValues(vals, srs.g1, use_fk=True)
    slow = StaticTableValues(vals, srs.g1, use_fk=False)
    assert fast.qs == slow.qs


def test_mock_prover_static_lookup():
    _, _, t1, t2, *_ = _setup()
    circuit = MyCircuit(t1, t2)
    prover = MockProver.run(3, circuit, [])
    prover.assert_satisfied()

    # negative: value not in table
    bad = MyCircuit(t1, t2)

    class BadCircuit(MyCircuit):
        def synthesize(self, config, layouter):
            layouter.register_static_table(StaticTableId("table"), self.table)
            layouter.register_static_table(StaticTableId("table_2"), self.table_2)

            def assign(region):
                region.assign_advice(config[0], 0, Value.known(7))  # 7 not in table
                region.assign_advice(config[1], 0, Value.known(2))
            layouter.assign_region("", assign)

    failures = MockProver.run(3, BadCircuit(t1, t2), []).verify()
    assert any(f.kind == "static_lookup" for f in failures)


def test_e2e_proof():
    K = 3
    rng, srs, t1, t2, params, configs, b0_g1_bound = _setup(K)
    circuit = MyCircuit(t1, t2)

    MockProver.run(K, circuit, []).assert_satisfied()

    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0_g1_bound, vk, circuit)

    transcript = Blake2bWrite()
    proof = create_proof(params, pk, [circuit], [[]], rng=rng, transcript=transcript)
    assert len(proof) > 0

    read = Blake2bRead(proof)
    strategy = AccumulatorStrategy(params.verifier_params(), rng=rng)
    batcher = verify_proof(params.verifier_params(), pk.get_vk(), strategy, [[]], read)
    assert batcher.check(), "pairing identity failed"


def test_e2e_rejects_tampered_proof():
    K = 3
    rng, srs, t1, t2, params, configs, b0_g1_bound = _setup(K)
    circuit = MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0_g1_bound, vk, circuit)
    proof = create_proof(params, pk, [circuit], [[]], rng=rng)

    # flip a scalar byte near the end (an evaluation) and expect failure
    bad = bytearray(proof)
    bad[-40] ^= 1
    read = Blake2bRead(bytes(bad))
    strategy = AccumulatorStrategy(params.verifier_params(), rng=rng)
    try:
        batcher = verify_proof(params.verifier_params(), pk.get_vk(), strategy, [[]], read)
        assert not batcher.check(), "tampered proof must not verify"
    except ValueError:
        pass  # rejected while reading — also acceptable


def test_golden_proof_bytes_pinned():
    """Absolute golden vector: a fully seeded my_test-equivalent proof must
    be byte-stable across refactors.  This pins the entire stack end to end
    — transcript byte format, pinned-VK hashing (rust-compatible default),
    challenge derivation, commitment and multiopen math.  If a change is
    MEANT to alter proof bytes (protocol change, pinned-VK format change),
    update the constants in the same commit and say why.
    """
    import hashlib

    from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk

    rng, srs, t1, t2, params, configs, b0 = _setup(3)
    circuit = MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    assert vk.transcript_repr == int(
        "0x0829d8d6b5c805772c8a074201361d3cb9b0e942c42f24757232f2f375f32486", 16)
    pk = keygen_pk(params, configs, b0, vk, circuit)
    proof = create_proof(params, pk, [circuit], [[]],
                         rng=random.Random(0x60))
    assert len(proof) == 608
    assert hashlib.blake2b(proof, digest_size=16).hexdigest() == \
        "dccf78dc88329973c36c6defd7990102"


def test_sparse_b0_commitment_bases_match_dense(monkeypatch):
    """At n >= 1024 the batched prover commits b0/p as support-sized MSMs
    over group-iNTT opening bases (B is 1/beta off the active rows); proof
    bytes must equal the dense n-point path's."""
    K, n = 10, 1 << 10
    rng = random.Random(77)
    s = rng.randrange(P)
    N = 2 * n
    srs = TableSRS.setup_from_toxic_waste(N - 1, N, s)
    vals = list(range(N))
    tv = StaticTableValues(vals, srs.g1)
    table = StaticTable(opened=tv,
                        committed=tv.commit(len(srs.g1), srs.g2, n))
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    configs = {N: StaticTableConfig(N, srs.g1_lagrange,
                                    srs.g_lagrange_opening_at_0)}
    b0_bound = srs.g1[N - n + 1:]

    class RangeCircuit:
        @classmethod
        def configure(cls, meta):
            advice = meta.advice_column()
            meta.lookup_static("range", lambda cells: [
                (cells.query_advice(advice, 0), StaticTableId("rt"))])
            return advice

        def synthesize(self, config, layouter):
            layouter.register_static_table(StaticTableId("rt"), table)

            def assign(region):
                for i in range(40):
                    region.assign_advice(config, i, Value.known(3 * i + 1))
            layouter.assign_region("rows", assign)

    circuit = RangeCircuit()
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0_bound, vk, circuit)

    proof_sparse = create_proof(params, pk, [circuit], [[]],
                                rng=random.Random(3))

    import sha2cq_tpu.plonk.static_lookup as SL
    assert pk.__dict__.get("_b0_sparse_cache"), \
        "sparse bases did not engage at n=1024"
    monkeypatch.setattr(SL, "_b0_sparse_bases", lambda pk_, params_: None)
    proof_dense = create_proof(params, pk, [circuit], [[]],
                               rng=random.Random(3))
    assert proof_sparse == proof_dense, "sparse b0/p bases != dense bytes"

    ok = verify_proof(params, vk,
                      AccumulatorStrategy(params, rng=random.Random(4)),
                      [[]], Blake2bRead(proof_sparse)).check()
    assert ok


def test_grouped_b0_commitments_match_row_sparse_and_dense(monkeypatch):
    """When witness values repeat, the b0/p commitments group support rows
    by the table row they resolve to (equal value => equal scalar) and run
    Pippenger over the per-group point sums; proof bytes must equal both
    the row-sparse and the dense paths'."""
    import sha2cq_tpu.ops.msm as M
    import sha2cq_tpu.plonk.static_lookup as SL

    K, n = 10, 1 << 10
    rng = random.Random(78)
    s = rng.randrange(P)
    N = 2 * n
    srs = TableSRS.setup_from_toxic_waste(N - 1, N, s)
    vals = list(range(N))
    tv = StaticTableValues(vals, srs.g1)
    table = StaticTable(opened=tv,
                        committed=tv.commit(len(srs.g1), srs.g2, n))
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    configs = {N: StaticTableConfig(N, srs.g1_lagrange,
                                    srs.g_lagrange_opening_at_0)}
    b0_bound = srs.g1[N - n + 1:]

    class RepeatCircuit:
        @classmethod
        def configure(cls, meta):
            advice = meta.advice_column()
            meta.lookup_static("range", lambda cells: [
                (cells.query_advice(advice, 0), StaticTableId("rt"))])
            return advice

        def synthesize(self, config, layouter):
            layouter.register_static_table(StaticTableId("rt"), table)

            def assign(region):
                for i in range(40):   # 7 distinct values over 40 rows
                    region.assign_advice(config, i,
                                         Value.known(3 * (i % 7) + 1))
            layouter.assign_region("rows", assign)

    circuit = RepeatCircuit()
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0_bound, vk, circuit)

    calls = []
    real_grouped = M.msm_grouped_multi
    monkeypatch.setattr(M, "msm_grouped_multi",
                        lambda jobs: calls.append(len(jobs))
                        or real_grouped(jobs))
    # grouped jobs now ride the unified one-call path; count them there too
    real_combined = M.msm_combined
    monkeypatch.setattr(M, "msm_combined",
                        lambda jobs, gjobs: calls.append(len(gjobs))
                        or real_combined(jobs, gjobs))
    proof_grouped = create_proof(params, pk, [circuit], [[]],
                                 rng=random.Random(5))
    if not calls:
        import pytest
        pytest.skip("native library unavailable: grouped path cannot engage")
    assert calls == [2]    # one b0 + one p job for the single argument

    monkeypatch.setattr(SL, "GROUP_MAX_RATIO", 0.0)   # force row-sparse
    proof_rows = create_proof(params, pk, [circuit], [[]],
                              rng=random.Random(5))
    monkeypatch.setattr(SL, "_b0_sparse_bases", lambda pk_, params_: None)
    proof_dense = create_proof(params, pk, [circuit], [[]],
                               rng=random.Random(5))
    assert proof_grouped == proof_rows, "grouped b0/p != row-sparse bytes"
    assert proof_grouped == proof_dense, "grouped b0/p != dense bytes"

    ok = verify_proof(params, vk,
                      AccumulatorStrategy(params, rng=random.Random(6)),
                      [[]], Blake2bRead(proof_grouped)).check()
    assert ok
