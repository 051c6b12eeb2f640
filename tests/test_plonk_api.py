"""Full gate + dynamic lookup + permutation circuit through keygen/prove/
verify — the plonk_api.rs-class coverage (reference halo2_proofs/tests/
plonk_api.rs).

Circuit: a multiplication gate (a * b = c), a copy constraint tying two
advice cells, a dynamic range-lookup of `a` into a fixed table, and a public
instance exposing `c`.
"""
import random

import pytest

from sha2cq_tpu.circuit import Value
from sha2cq_tpu.dev.mock_prover import MockProver
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.plonk import (ConstraintSystem, create_proof, keygen_pk,
                              keygen_vk, verify_proof)
from sha2cq_tpu.poly.kzg.params import ParamsKZG
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead

P = FR_MOD
K = 5
TABLE = list(range(12))  # dynamic lookup table: a must be < 12


class ApiCircuit:
    def __init__(self, a_vals, b_vals):
        self.a_vals = a_vals
        self.b_vals = b_vals

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        a = meta.advice_column()
        b = meta.advice_column()
        c = meta.advice_column()
        q_mul = meta.fixed_column()
        table = meta.lookup_table_column()
        inst = meta.instance_column()
        meta.enable_equality(a)
        meta.enable_equality(b)
        meta.enable_equality(c)
        meta.enable_equality(inst)

        meta.create_gate("mul", lambda cells: [
            cells.query_fixed(q_mul, 0)
            * (cells.query_advice(a, 0) * cells.query_advice(b, 0)
               - cells.query_advice(c, 0))
        ])
        meta.lookup("range", lambda cells: [
            (cells.query_advice(a, 0), table),
        ])
        return {"a": a, "b": b, "c": c, "q_mul": q_mul, "table": table, "inst": inst}

    def synthesize(self, cfg, layouter):
        def fill_table(table):
            for i, v in enumerate(TABLE):
                table.assign_cell(cfg["table"], i, Value.known(v))
        layouter.assign_table("range", fill_table)

        n_rows = len(self.a_vals)
        cells = {}

        def assign(region):
            for i, (av, bv) in enumerate(zip(self.a_vals, self.b_vals)):
                region.assign_fixed(cfg["q_mul"], i, Value.known(1))
                ca = region.assign_advice(cfg["a"], i, Value.known(av))
                cb = region.assign_advice(cfg["b"], i, Value.known(bv))
                cc = region.assign_advice(cfg["c"], i, Value.known(av * bv % P))
                cells[i] = (ca, cb, cc)
            # copy constraint: b[1] must equal a[0]
            region.constrain_equal(cells[0][0].cell, cells[1][1].cell)
            return cells

        got = layouter.assign_region("rows", assign)
        # expose c[0] as public input
        layouter.constrain_instance(got[0][2].cell, cfg["inst"], 0)


def _inputs():
    a = [3, 7, 5]
    b = [4, a[0], 11]   # b[1] = a[0] satisfies the copy constraint
    return a, b


def test_mock():
    a, b = _inputs()
    circuit = ApiCircuit(a, b)
    inst = [a[0] * b[0] % P]
    MockProver.run(K, circuit, [inst]).assert_satisfied()

    # out-of-range lookup value
    bad = ApiCircuit([3, 7, 13], b)
    failures = MockProver.run(K, bad, [inst]).verify()
    assert any(f.kind == "lookup" for f in failures)

    # broken copy constraint
    bad2 = ApiCircuit(a, [4, 9, 11])
    failures = MockProver.run(K, bad2, [inst]).verify()
    assert any(f.kind in ("permutation", "gate") for f in failures)


def test_prove_verify_dynamic_lookup():
    rng = random.Random(31337)
    s = rng.randrange(P)
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    a, b = _inputs()
    circuit = ApiCircuit(a, b)
    inst = [a[0] * b[0] % P]

    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, {}, [], vk, circuit)
    proof = create_proof(params, pk, [circuit], [[inst]], rng=rng)

    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[inst]], Blake2bRead(proof))
    assert batcher.check()

    # wrong instance
    wrong = [[[(inst[0] + 1) % P]]]
    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           wrong, Blake2bRead(proof))
    assert not batcher.check()


def test_multi_circuit_single_proof():
    """Two circuit instances in ONE proof (reference prover.rs:51-60 takes a
    slice of circuits); the verifier batches both instance sets."""
    rng = random.Random(777)
    s = rng.randrange(P)
    params = ParamsKZG.setup_from_toxic_waste(K, s)

    a1, b1 = _inputs()
    a2 = [2, 6, 9]
    b2 = [8, a2[0], 3]
    c1 = ApiCircuit(a1, b1)
    c2 = ApiCircuit(a2, b2)
    inst1 = [a1[0] * b1[0] % P]
    inst2 = [a2[0] * b2[0] % P]

    vk = keygen_vk(params, c1)
    pk = keygen_pk(params, {}, [], vk, c1)
    proof = create_proof(params, pk, [c1, c2], [[inst1], [inst2]], rng=rng)

    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[inst1], [inst2]], Blake2bRead(proof))
    assert batcher.check(), "two-circuit proof failed"

    # swapping the instance sets must not verify
    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[inst2], [inst1]], Blake2bRead(proof))
    assert not batcher.check(), "swapped instances must fail"


def test_native_permutation_grand_products_match_python(monkeypatch):
    """The C grand-product kernels (fr_perm_mul_acc/_geo, fr_prefix_prod)
    engage at n >= 1024; proof bytes must equal the per-row Python fold's."""
    K10 = 10
    rng = random.Random(4242)
    s = rng.randrange(P)
    params = ParamsKZG.setup_from_toxic_waste(K10, s)
    a, b = _inputs()
    circuit = ApiCircuit(a, b)
    inst = [a[0] * b[0] % P]
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, {}, [], vk, circuit)

    proof_native = create_proof(params, pk, [circuit], [[inst]],
                                rng=random.Random(8))

    from sha2cq_tpu.plonk import permutation as PM
    native_fn = PM._permutation_commit_native
    calls = {"n": 0}

    def counting(*args, **kw):
        calls["n"] += 1
        return native_fn(*args, **kw)

    monkeypatch.setattr(PM, "_permutation_commit_native", counting)
    create_proof(params, pk, [circuit], [[inst]], rng=random.Random(8))
    assert calls["n"] == 1, "native permutation path did not engage at k=10"

    # force the pure-Python fold and compare bytes
    monkeypatch.setattr(
        PM, "_permutation_commit_native",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("unused")))
    import sha2cq_tpu.native_loader as NL
    real_get_lib = NL.get_lib
    monkeypatch.setattr(NL, "get_lib", lambda: None)
    try:
        proof_py = create_proof(params, pk, [circuit], [[inst]],
                                rng=random.Random(8))
    finally:
        monkeypatch.setattr(NL, "get_lib", real_get_lib)
    assert proof_py == proof_native, "native perm grand products != python"

    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[inst]], Blake2bRead(proof_native))
    assert batcher.check()
