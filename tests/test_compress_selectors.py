"""Selector packing (compress_selectors.rs parity): mutually-exclusive
selectors share one fixed column; proofs still verify."""
import random

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


class TwoSelectorCircuit:
    """Rows 0-1: s_add gates a+b=c; rows 2-3: s_sub gates a-b=c.  The two
    selectors are active on disjoint rows and gate degree-1 constraints, so
    they pack into one column within the degree budget."""

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        a = meta.advice_column()
        b = meta.advice_column()
        c = meta.advice_column()
        s_add = meta.selector()
        s_sub = meta.selector()
        meta.create_gate("add", lambda cells: [
            cells.query_selector(s_add)
            * (cells.query_advice(a, 0) + cells.query_advice(b, 0)
               - cells.query_advice(c, 0))])
        meta.create_gate("sub", lambda cells: [
            cells.query_selector(s_sub)
            * (cells.query_advice(a, 0) - cells.query_advice(b, 0)
               - cells.query_advice(c, 0))])
        return {"a": a, "b": b, "c": c, "s_add": s_add, "s_sub": s_sub}

    def synthesize(self, cfg, layouter):
        def assign(region):
            rows = [(0, "add", 3, 4), (1, "add", 7, 8),
                    (2, "sub", 5, 6), (3, "sub", 9, 2)]
            for row, kind, av, bv in rows:
                sel = cfg["s_add"] if kind == "add" else cfg["s_sub"]
                region.enable_selector(sel, row)
                region.assign_advice(cfg["a"], row, Value.known(av))
                region.assign_advice(cfg["b"], row, Value.known(bv))
                cv = (av + bv) % P if kind == "add" else (av - bv) % P
                region.assign_advice(cfg["c"], row, Value.known(cv))

        layouter.assign_region("rows", assign)


def test_mock():
    MockProver.run(K, TwoSelectorCircuit(), []).assert_satisfied()


def test_packed_proof_verifies_and_saves_columns():
    rng = random.Random(99)
    s = rng.randrange(P)
    params = ParamsKZG.setup_from_toxic_waste(K, s)

    circuit = TwoSelectorCircuit()
    vk_plain = keygen_vk(params, circuit)
    vk_packed = keygen_vk(params, circuit, compress_selectors=True)
    # two selectors -> one combination column instead of two
    assert (vk_packed.cs.num_fixed_columns
            == vk_plain.cs.num_fixed_columns - 1)

    pk = keygen_pk(params, {}, [], vk_packed, circuit, compress_selectors=True)
    proof = create_proof(params, pk, [circuit], [[]], rng=rng)
    batcher = verify_proof(params, vk_packed, AccumulatorStrategy(params, rng=rng),
                           [[]], Blake2bRead(proof))
    assert batcher.check(), "packed-selector proof failed"

    # the unpacked path still proves/verifies too
    pk2 = keygen_pk(params, {}, [], vk_plain, circuit)
    proof2 = create_proof(params, pk2, [circuit], [[]], rng=rng)
    assert verify_proof(params, vk_plain, AccumulatorStrategy(params, rng=rng),
                        [[]], Blake2bRead(proof2)).check()
