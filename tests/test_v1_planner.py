"""V1 two-pass floor planner: measure, slot-pack, assign (floor_planner/v1.rs
parity).  Column-disjoint regions overlap in rows; proofs verify."""
import random

from sha2cq_tpu.circuit import (SimpleFloorPlanner, V1FloorPlanner, Value,
                                slot_in_biggest_first, _RegionShape)
from sha2cq_tpu.dev.mock_prover import MockProver
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.plonk import (ConstraintSystem, create_proof, keygen_pk,
                              keygen_vk, verify_proof)
from sha2cq_tpu.poly.kzg.params import ParamsKZG
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead

P = FR_MOD
K = 5


class TwoLaneCircuit:
    """Region A uses columns (a0, q0); region B uses columns (a1, q1) —
    disjoint, so V1 packs both starting at row 0."""

    FLOOR_PLANNER = V1FloorPlanner

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        a0 = meta.advice_column()
        a1 = meta.advice_column()
        q0 = meta.fixed_column()
        q1 = meta.fixed_column()
        meta.enable_equality(a0)
        meta.enable_equality(a1)
        meta.create_gate("sq0", lambda c: [
            c.query_fixed(q0, 0) * (c.query_advice(a0, 0) * c.query_advice(a0, 0)
                                    - c.query_advice(a0, 1))])
        meta.create_gate("sq1", lambda c: [
            c.query_fixed(q1, 0) * (c.query_advice(a1, 0) * c.query_advice(a1, 0)
                                    - c.query_advice(a1, 1))])
        return {"a0": a0, "a1": a1, "q0": q0, "q1": q1}

    def synthesize(self, cfg, layouter):
        cells = {}

        def lane(col, qcol, base):
            def assign(region):
                v = base
                for i in range(4):
                    if i < 3:
                        region.assign_fixed(qcol, i, Value.known(1))
                    c = region.assign_advice(col, i, Value.known(v))
                    v = v * v % P
                return c
            return assign

        ca = layouter.assign_region("laneA", lane(cfg["a0"], cfg["q0"], 3))
        cb = layouter.assign_region("laneB", lane(cfg["a1"], cfg["q1"], 3))

        def tie(region):
            x = region.assign_advice(cfg["a0"], 0, Value.known(pow(3, 8, P)))
            region.constrain_equal(x.cell, ca.cell)
            region.constrain_equal(x.cell, cb.cell)

        layouter.assign_region("tie", tie)


def test_slot_in_overlaps_disjoint_columns():
    r1 = _RegionShape("a")
    r1.columns = {"colA"}
    r1.rows = 4
    r2 = _RegionShape("b")
    r2.columns = {"colB"}
    r2.rows = 4
    r3 = _RegionShape("c")
    r3.columns = {"colA", "colB"}
    r3.rows = 2
    starts = slot_in_biggest_first([r1, r2, r3])
    assert starts[0] == 0 and starts[1] == 0     # disjoint -> overlap
    assert starts[2] == 4                        # clashes with both


def test_v1_mock_and_proof():
    MockProver.run(K, TwoLaneCircuit(), []).assert_satisfied()

    rng = random.Random(55)
    s = rng.randrange(P)
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    circuit = TwoLaneCircuit()
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, {}, [], vk, circuit)
    proof = create_proof(params, pk, [circuit], [[]], rng=rng)
    assert verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                        [[]], Blake2bRead(proof)).check()
