"""Dev tooling: Assigned rationals, CircuitGates printer, CircuitCost,
SimpleCircuit (reference plonk/assigned.rs proptests, dev/gates.rs,
dev/cost.rs, sha/src/simple_circuit.rs)."""
import random

from sha2cq_tpu.dev.cost import CircuitCost
from sha2cq_tpu.dev.gates import CircuitGates
from sha2cq_tpu.dev.mock_prover import MockProver
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.models.simple import SimpleCircuit
from sha2cq_tpu.plonk.assigned import Assigned, batch_invert_assigned

P = FR_MOD
random.seed(21)


def test_assigned_matches_field_arithmetic():
    """Rational arithmetic vs plain field arithmetic (assigned.rs proptest)."""
    for _ in range(200):
        a, b = random.randrange(P), random.randrange(P)
        d1, d2 = random.randrange(1, P), random.randrange(1, P)
        x = Assigned.rational(a, d1)
        y = Assigned.rational(b, d2)
        xa = a * pow(d1, P - 2, P) % P
        ya = b * pow(d2, P - 2, P) % P
        assert (x + y).evaluate() == (xa + ya) % P
        assert (x - y).evaluate() == (xa - ya) % P
        assert (x * y).evaluate() == xa * ya % P
        assert (-x).evaluate() == (-xa) % P
        assert x.square().evaluate() == xa * xa % P
        if xa:
            assert x.invert().evaluate() == pow(xa, P - 2, P)
    # zero-denominator maps to zero (evaluate semantics)
    assert Assigned.rational(5, 0).evaluate() == 0
    assert Assigned.trivial(7).evaluate() == 7


def test_batch_invert_assigned():
    cols = [
        [Assigned.rational(random.randrange(P), random.randrange(1, P))
         for _ in range(10)],
        [Assigned.trivial(3), Assigned.zero(), Assigned.rational(4, 0)],
    ]
    out = batch_invert_assigned(cols)
    for col_in, col_out in zip(cols, out):
        for a, v in zip(col_in, col_out):
            assert v == a.evaluate()


def test_simple_circuit_mock():
    c = SimpleCircuit(a0=5, b0=9)
    MockProver.run(3, c, [[9, 5]]).assert_satisfied()
    failures = MockProver.run(3, c, [[9, 6]]).verify()
    assert failures  # wrong instance


def test_gates_printer():
    g = CircuitGates.collect(SimpleCircuit)
    text = g.render()
    assert "gate 'cross'" in text
    assert "= 0" in text
    assert "permutation over:" in text


def test_circuit_cost():
    cost = CircuitCost.measure(3, SimpleCircuit)
    assert cost.n == 8
    assert cost.advice_commitments == 2
    assert cost.proof_bytes > 0
    assert "commitments" in cost.summary()
    # shplonk always has 2 multiopen commitments
    cost2 = CircuitCost.measure(3, SimpleCircuit, multiopen="shplonk")
    assert cost2.multiopen_commitments == 2
