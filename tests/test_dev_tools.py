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


def test_mock_prover_challenge_phases():
    """MockProver supports multi-phase challenges (reference MockProver does
    not); a circuit consuming the challenge in the WRONG phase produces
    garbage witnesses and must fail."""
    from sha2cq_tpu.circuit import Value
    from sha2cq_tpu.dev.mock_prover import MockProver
    from sha2cq_tpu.plonk.circuit_ir import ConstraintSystem, FIRST_PHASE, SECOND_PHASE

    class ChallengeCircuit:
        # b (phase 1) must equal a (phase 0) * challenge c
        MISPHASED = False

        @classmethod
        def configure(cls, meta: ConstraintSystem):
            a = meta.advice_column(FIRST_PHASE)
            b = meta.advice_column(SECOND_PHASE)
            q = meta.fixed_column()
            ch = meta.challenge_usable_after(FIRST_PHASE)
            meta.create_gate("b=a*c", lambda cells: [
                cells.query_fixed(q, 0)
                * (cells.query_advice(b, 0)
                   - cells.query_advice(a, 0) * cells.query_challenge(ch))
            ])
            return {"a": a, "b": b, "q": q, "ch": ch}

        def __init__(self, a_val):
            self.a_val = a_val

        def synthesize(self, cfg, layouter):
            misphased = type(self).MISPHASED

            def assign(region):
                region.assign_fixed(cfg["q"], 0, Value.known(1))
                region.assign_advice(cfg["a"], 0, Value.known(self.a_val))
                # phase-aware witness: b computable only once c is revealed
                cv = region.get_challenge(cfg["ch"])
                if misphased:
                    # wrong: commit a guess for b before c is known
                    region.assign_advice(cfg["b"], 0, Value.known(12345))
                else:
                    b = cv.map(lambda c: self.a_val * c % FR_MOD)
                    region.assign_advice(cfg["b"], 0,
                                         b if b.is_known() else Value.known(0))

            layouter.assign_region("r", assign)

    ok = ChallengeCircuit(7)
    MockProver.run(4, ok, []).assert_satisfied()

    ChallengeCircuit.MISPHASED = True
    bad = ChallengeCircuit(7)
    failures = MockProver.run(4, bad, []).verify()
    ChallengeCircuit.MISPHASED = False
    assert any(f.kind == "gate" for f in failures), "mis-phased challenge must fail"


def test_mock_prover_unassigned_cell():
    """An advice cell queried by an active gate but never assigned is
    reported (cell-coverage analogue of dev.rs:979+)."""
    from sha2cq_tpu.circuit import Value
    from sha2cq_tpu.dev.mock_prover import MockProver
    from sha2cq_tpu.plonk.circuit_ir import ConstraintSystem

    class Incomplete:
        @classmethod
        def configure(cls, meta: ConstraintSystem):
            a = meta.advice_column()
            b = meta.advice_column()
            q = meta.fixed_column()
            meta.create_gate("a=b", lambda cells: [
                cells.query_fixed(q, 0)
                * (cells.query_advice(a, 0) - cells.query_advice(b, 0))
            ])
            return {"a": a, "b": b, "q": q}

        def synthesize(self, cfg, layouter):
            def assign(region):
                region.assign_fixed(cfg["q"], 0, Value.known(1))
                region.assign_advice(cfg["a"], 0, Value.known(0))
                # b never assigned: gate is satisfied (0 == 0 default) but
                # coverage must flag it
            layouter.assign_region("r", assign)

    failures = MockProver.run(4, Incomplete(), []).verify()
    assert any(f.kind == "unassigned" for f in failures)


def test_layout_renderer():
    """dev/layout.py (dev-graph parity): SVG + text occupancy rendering."""
    from sha2cq_tpu.dev.layout import render_svg, render_text
    from tests.test_plonk_api import ApiCircuit, _inputs

    a, b = _inputs()
    circuit = ApiCircuit(a, b)
    svg = render_svg(5, circuit)
    assert svg.startswith("<svg") and "rows" in svg  # region name present
    txt = render_text(5, circuit)
    assert "a" in txt.splitlines()[1]  # advice cells marked on row 0


def test_typed_failures_and_emitter():
    """VerifyFailure carries typed attribution (kind / constraint_index /
    location / cell_values) and emits a failure/emitter.rs-style block
    (reference dev/failure.rs:119)."""
    from sha2cq_tpu.dev.mock_prover import (FailureLocation, MockProver,
                                            emit_failures)

    c = SimpleCircuit(a0=5, b0=9)
    failures = MockProver.run(3, c, [[9, 6]]).verify()
    assert failures
    f = failures[0]
    assert f.kind in ("gate", "permutation")
    assert isinstance(f.location, FailureLocation)
    assert f.location.region == "simple"
    assert f.location.row == f.row
    gate_fails = [g for g in failures if g.kind == "gate"]
    perm_fails = [g for g in failures if g.kind == "permutation"]
    # the wrong instance breaks the copy constraint; cell values are listed
    assert perm_fails and perm_fails[0].cell_values
    assert perm_fails[0].column is not None
    for g in gate_fails:
        assert g.constraint_index == 0
        assert g.cell_values and all(isinstance(v, int) for _, v in g.cell_values)
    text = emit_failures(failures)
    assert "is not satisfied in region 'simple'" in text
    assert "Assigned cell values:" in text


def test_typed_failure_static_lookup_location():
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_e2e_cq import MyCircuit, StaticTableId, _setup
    from sha2cq_tpu.circuit import Value
    from sha2cq_tpu.dev.mock_prover import MockProver

    _, _, t1, t2, *_ = _setup()

    class Bad(MyCircuit):
        def synthesize(self, config, layouter):
            layouter.register_static_table(StaticTableId("table"), self.table)
            layouter.register_static_table(StaticTableId("table_2"), self.table_2)

            def assign(region):
                region.assign_advice(config[0], 0, Value.known(7))  # not in table
                region.assign_advice(config[1], 0, Value.known(2))
            layouter.assign_region("lk", assign)

    failures = MockProver.run(3, Bad(t1, t2), []).verify()
    sl = [f for f in failures if f.kind == "static_lookup"]
    assert sl and sl[0].location.region == "lk"
    assert sl[0].cell_values == [("input[0]", 7), ("input[1]", 2)]
