"""Toy demonstration circuit (reference sha/src/simple_circuit.rs).

Two advice columns and one instance column; gates enforce cross-equality of
advice against the public instance on two rows — the fork-API demo circuit
used by the reference's MockProver tests (simple_circuit.rs:52-139).
"""
from __future__ import annotations

from ..circuit import Value
from ..plonk.circuit_ir import ConstraintSystem


class SimpleCircuit:
    """Check a[0] = instance[1], b[0] = instance[0] (cross equality)."""

    def __init__(self, a0: int, b0: int):
        self.a0 = a0
        self.b0 = b0

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        a = meta.advice_column()
        b = meta.advice_column()
        inst = meta.instance_column()
        q = meta.fixed_column()
        meta.enable_equality(a)
        meta.enable_equality(b)
        meta.enable_equality(inst)
        meta.create_gate("cross", lambda c: [
            c.query_fixed(q, 0)
            * (c.query_advice(a, 0) - c.query_advice(b, 1)),
        ])
        return {"a": a, "b": b, "inst": inst, "q": q}

    def synthesize(self, cfg, layouter):
        def assign(region):
            region.assign_fixed(cfg["q"], 0, Value.known(1))
            ca = region.assign_advice(cfg["a"], 0, Value.known(self.a0))
            region.assign_advice(cfg["b"], 0, Value.known(self.b0))
            # gate row 0 checks a[0] == b[1]
            region.assign_advice(cfg["b"], 1, Value.known(self.a0))
            return ca

        ca = layouter.assign_region("simple", assign)
        layouter.constrain_instance(ca.cell, cfg["inst"], 1)
