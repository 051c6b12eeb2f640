"""zk static lookups (cs.zk_static_lookups; plonk/static_lookup.py docstring).

The reference's CQ argument is explicitly non-zk
(static_lookup/prover.rs:122-124); the zk mode blinds the table-side
commitments with multiples of Z_V and frees B's blinding rows.  Checks:
completeness (proofs verify, host and device h paths byte-equal), hiding
(commitments re-randomize across provers of the SAME witness), soundness
(tampered proofs fail), and that the non-zk default is untouched.
"""
import random

import pytest

import tests.test_e2e_cq as E
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead

P = FR_MOD


class ZkCircuit(E.MyCircuit):
    @classmethod
    def configure(cls, meta):
        cfg = E.MyCircuit.configure(meta)
        meta.zk_static_lookups = True
        return cfg


def _zk_pk(k=3):
    rng, srs, t1, t2, params, configs, b0 = E._setup(k)
    circuit = ZkCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)
    return rng, params, circuit, vk, pk


def test_zk_proof_verifies():
    rng, params, circuit, vk, pk = _zk_pk()
    proof = create_proof(params, pk, [circuit], [[]], rng=rng)
    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[]], Blake2bRead(proof))
    assert batcher.check()


def test_zk_device_path_matches_host():
    _, params, circuit, vk, pk = _zk_pk()
    proof_host = create_proof(params, pk, [circuit], [[]],
                              rng=random.Random(5))
    proof_dev = create_proof(params, pk, [circuit], [[]],
                             rng=random.Random(5), h_device=True)
    assert proof_host == proof_dev
    batcher = verify_proof(params, vk,
                           AccumulatorStrategy(params, rng=random.Random(5)),
                           [[]], Blake2bRead(proof_dev))
    assert batcher.check()


def test_zk_commitments_rerandomize():
    """Same witness, different prover randomness => different proof bytes
    for the CQ section, while the non-zk prover is deterministic there.
    Compare f||m commitment bytes (the first CQ writes after the advice
    phase would need transcript surgery; instead prove twice and diff)."""
    _, params, circuit, vk, pk = _zk_pk()
    p1 = create_proof(params, pk, [circuit], [[]], rng=random.Random(1))
    p2 = create_proof(params, pk, [circuit], [[]], rng=random.Random(2))
    assert p1 != p2
    for proof in (p1, p2):
        ok = verify_proof(params, vk,
                          AccumulatorStrategy(params, rng=random.Random(9)),
                          [[]], Blake2bRead(proof)).check()
        assert ok

    # direct hiding check at the argument level: identical witness state,
    # different rng => different m/a/qa/a0 commitments
    from sha2cq_tpu.plonk.static_lookup import (
        static_lookup_commit, static_lookup_commit_log_derivatives)
    from sha2cq_tpu.utils.transcript import Blake2bWrite

    cs = pk.vk.cs
    arg = cs.static_lookups[0]
    theta, beta = 7, 11

    def run(seed):
        tr = Blake2bWrite()
        advice = [[30, 6] + [0] * (params.n - 2),
                  [15, 3] + [0] * (params.n - 2)]
        committed = static_lookup_commit(
            arg, pk, params, theta, [], advice, pk.fixed_values, [],
            tr, rng=random.Random(seed))
        log = static_lookup_commit_log_derivatives(
            committed, pk, params, pk.vk.domain, beta, theta, tr)
        return tr.finalize(), log["a_at_zero"]

    b1, az1 = run(1)
    b2, az2 = run(2)
    assert b1 != b2, "zk commitments must re-randomize"
    assert az1 != az2, "A(0) must be blinded"


def test_zk_tampered_proof_fails():
    rng, params, circuit, vk, pk = _zk_pk()
    proof = bytearray(create_proof(params, pk, [circuit], [[]], rng=rng))
    proof[len(proof) // 2] ^= 1
    try:
        ok = verify_proof(params, vk,
                          AccumulatorStrategy(params, rng=random.Random(3)),
                          [[]], Blake2bRead(bytes(proof))).check()
    except Exception:
        ok = False
    assert not ok


def test_nonzk_default_untouched():
    """Without the flag, proofs are independent of the rng draws the zk mode
    would consume at the CQ stages (determinism of the CQ section is covered
    by byte-identity across the host/device provers in test_device_prover;
    here: the flag defaults off and proofs still verify)."""
    rng, srs, t1, t2, params, configs, b0 = E._setup(3)
    circuit = E.MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    assert not vk.cs.zk_static_lookups
    pk = keygen_pk(params, configs, b0, vk, circuit)
    proof = create_proof(params, pk, [circuit], [[]], rng=rng)
    ok = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                      [[]], Blake2bRead(proof)).check()
    assert ok


def test_zk_shplonk_multiopen():
    """zk static lookups compose with the SHPLONK multiopen scheme."""
    rng, params, circuit, vk, pk = _zk_pk()
    proof = create_proof(params, pk, [circuit], [[]], rng=rng,
                         multiopen="shplonk")
    ok = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                      [[]], Blake2bRead(proof), multiopen="shplonk").check()
    assert ok


def test_zk_multi_circuit_proof():
    """One zk proof over a slice of two circuits (prover.rs:51-60 parity)."""
    rng, params, circuit, vk, pk = _zk_pk()
    import tests.test_e2e_cq as E2
    c2 = ZkCircuit(circuit.table, circuit.table_2)
    proof = create_proof(params, pk, [circuit, c2], [[], []], rng=rng)
    ok = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                      [[], []], Blake2bRead(proof)).check()
    assert ok
