"""Multi-proof batch verification through one AccumulatorStrategy.

The reference's AccumulatorStrategy random-scales a running DualMSM across
many verify_proof calls so N proofs share a single final pairing check
(strategy.rs:53-121, driven per-proof in its tests).  This matrix pins that
behavior across both multiopen schemes: N distinct proofs accumulate into
one passing check, and a tampered evaluation in ANY earlier proof poisons
the final accumulated check (the random scaling cannot un-mix it).
"""
import random

import pytest

import tests.test_e2e_cq as E
from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead


def _make(K=3, n_proofs=3, multiopen="gwc"):
    rng, srs, t1, t2, params, configs, b0 = E._setup(K)
    circuit = E.MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)
    proofs = [
        create_proof(params, pk, [circuit], [[]], rng=random.Random(1000 + i),
                     multiopen=multiopen)
        for i in range(n_proofs)
    ]
    return params, vk, proofs, rng


@pytest.mark.parametrize("multiopen", ["gwc", "shplonk"])
def test_batch_accumulates_n_proofs(multiopen):
    params, vk, proofs, rng = _make(multiopen=multiopen)
    assert len(set(proofs)) == len(proofs), "proofs should be distinct (blinding)"

    strategy = AccumulatorStrategy(params.verifier_params(), rng=rng)
    batchers = []
    for proof in proofs:
        batchers.append(verify_proof(
            params.verifier_params(), vk, strategy, [[]],
            Blake2bRead(proof), multiopen=multiopen))
    # the accumulator carries every proof's opening; the final batcher is the
    # single check for all of them (each batcher also carries that proof's
    # CQ pairing equations, so all are checked)
    for b in batchers:
        assert b.check()


@pytest.mark.parametrize("multiopen", ["gwc", "shplonk"])
def test_batch_detects_tampered_middle_proof(multiopen):
    params, vk, proofs, rng = _make(multiopen=multiopen)
    bad = bytearray(proofs[1])
    bad[-40] ^= 1  # an evaluation scalar near the tail
    proofs[1] = bytes(bad)

    strategy = AccumulatorStrategy(params.verifier_params(), rng=rng)
    last = None
    try:
        for proof in proofs:
            last = verify_proof(params.verifier_params(), vk, strategy, [[]],
                                Blake2bRead(proof), multiopen=multiopen)
    except ValueError:
        return  # rejected while reading — also acceptable
    assert not last.check(), \
        "tampering proof 1 must poison the accumulated final check"
