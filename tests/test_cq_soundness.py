"""CQ static-lookup soundness probes: targeted proof tampering must fail the
pairing batch.  Complements test_e2e_cq's byte-flip test with semantically
meaningful corruptions at known transcript offsets."""
import random

import tests.test_e2e_cq as E
from sha2cq_tpu.curves import host as CH
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils import serde
from sha2cq_tpu.utils.transcript import Blake2bRead

P = FR_MOD


def _proof_and_keys():
    K = 3
    rng, srs, t1, t2, params, configs, b0 = E._setup(K)
    circuit = E.MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)
    proof = create_proof(params, pk, [circuit], [[]], rng=rng)
    return params, vk, proof, rng


def _verifies(params, vk, proof, rng):
    try:
        batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                               [[]], Blake2bRead(proof))
    except ValueError:
        return False
    return batcher.check()


def test_cq_commitment_tampering():
    params, vk, proof, rng = _proof_and_keys()
    assert _verifies(params, vk, proof, rng)

    # The proof layout starts with 2 advice commitments, then per static
    # lookup: f, m points.  Replace the m commitment (point #3, offset 96)
    # with a valid-but-wrong group element: encoding parses, pairing fails.
    wrong_point = serde.g1_to_bytes(CH.g1_mul(CH.G1_GEN, 0xDEAD))
    for point_index in (2, 3):  # f_cm, m_cm of the first lookup
        bad = bytearray(proof)
        off = 32 * point_index
        bad[off:off + 32] = wrong_point
        assert not _verifies(params, vk, bytes(bad), rng), \
            f"tampered commitment {point_index} verified"


def test_cq_evaluation_tampering():
    params, vk, proof, rng = _proof_and_keys()
    # scalars live at the tail (evals before the GWC W points); walk a few
    # scalar-aligned positions and overwrite with a random field element
    rnd = random.Random(5)
    tampered_any = False
    for scalar_slot in range(3, 9):
        off = len(proof) - 32 * scalar_slot
        bad = bytearray(proof)
        bad[off:off + 32] = serde.fr_to_bytes(rnd.randrange(P))
        if bad != bytearray(proof):
            tampered_any = True
            assert not _verifies(params, vk, bytes(bad), rng), \
                f"tampered scalar at -{scalar_slot} verified"
    assert tampered_any


def test_cq_proof_truncation_and_extension():
    params, vk, proof, rng = _proof_and_keys()
    try:
        ok = _verifies(params, vk, proof[:-32], rng)
        assert not ok
    except Exception:
        pass  # rejecting with an exception is fine
    # extension: extra bytes are simply never read — the transcript-driven
    # reader stops at the protocol's end, so the proof still verifies; a
    # caller enforcing exact length uses Blake2bRead.done()
    r = Blake2bRead(proof + b"\x00" * 32)
    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng), [[]], r)
    assert batcher.check()
    assert not r.done()
