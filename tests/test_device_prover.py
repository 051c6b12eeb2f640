"""Device (TPU-path) prover: h evaluated on device must produce proofs that
verify, and byte-identical transcripts to the host path under the same rng."""
import random

import tests.test_e2e_cq as E
from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead


def test_h_device_proof_matches_host():
    K = 3
    rng, srs, t1, t2, params, configs, b0 = E._setup(K)
    circuit = E.MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)

    rng_a = random.Random(123)
    proof_host = create_proof(params, pk, [circuit], [[]], rng=rng_a)
    rng_b = random.Random(123)
    proof_dev = create_proof(params, pk, [circuit], [[]], rng=rng_b,
                             h_device=True)
    # identical rng + identical h => byte-identical proofs
    assert proof_dev == proof_host

    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng_a),
                           [[]], Blake2bRead(proof_dev))
    assert batcher.check()
