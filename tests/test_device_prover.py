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


def test_h_device_mxu_proof_matches_host():
    """MXU matmul-NTT basis conversions (ops/mxu_ntt.py) threaded through the
    device h-path must stay byte-identical to the host path.  Forced on at
    tiny k (auto only engages at k >= 12) so CI covers the production route
    the real-SHA prover takes on the TPU."""
    K = 3
    rng, srs, t1, t2, params, configs, b0 = E._setup(K)
    circuit = E.MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)

    rng_a = random.Random(321)
    proof_host = create_proof(params, pk, [circuit], [[]], rng=rng_a)
    rng_b = random.Random(321)
    proof_mxu = create_proof(params, pk, [circuit], [[]], rng=rng_b,
                             h_device=True, h_mxu=True)
    assert proof_mxu == proof_host

    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng_a),
                           [[]], Blake2bRead(proof_mxu))
    assert batcher.check()
