"""SHA2-on-CQ circuit end-to-end at the MINI (4-bit word) limb scheme.

The reference stops at table generators (SURVEY.md §1-L5: "The actual
SHA-256-on-CQ circuit is not present in the reference"); this exercises our
completed circuit: 64 real rounds with message schedule, carry-correct
modular addition via decomposition lookups, per-limb maj/ch, digest exposed
as public instance — MockProver + full proof + pairing check.
"""
import random

import pytest

from sha2cq_tpu.dev.mock_prover import MockProver
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.models.sha import sha256 as model
from sha2cq_tpu.models.sha.circuit import Sha2CqCircuit
from sha2cq_tpu.models.sha.setup import build_sha_setup
from sha2cq_tpu.models.sha.tables import MINI_LIMBS
from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from sha2cq_tpu.poly.kzg.params import ParamsKZG
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead

P = FR_MOD
K = 7  # 128 rows: 64 rounds + 4 shift rows + blinding


class MiniShaCircuit(Sha2CqCircuit):
    LIMBS = MINI_LIMBS


@pytest.fixture(scope="module")
def sha_setup():
    rng = random.Random(0x5AA)
    s = rng.randrange(P)
    static_tables, configs, b0_bound, srs = build_sha_setup(MINI_LIMBS, 1 << K, s)
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    return rng, static_tables, configs, b0_bound, params


def _message(rng):
    w = MINI_LIMBS.word_len
    return [rng.randrange(1 << w) for _ in range(16)]


def test_sha_circuit_mock(sha_setup):
    rng, tables, configs, b0_bound, params = sha_setup
    msg = _message(random.Random(1))
    circuit = MiniShaCircuit(msg, tables)
    digest = circuit.expected_digest()
    prover = MockProver.run(K, circuit, [digest])
    prover.assert_satisfied()

    # wrong digest must fail (permutation/copy violation)
    bad = list(digest)
    bad[0] ^= 1
    failures = MockProver.run(K, circuit, [bad]).verify()
    assert failures, "wrong digest must not satisfy"


def test_sha_circuit_proof(sha_setup):
    rng, tables, configs, b0_bound, params = sha_setup
    msg = _message(random.Random(2))
    circuit = MiniShaCircuit(msg, tables)
    digest = circuit.expected_digest()

    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0_bound, vk, circuit)
    proof = create_proof(params, pk, [circuit], [[digest]], rng=rng)
    assert len(proof) > 0

    read = Blake2bRead(proof)
    strategy = AccumulatorStrategy(params, rng=rng)
    batcher = verify_proof(params, vk, strategy, [[digest]], read)
    assert batcher.check(), "SHA proof failed pairing check"

    # wrong public digest must fail verification
    bad = list(digest)
    bad[3] = (bad[3] + 1) % (1 << MINI_LIMBS.word_len)
    read = Blake2bRead(proof)
    strategy = AccumulatorStrategy(params, rng=rng)
    batcher = verify_proof(params, vk, strategy, [[bad]], read)
    assert not batcher.check(), "wrong digest must not verify"
