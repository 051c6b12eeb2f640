"""Real-SHA-256-shape circuit (circuit32) end-to-end at the 8-bit CI scheme.

circuit32 is the FIPS circuit: 16-bit-halves sigma tables, piece-XOR
recombination, 6-limb maj/ch, carry-bit modular adds, Davies-Meyer
feed-forward and multi-block chaining.  SCHEME8 instantiates the identical
code with 8-bit words so every gate and lookup is exercised in seconds;
SCHEME32 (benchmarks/sha256_bench.py) is the real thing.

Also pins the w=32 witness model against hashlib (the "hashlib-checked
digest" acceptance from VERDICT item 1).
"""
import hashlib
import os
import random

import pytest

from sha2cq_tpu.dev.mock_prover import MockProver
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.models.sha import sha256 as model
from sha2cq_tpu.models.sha.circuit32 import Sha256Circuit
from sha2cq_tpu.models.sha.setup32 import build_sha256_setup
from sha2cq_tpu.models.sha.tables32 import SCHEME8, SCHEME32
from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from sha2cq_tpu.poly.kzg.params import ParamsKZG
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead

P = FR_MOD
# one circuit size for every proof: the committed tables' b0 degree bound
# (x_b0_bound) is baked for a specific circuit domain at commit time
K = 8    # 256 rows: holds 1 or 2 chained 72-row blocks


class MiniSha256(Sha256Circuit):
    SCHEME = SCHEME8


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(0x256)
    s = rng.randrange(P)
    tables, configs, b0, srs = build_sha256_setup(SCHEME8, 1 << K, s, cache=False)
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    return rng, tables, configs, b0, params, srs


def _blocks(rng, n):
    wb = SCHEME8.word_bits
    return [[rng.randrange(1 << wb) for _ in range(16)] for _ in range(n)]


def test_sha256_model_matches_hashlib():
    for msg in (b"", b"abc", b"a" * 55, b"b" * 56, b"c" * 200):
        assert model.sha256(msg) == hashlib.sha256(msg).digest()


def test_sha256_circuit_mock_single_block(setup):
    rng, tables, configs, b0, params, srs = setup
    circuit = MiniSha256(_blocks(random.Random(7), 1), tables)
    digest = circuit.expected_digest()
    MockProver.run(K, circuit, [digest]).assert_satisfied()

    bad = list(digest)
    bad[0] ^= 1
    assert MockProver.run(K, circuit, [bad]).verify(), "wrong digest must fail"


def test_sha256_circuit_mock_two_blocks(setup):
    rng, tables, configs, b0, params, srs = setup
    circuit = MiniSha256(_blocks(random.Random(8), 2), tables)
    digest = circuit.expected_digest()
    MockProver.run(K, circuit, [digest]).assert_satisfied()


def test_sha256_circuit_proof_single_block(setup):
    rng, tables, configs, b0, params, srs = setup
    circuit = MiniSha256(_blocks(random.Random(9), 1), tables)
    digest = circuit.expected_digest()

    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)
    proof = create_proof(params, pk, [circuit], [[digest]], rng=rng)

    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[digest]], Blake2bRead(proof))
    assert batcher.check(), "SHA-256 proof failed pairing check"

    bad = list(digest)
    bad[5] ^= 3
    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[bad]], Blake2bRead(proof))
    assert not batcher.check(), "wrong digest must not verify"


def test_sha256_circuit_proof_two_blocks(setup):
    rng, tables, configs, b0, params, srs = setup
    circuit = MiniSha256(_blocks(random.Random(10), 2), tables)
    digest = circuit.expected_digest()

    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)
    proof = create_proof(params, pk, [circuit], [[digest]], rng=rng)

    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[digest]], Blake2bRead(proof))
    assert batcher.check(), "two-block chained proof failed"


def test_sha256_circuit_mock_32bit_single_block():
    """MockProver over the REAL 32-bit scheme (values-only tables — no FK /
    commitments needed for the mock): one full FIPS block, every gate and
    CQ membership checked at word_bits=32 rather than the 8-bit CI proxy."""
    from sha2cq_tpu.models.sha.setup32 import build_mock_tables
    tables = build_mock_tables(SCHEME32)
    rng = random.Random(11)
    blocks = [[rng.randrange(1 << 32) for _ in range(16)]]
    circuit = Sha256Circuit(blocks, tables)
    digest = circuit.expected_digest()

    # digest cross-check vs the executable FIPS model (one raw 64-byte
    # block, no padding added)
    state = model.sha_compress_final(model.h_constants(32), blocks[0], 32)
    assert list(state) == list(digest)

    MockProver.run(7, circuit, [digest]).assert_satisfied()


def test_sha256_circuit_mock_32bit_two_blocks():
    """Multi-block MockProver at word_bits=32 (VERDICT r3 item 10): two
    chained FIPS blocks through the short-circuiting expression walk
    (Expression.evaluate_lazy, reference circuit.rs:713-1026) — covers the
    Davies-Meyer chain handoff the single-block mock cannot."""
    from sha2cq_tpu.models.sha.setup32 import build_mock_tables
    tables = build_mock_tables(SCHEME32)
    rng = random.Random(12)
    blocks = [[rng.randrange(1 << 32) for _ in range(16)] for _ in range(2)]
    circuit = Sha256Circuit(blocks, tables)
    digest = circuit.expected_digest()

    state = model.h_constants(32)
    for blk in blocks:
        state = model.sha_compress_final(state, blk, 32)
    assert list(state) == list(digest)

    MockProver.run(8, circuit, [digest]).assert_satisfied()
