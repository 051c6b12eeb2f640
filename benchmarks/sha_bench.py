"""SHA2-on-CQ proof wall-clock benchmark (BASELINE.json config class:
"Prove+verify SHA of a single block").

Runs the full pipeline at a selectable limb scheme:
  mini  — 4-bit words (2^7 max table), seconds-scale smoke
  test  — 8-bit words (2^12 max table, 64 real rounds + schedule)
  short — 16-bit words (ShortLimbs, 2^19 max table — the reference's
          intended scheme, preprocessable only via the native FK path)

Usage: python benchmarks/sha_bench.py [mini|test|short]
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.models.sha.circuit import Sha2CqCircuit
from sha2cq_tpu.models.sha.setup import build_sha_setup
from sha2cq_tpu.models.sha.tables import MINI_LIMBS, SHORT_LIMBS, TEST_LIMBS
from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from sha2cq_tpu.poly.kzg.params import ParamsKZG
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead

P = FR_MOD
K = 7


def main():
    scheme = sys.argv[1] if len(sys.argv) > 1 else "mini"
    limbs = {"mini": MINI_LIMBS, "test": TEST_LIMBS, "short": SHORT_LIMBS}[scheme]

    class C(Sha2CqCircuit):
        LIMBS = limbs

    rng = random.Random(0xBE)
    s = rng.randrange(P)
    stats = {"scheme": scheme, "word_bits": limbs.word_len}

    t0 = time.time()
    tables, configs, b0, srs = build_sha_setup(limbs, 1 << K, s)
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    stats["setup_s"] = round(time.time() - t0, 1)
    print("setup:", stats["setup_s"], "s; table sizes:", sorted(configs))

    msg = [rng.randrange(1 << limbs.word_len) for _ in range(16)]
    circuit = C(msg, tables)
    digest = circuit.expected_digest()

    t0 = time.time()
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)
    stats["keygen_s"] = round(time.time() - t0, 1)
    print("keygen:", stats["keygen_s"], "s")

    t0 = time.time()
    proof = create_proof(params, pk, [circuit], [[digest]], rng=rng)
    stats["prove_s"] = round(time.time() - t0, 1)
    stats["proof_bytes"] = len(proof)
    print("prove:", stats["prove_s"], "s; proof:", len(proof), "B")

    t0 = time.time()
    ok = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                      [[digest]], Blake2bRead(proof)).check()
    stats["verify_s"] = round(time.time() - t0, 1)
    print("verify:", ok, stats["verify_s"], "s")
    assert ok
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
