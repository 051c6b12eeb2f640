"""Native (C) optimal-ate pairing vs the Python tower oracle.

bn_pairing_check (native/fieldops.c) implements the same Fq2-Jacobian
Miller loop and BN addition-chain final exponentiation as curves/host.py;
these tests pin bit-exact Fq12 equality on randomized inputs, the boolean
verdicts, and identity-pair filtering.
"""
import random

import pytest

from sha2cq_tpu import native_loader as NL
from sha2cq_tpu.curves import host as CH
from sha2cq_tpu.fields import host as F

pytestmark = pytest.mark.skipif(NL.get_lib() is None,
                                reason="native toolchain unavailable")


def _rand_pairs(rng, k):
    pairs = []
    for _ in range(k):
        a = rng.randrange(1, F.FR_MOD)
        b = rng.randrange(1, F.FR_MOD)
        pairs.append((CH.g1_mul(CH.G1_GEN, a), CH.g2_mul(CH.G2_GEN, b)))
    return pairs


def test_fq12_bit_exact_vs_python():
    rng = random.Random(11)
    for trial in range(3):
        pairs = _rand_pairs(rng, 1 + trial)
        ok, f = NL.native_pairing_check(pairs, want_fq12=True)
        ref = CH.final_exponentiation(CH.multi_miller_loop(pairs))
        assert f == ref
        assert ok == (ref == CH.FQ12_ONE)


def test_bilinearity_and_refutation():
    rng = random.Random(12)
    a = rng.randrange(1, F.FR_MOD)
    b = rng.randrange(1, F.FR_MOD)
    good = [(CH.g1_mul(CH.G1_GEN, a), CH.g2_mul(CH.G2_GEN, b)),
            (CH.g1_neg(CH.g1_mul(CH.G1_GEN, a * b % F.FR_MOD)), CH.G2_GEN)]
    assert NL.native_pairing_check(good) is True
    bad = list(good)
    bad[0] = (CH.g1_mul(CH.G1_GEN, a + 1), good[0][1])
    assert NL.native_pairing_check(bad) is False


def test_identity_pairs_filtered():
    rng = random.Random(13)
    a = rng.randrange(1, F.FR_MOD)
    good = [(CH.g1_mul(CH.G1_GEN, a), CH.G2_GEN),
            (None, CH.G2_GEN),            # e(0, Q) = 1
            (CH.g1_neg(CH.g1_mul(CH.G1_GEN, a)), CH.G2_GEN)]
    assert NL.native_pairing_check(good) is True


def test_pairing_check_dispatch():
    """curves/host.pairing_check must agree with the Python tower."""
    rng = random.Random(14)
    pairs = _rand_pairs(rng, 2)
    native = CH.pairing_check(pairs)
    oracle = CH.final_exponentiation(CH.multi_miller_loop(pairs)) == CH.FQ12_ONE
    assert native == oracle
