"""Host field tower + pairing algebra laws.

Mirrors the reference's field/curve law tests
(arithmetic/curves/src/tests/{field,curve}.rs, bn256/engine.rs engine_tests).
"""
import random

from sha2cq_tpu.fields import host as F
from sha2cq_tpu.curves import host as C

random.seed(42)


def test_fr_constants():
    # 2-adicity: omega^(2^28) == 1, omega^(2^27) != 1
    w = F.FR_ROOT_OF_UNITY
    assert pow(w, 1 << F.FR_S, F.FR_MOD) == 1
    assert pow(w, 1 << (F.FR_S - 1), F.FR_MOD) == F.FR_MOD - 1
    assert (F.FR_ROOT_OF_UNITY * F.FR_ROOT_OF_UNITY_INV) % F.FR_MOD == 1
    # zeta is a primitive cube root of unity
    assert pow(F.FR_ZETA, 3, F.FR_MOD) == 1 and F.FR_ZETA != 1
    assert (2 * F.FR_TWO_INV) % F.FR_MOD == 1


def test_fq2_laws():
    for _ in range(20):
        a = (random.randrange(F.P), random.randrange(F.P))
        b = (random.randrange(F.P), random.randrange(F.P))
        c = (random.randrange(F.P), random.randrange(F.P))
        assert F.fq2_mul(a, F.fq2_add(b, c)) == F.fq2_add(F.fq2_mul(a, b), F.fq2_mul(a, c))
        assert F.fq2_mul(a, b) == F.fq2_mul(b, a)
        assert F.fq2_sq(a) == F.fq2_mul(a, a)
        if a != (0, 0):
            assert F.fq2_mul(a, F.fq2_inv(a)) == F.FQ2_ONE


def _rand_fq6():
    return tuple((random.randrange(F.P), random.randrange(F.P)) for _ in range(3))


def _rand_fq12():
    return (_rand_fq6(), _rand_fq6())


def test_fq6_fq12_laws():
    for _ in range(5):
        a, b = _rand_fq6(), _rand_fq6()
        assert F.fq6_mul(a, b) == F.fq6_mul(b, a)
        assert F.fq6_mul(a, F.fq6_inv(a)) == F.FQ6_ONE
        x, y = _rand_fq12(), _rand_fq12()
        assert F.fq12_mul(x, y) == F.fq12_mul(y, x)
        assert F.fq12_mul(x, F.fq12_inv(x)) == F.FQ12_ONE
        assert F.fq12_sq(x) == F.fq12_mul(x, x)


def test_frobenius():
    for power in (1, 2, 3):
        x = _rand_fq12()
        assert F.fq12_frob(x, power) == F.fq12_pow(x, F.P ** power)


def test_g1_g2_groups():
    assert C.g1_is_on_curve(C.G1_GEN)
    assert C.g2_is_on_curve(C.G2_GEN)
    assert C.g1_mul(C.G1_GEN, F.FR_MOD) is None
    assert C.g2_mul(C.G2_GEN, F.FR_MOD) is None
    a, b = random.randrange(1 << 64), random.randrange(1 << 64)
    pa, pb = C.g1_mul(C.G1_GEN, a), C.g1_mul(C.G1_GEN, b)
    assert C.g1_add(pa, pb) == C.g1_mul(C.G1_GEN, a + b)
    assert C.g1_add(pa, C.g1_neg(pa)) is None
    qa = C.g2_mul(C.G2_GEN, a)
    assert C.g2_add(qa, C.g2_mul(C.G2_GEN, b)) == C.g2_mul(C.G2_GEN, a + b)


def test_pairing_bilinear():
    e = C.pairing(C.G1_GEN, C.G2_GEN)
    assert e != F.FQ12_ONE
    a, b = 1234567, 7654321
    assert C.pairing(C.g1_mul(C.G1_GEN, a), C.g2_mul(C.G2_GEN, b)) == F.fq12_pow(e, a * b)
    assert C.pairing_check([(C.G1_GEN, C.G2_GEN), (C.g1_neg(C.G1_GEN), C.G2_GEN)])
    # e(aP, Q) e(P, -aQ) = 1
    assert C.pairing_check([
        (C.g1_mul(C.G1_GEN, a), C.G2_GEN),
        (C.G1_GEN, C.g2_neg(C.g2_mul(C.G2_GEN, a))),
    ])


def test_pairing_batcher():
    """Batcher merges tuples by G2 and the merged set still verifies
    (reference batch_pairing.rs:109-187)."""
    a, b = 17, 23
    batcher = C.PairingBatcher(challenge=random.randrange(F.FR_MOD))
    # two equations sharing the G2 point [Q]:
    # e(aP, Q) * e(P, -aQ) = 1 and e(bP, Q) * e(P, -bQ) = 1
    batcher.add_pairing([
        (C.g1_mul(C.G1_GEN, a), C.G2_GEN),
        (C.G1_GEN, C.g2_neg(C.g2_mul(C.G2_GEN, a))),
    ])
    batcher.add_pairing([
        (C.g1_mul(C.G1_GEN, b), C.G2_GEN),
        (C.G1_GEN, C.g2_neg(C.g2_mul(C.G2_GEN, b))),
    ])
    merged = batcher.finalize()
    # 4 tuples but only 3 distinct G2 points
    assert len(merged) == 3
    assert C.pairing_check(merged)


def test_batch_inv():
    xs = [random.randrange(F.FR_MOD) for _ in range(10)] + [0]
    inv = F.batch_inv(xs, F.FR_MOD)
    for x, i in zip(xs, inv):
        if x == 0:
            assert i == 0
        else:
            assert (x * i) % F.FR_MOD == 1


def test_generic_curve_secp256k1():
    """Generic short-Weierstrass module covering the reference's secp256k1
    crate (arithmetic/curves/src/secp256k1/)."""
    from sha2cq_tpu.curves.generic import BN254_G1, Curve, secp256k1

    g = secp256k1.P.generator
    assert secp256k1.is_on_curve(g)
    assert secp256k1.mul(g, secp256k1.P.order) is None
    a, b = 123456789, 987654321
    assert secp256k1.add(secp256k1.mul(g, a), secp256k1.mul(g, b)) == \
        secp256k1.mul(g, a + b)
    # cross-check the generic path against the specialized BN254 host code
    bn = Curve(BN254_G1)
    assert bn.mul(bn.P.generator, 12345) == C.g1_mul(C.G1_GEN, 12345)
