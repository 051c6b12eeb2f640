"""secp256k1 parity tests (reference arithmetic/curves/src/secp256k1/)."""
import random

from sha2cq_tpu.curves import secp256k1 as S


def test_generator_on_curve_and_order():
    assert S.is_on_curve(S.GENERATOR)
    # n * G = identity (curve order = FQ_MOD)
    assert S.mul(S.GENERATOR, S.FQ_MOD) is None
    assert S.mul(S.GENERATOR, 1) == S.GENERATOR


def test_group_laws():
    rng = random.Random(1)
    a, b = rng.randrange(1, S.FQ_MOD), rng.randrange(1, S.FQ_MOD)
    P = S.mul(S.GENERATOR, a)
    Q = S.mul(S.GENERATOR, b)
    # commutativity + distributivity over scalars
    PQ = S.jac_to_affine(S.jac_add(S.jac_from_affine(P), S.jac_from_affine(Q)))
    QP = S.jac_to_affine(S.jac_add(S.jac_from_affine(Q), S.jac_from_affine(P)))
    assert PQ == QP == S.mul(S.GENERATOR, (a + b) % S.FQ_MOD)
    # doubling consistency
    assert S.jac_to_affine(S.jac_double(S.jac_from_affine(P))) == \
        S.mul(S.GENERATOR, 2 * a % S.FQ_MOD)
    # inverse
    assert S.jac_to_affine(
        S.jac_add(S.jac_from_affine(P), S.jac_from_affine(S.neg(P)))) is None


def test_msm_matches_sum():
    rng = random.Random(2)
    pts = [S.mul(S.GENERATOR, rng.randrange(1, S.FQ_MOD)) for _ in range(5)]
    scalars = [rng.randrange(S.FQ_MOD) for _ in range(5)]
    acc = S.JAC_IDENTITY
    for s, p in zip(scalars, pts):
        acc = S.jac_add(acc, S.jac_from_affine(S.mul(p, s)))
    assert S.msm(scalars, pts) == S.jac_to_affine(acc)


def test_sqrt_both_fields():
    rng = random.Random(3)
    for _ in range(4):
        x = rng.randrange(1, S.FP_MOD)
        r = S.fp_sqrt(x * x % S.FP_MOD)
        assert r is not None and r * r % S.FP_MOD == x * x % S.FP_MOD
        y = rng.randrange(1, S.FQ_MOD)
        r = S.fq_sqrt(y * y % S.FQ_MOD)
        assert r is not None and r * r % S.FQ_MOD == y * y % S.FQ_MOD
    # fq 2-adicity sanity: root_of_unity has exact order 2^6 (fq.rs:79-116)
    w = S.FQ_ROOT_OF_UNITY
    assert pow(w, 1 << S.FQ_S, S.FQ_MOD) == 1
    assert pow(w, 1 << (S.FQ_S - 1), S.FQ_MOD) != 1


def test_serde_roundtrip():
    rng = random.Random(4)
    for _ in range(4):
        p = S.mul(S.GENERATOR, rng.randrange(1, S.FQ_MOD))
        assert S.from_bytes(S.to_bytes(p)) == p
    assert S.from_bytes(S.to_bytes(None)) is None


def test_device_montgomery_kernels():
    """The generic 16-limb mont_mul works for the secp moduli unchanged."""
    import numpy as np

    from sha2cq_tpu.fields import device as D
    fp_ctx, fq_ctx = S.device_ctxs()
    rng = random.Random(5)
    for ctx, mod in ((fp_ctx, S.FP_MOD), (fq_ctx, S.FQ_MOD)):
        xs = [rng.randrange(mod) for _ in range(8)]
        ys = [rng.randrange(mod) for _ in range(8)]
        a = D.pack(xs, ctx)
        b = D.pack(ys, ctx)
        got = D.unpack(D.mont_mul(a, b, ctx), ctx)
        assert got == [x * y % mod for x, y in zip(xs, ys)]
