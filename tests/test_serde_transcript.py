"""Serde round-trips and transcript determinism (reference transcript.rs,
derive/curve.rs GroupEncoding, derive/field.rs to_repr)."""
import random

from sha2cq_tpu.curves import host as C
from sha2cq_tpu.fields import host as F
from sha2cq_tpu.utils import serde
from sha2cq_tpu.utils.transcript import Blake2bRead, Blake2bWrite

random.seed(7)


def test_scalar_roundtrip():
    for _ in range(10):
        x = random.randrange(F.FR_MOD)
        assert serde.fr_from_bytes(serde.fr_to_bytes(x)) == x
    assert len(serde.fr_to_bytes(1)) == 32


def test_point_roundtrip():
    for _ in range(10):
        pt = C.g1_mul(C.G1_GEN, random.randrange(F.FR_MOD))
        enc = serde.g1_to_bytes(pt)
        assert len(enc) == 32
        assert serde.g1_from_bytes(enc) == pt
    assert serde.g1_from_bytes(serde.g1_to_bytes(None)) is None
    # parity bit actually used: P and -P encode differently
    pt = C.g1_mul(C.G1_GEN, 5)
    assert serde.g1_to_bytes(pt) != serde.g1_to_bytes(C.g1_neg(pt))


def test_transcript_prover_verifier_agree():
    pts = [C.g1_mul(C.G1_GEN, k) for k in (3, 5, 11)]
    scalars = [random.randrange(F.FR_MOD) for _ in range(3)]

    w = Blake2bWrite()
    w.write_point(pts[0])
    c1 = w.squeeze_challenge()
    w.write_scalar(scalars[0])
    w.write_point(pts[1])
    c2 = w.squeeze_challenge()
    w.write_scalar(scalars[1])
    w.write_scalar(scalars[2])
    w.write_point(pts[2])
    c3 = w.squeeze_challenge()
    proof = w.finalize()
    assert len(proof) == 3 * 32 + 3 * 32

    r = Blake2bRead(proof)
    assert r.read_point() == pts[0]
    assert r.squeeze_challenge() == c1
    assert r.read_scalar() == scalars[0]
    assert r.read_point() == pts[1]
    assert r.squeeze_challenge() == c2
    assert r.read_n_scalars(2) == scalars[1:3]
    assert r.read_point() == pts[2]
    assert r.squeeze_challenge() == c3
    assert r.done()
    # challenges in field and non-degenerate
    assert 0 < c1 < F.FR_MOD and c1 != c2 != c3


def test_transcript_domain_separation():
    """Same bytes as point vs scalar must give different challenges."""
    w1 = Blake2bWrite()
    w1.common_scalar(5)
    w2 = Blake2bWrite()
    w2.common_scalar(7)
    assert w1.squeeze_challenge() != w2.squeeze_challenge()


def test_g2_compressed_roundtrip():
    """Compressed G2 (64 B, reference GroupEncoding convention): random
    points round-trip, identity maps to zeros, corrupted x rejects."""
    import random

    import pytest

    from sha2cq_tpu.curves import host as CH
    from sha2cq_tpu.fields import host as F
    from sha2cq_tpu.utils import serde

    rng = random.Random(77)
    for _ in range(8):
        P = CH.g2_mul(CH.G2_GEN, rng.randrange(1, F.FR_MOD))
        assert serde.g2_from_bytes(serde.g2_to_bytes(P)) == P
    assert serde.g2_to_bytes(None) == bytes(64)
    assert serde.g2_from_bytes(bytes(64)) is None
    bad = bytearray(serde.g2_to_bytes(CH.G2_GEN))
    bad[0] ^= 1
    with pytest.raises(ValueError):
        serde.g2_from_bytes(bytes(bad))


def test_fq2_sqrt_laws():
    """fq2_sqrt: sqrt(x^2) in {x, -x}; non-residues return None and exactly
    half of random elements are squares (probabilistic sanity)."""
    import random

    from sha2cq_tpu.fields import host as F

    rng = random.Random(78)
    for _ in range(10):
        x = (rng.randrange(F.FQ_MOD), rng.randrange(F.FQ_MOD))
        s = F.fq2_sqrt(F.fq2_mul(x, x))
        assert s in (x, F.fq2_neg(x))
    hits = sum(F.fq2_sqrt((rng.randrange(F.FQ_MOD), rng.randrange(F.FQ_MOD)))
               is not None for _ in range(60))
    assert 15 <= hits <= 45
