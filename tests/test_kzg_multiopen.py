"""KZG params + GWC multiopen round trip (reference poly/multiopen_test.rs,
kzg/commitment.rs:570-621)."""
import random

from sha2cq_tpu.curves import host as CH
from sha2cq_tpu.fields import host as H
from sha2cq_tpu.poly import arith as A
from sha2cq_tpu.poly.domain import EvaluationDomain
from sha2cq_tpu.poly.kzg.gwc import (ProverQuery, VerifierQuery,
                                     gwc_create_proof, gwc_verify_proof)
from sha2cq_tpu.poly.kzg.msm_accum import DualMSM
from sha2cq_tpu.poly.kzg.params import ParamsKZG, TableSRS
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead, Blake2bWrite

P = H.FR_MOD
random.seed(13)


def test_params_commit_consistency():
    """commit(coeffs) == commit_lagrange(evals) (kzg/commitment.rs test)."""
    k = 3
    params = ParamsKZG.setup_from_toxic_waste(k, s=0xBEEF)
    dom = EvaluationDomain(1, k)
    coeffs = [random.randrange(P) for _ in range(1 << k)]
    evals = dom.coeff_to_lagrange_host(coeffs)
    assert params.commit(coeffs) == params.commit_lagrange(evals)
    # and it equals [p(s)]G1 directly
    ps = A.eval_polynomial(coeffs, 0xBEEF)
    assert params.commit(coeffs) == CH.g1_mul(CH.G1_GEN, ps)


def test_table_srs_bases():
    s = 0x1234
    n = 8
    srs = TableSRS.setup_from_toxic_waste(n - 1, n, s)
    assert len(srs.g1) == n and len(srs.g2) == n + 1
    # g2 powers
    assert srs.g2[0] == CH.G2_GEN
    assert srs.g2[2] == CH.g2_mul(CH.G2_GEN, s * s)
    # Lagrange basis sums to [1]G1: sum_i L_i(s) = 1
    acc = None
    for pt in srs.g1_lagrange:
        acc = CH.g1_add(acc, pt)
    assert acc == CH.G1_GEN
    # opening-at-0 basis: [(L_i(x) - L_i(0))/x]_1 * x == [L_i(x)]_1 - [L_i(0)]_1
    # check via pairing-free scalar identity using known s
    dom = EvaluationDomain(1, 3)
    for i in (0, 3, 7):
        li_coeffs = [0] * n
        li_coeffs[i] = 1
        li = dom.lagrange_to_coeff_host(li_coeffs)  # L_i in coeff form
        li_s = A.eval_polynomial(li, s)
        li_0 = li[0]
        expected = (li_s - li_0) * pow(s, P - 2, P) % P
        assert srs.g_lagrange_opening_at_0[i] == CH.g1_mul(CH.G1_GEN, expected)


def test_gwc_roundtrip():
    k = 3
    s = random.randrange(P)
    params = ParamsKZG.setup_from_toxic_waste(k, s)
    n = 1 << k

    polys = [[random.randrange(P) for _ in range(n)] for _ in range(3)]
    commits = [params.commit(p) for p in polys]
    z1, z2 = random.randrange(P), random.randrange(P)

    # open p0, p1 at z1 and p1, p2 at z2
    w = Blake2bWrite()
    gwc_create_proof(params, [
        ProverQuery(z1, polys[0]),
        ProverQuery(z1, polys[1]),
        ProverQuery(z2, polys[1]),
        ProverQuery(z2, polys[2]),
    ], w)
    proof = w.finalize()
    assert len(proof) == 2 * 32  # one W point per distinct opening point

    r = Blake2bRead(proof)
    queries = [
        VerifierQuery(z1, commits[0], A.eval_polynomial(polys[0], z1)),
        VerifierQuery(z1, commits[1], A.eval_polynomial(polys[1], z1)),
        VerifierQuery(z2, commits[1], A.eval_polynomial(polys[1], z2)),
        VerifierQuery(z2, commits[2], A.eval_polynomial(polys[2], z2)),
    ]
    acc = gwc_verify_proof(params, queries, r, DualMSM(params))
    assert acc.check()

    # wrong eval must fail
    r = Blake2bRead(proof)
    bad = [
        VerifierQuery(z1, commits[0], (A.eval_polynomial(polys[0], z1) + 1) % P),
    ] + queries[1:]
    acc = gwc_verify_proof(params, bad, r, DualMSM(params))
    assert not acc.check()


def test_accumulator_strategy_and_batcher():
    k = 2
    params = ParamsKZG.setup_from_toxic_waste(k, 0x77)
    n = 1 << k
    poly = [random.randrange(P) for _ in range(n)]
    com = params.commit(poly)
    z = random.randrange(P)

    w = Blake2bWrite()
    gwc_create_proof(params, [ProverQuery(z, poly)], w)
    proof = w.finalize()

    strategy = AccumulatorStrategy(params, rng=random)
    r = Blake2bRead(proof)
    strategy = strategy.process(
        lambda acc: gwc_verify_proof(
            params, [VerifierQuery(z, com, A.eval_polynomial(poly, z))], r, acc)
    )
    assert strategy.finalize()

    # merge into a PairingBatcher and check there too
    strategy2 = AccumulatorStrategy(params, rng=random)
    r = Blake2bRead(proof)
    strategy2 = strategy2.process(
        lambda acc: gwc_verify_proof(
            params, [VerifierQuery(z, com, A.eval_polynomial(poly, z))], r, acc)
    )
    batcher = CH.PairingBatcher(challenge=random.randrange(P))
    strategy2.merge_with_pairing_batcher(batcher)
    assert batcher.check()


def test_kate_division():
    coeffs = [random.randrange(P) for _ in range(8)]
    b = random.randrange(P)
    q = A.kate_division(coeffs, b, debug=True)
    # q(x) * (x - b) + p(b) == p(x) at a random point
    x = random.randrange(P)
    lhs = (A.eval_polynomial(q, x) * (x - b) + A.eval_polynomial(coeffs, b)) % P
    assert lhs == A.eval_polynomial(coeffs, x)


def test_shplonk_roundtrip():
    """SHPLONK: 2-point proof regardless of query count (reference
    poly/kzg/multiopen/shplonk)."""
    from sha2cq_tpu.poly.kzg.shplonk import (shplonk_create_proof,
                                             shplonk_verify_proof)
    k = 3
    s = random.randrange(P)
    params = ParamsKZG.setup_from_toxic_waste(k, s)
    n = 1 << k
    polys = [[random.randrange(P) for _ in range(n)] for _ in range(3)]
    commits = [params.commit(p) for p in polys]
    z1, z2, z3 = (random.randrange(P) for _ in range(3))

    # rotation sets: p0 @ {z1, z2}; p1 @ {z1, z2}; p2 @ {z3}
    pq = [ProverQuery(z1, polys[0]), ProverQuery(z2, polys[0]),
          ProverQuery(z1, polys[1]), ProverQuery(z2, polys[1]),
          ProverQuery(z3, polys[2])]
    w = Blake2bWrite()
    shplonk_create_proof(params, pq, w)
    proof = w.finalize()
    assert len(proof) == 2 * 32  # always two commitments

    def vq():
        return [
            VerifierQuery(z1, commits[0], A.eval_polynomial(polys[0], z1)),
            VerifierQuery(z2, commits[0], A.eval_polynomial(polys[0], z2)),
            VerifierQuery(z1, commits[1], A.eval_polynomial(polys[1], z1)),
            VerifierQuery(z2, commits[1], A.eval_polynomial(polys[1], z2)),
            VerifierQuery(z3, commits[2], A.eval_polynomial(polys[2], z3)),
        ]

    acc = shplonk_verify_proof(params, vq(), Blake2bRead(proof), DualMSM(params))
    assert acc.check()

    bad = vq()
    bad[0] = VerifierQuery(z1, commits[0], (bad[0].eval + 1) % P)
    acc = shplonk_verify_proof(params, bad, Blake2bRead(proof), DualMSM(params))
    assert not acc.check()


def test_shplonk_full_protocol():
    """End-to-end prove/verify with the SHPLONK multiopen selected."""
    import random as _r
    from sha2cq_tpu.circuit import Value
    from sha2cq_tpu.plonk import (ConstraintSystem, create_proof, keygen_pk,
                                  keygen_vk, verify_proof)
    from sha2cq_tpu.utils.transcript import Blake2bRead as _Read

    class SqCircuit:
        def __init__(self, x):
            self.x = x

        @classmethod
        def configure(cls, meta):
            a = meta.advice_column()
            q = meta.fixed_column()
            meta.create_gate("sq", lambda c: [
                c.query_fixed(q, 0) * (c.query_advice(a, 0) * c.query_advice(a, 0)
                                       - c.query_advice(a, 1))])
            return (a, q)

        def synthesize(self, cfg, layouter):
            a, q = cfg

            def f(region):
                region.assign_fixed(q, 0, Value.known(1))
                region.assign_advice(a, 0, Value.known(self.x))
                region.assign_advice(a, 1, Value.known(self.x * self.x % P))
            layouter.assign_region("sq", f)

    rng = _r.Random(5)
    params = ParamsKZG.setup_from_toxic_waste(4, rng.randrange(P))
    c = SqCircuit(7)
    vk = keygen_vk(params, c)
    pk = keygen_pk(params, {}, [], vk, c)
    proof = create_proof(params, pk, [c], [[]], rng=rng, multiopen="shplonk")
    batcher = verify_proof(params, vk, AccumulatorStrategy(params, rng=rng),
                           [[]], _Read(proof), multiopen="shplonk")
    assert batcher.check()


def test_shplonk_native_path_matches_python_bytes():
    """The native-kernel SHPLONK prover (buffer Horner folds + native kate)
    must produce byte-identical transcripts to the list path — same shape of
    guarantee as the GWC native path and the device h-path."""
    import random

    import pytest

    from sha2cq_tpu.native_loader import get_lib
    from sha2cq_tpu.poly.kzg import shplonk as S
    from sha2cq_tpu.poly.kzg.gwc import ProverQuery
    from sha2cq_tpu.poly.kzg.params import ParamsKZG
    from sha2cq_tpu.utils.transcript import Blake2bWrite

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")

    rng = random.Random(11)
    k = 10
    params = ParamsKZG.setup_from_toxic_waste(k, rng.randrange(P))
    n = params.n
    polys = [[rng.randrange(P) for _ in range(n)] for _ in range(5)]
    x = rng.randrange(P)
    wx = rng.randrange(P)
    # poly 0,1 open at {x, wx}; 2,3 at {x}; 4 at {wx}: three rotation sets
    queries = [
        ProverQuery(x, polys[0]), ProverQuery(wx, polys[0]),
        ProverQuery(x, polys[1]), ProverQuery(wx, polys[1]),
        ProverQuery(x, polys[2]), ProverQuery(x, polys[3]),
        ProverQuery(wx, polys[4]),
    ]

    t_native = Blake2bWrite()
    y1 = t_native.squeeze_challenge()
    S._shplonk_create_proof_native(params, queries, t_native, y1)

    t_python = Blake2bWrite()
    y2 = t_python.squeeze_challenge()
    assert y1 == y2
    S._shplonk_create_proof_python(params, queries, t_python, y2)

    assert t_native.finalize() == t_python.finalize()
