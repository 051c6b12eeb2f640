"""Native (C) Fr scalar-field kernels vs the pure-Python oracles.

fieldops.c fr_* kernels back the host prover's CQ log-derivative iNTTs,
multiopen folds/evals and kate division (reference arithmetic.rs:304-387,
static_lookup/prover.rs:259-303).  Skipped when no C toolchain is available
(every consumer falls back to Python).
"""
import random

import pytest

from sha2cq_tpu.fields.host import FR_MOD as P
from sha2cq_tpu.fields.host import FR_ROOT_OF_UNITY, FR_S
from sha2cq_tpu.native_loader import (fr_buf, fr_unbuf, get_lib,
                                      native_fr_batch_inv, native_fr_eval,
                                      native_fr_fold_buf, native_fr_kate_buf,
                                      native_fr_ntt)
from sha2cq_tpu.ops.ntt import _host_twiddle_buf, _ntt_host_py

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native library")

K = 9
N = 1 << K


@pytest.fixture(scope="module")
def vals():
    rng = random.Random(0xF4)
    return [rng.randrange(P) for _ in range(N)]


def test_fr_ntt_matches_python(vals):
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - K), P)
    got = native_fr_ntt(vals, _host_twiddle_buf(omega, N, P), K)
    assert got == _ntt_host_py(vals, omega, P)


def test_fr_eval_matches_horner(vals):
    x = random.Random(1).randrange(P)
    acc = 0
    for c in reversed(vals):
        acc = (acc * x + c) % P
    assert native_fr_eval(vals, x) == acc


def test_fr_kate_matches_synthetic_division(vals):
    b = random.Random(2).randrange(P)
    q = [0] * N
    tmp = 0
    for i in range(N - 1, -1, -1):
        q[i] = tmp = (vals[i] + tmp * b) % P
    assert fr_unbuf(native_fr_kate_buf(fr_buf(vals), b)) == q[1:]


def test_fr_fold_shorter_addend(vals):
    rng = random.Random(3)
    acc0 = [rng.randrange(P) for _ in range(N)]
    add = vals[: N // 2]
    v = rng.randrange(P)
    buf = fr_buf(acc0)
    assert native_fr_fold_buf(buf, fr_buf(add), v)
    expect = [(a * v + (add[i] if i < len(add) else 0)) % P
              for i, a in enumerate(acc0)]
    assert fr_unbuf(buf) == expect


def test_fr_batch_inv_with_zeros(vals):
    sample = vals[:50] + [0] + vals[50:60] + [0, 1]
    got = native_fr_batch_inv(sample)
    assert got == [pow(v, P - 2, P) if v else 0 for v in sample]


def test_msm_batch_affine_large_window():
    """The batch-affine MSM (native/fieldops.c msm_window_affine) at an
    n that selects a >8-bit window, with heavy bucket collisions
    (tiled points), duplicate points, and P/-P cancellations."""
    import random as _r

    from sha2cq_tpu.curves import host as CH
    from sha2cq_tpu.fields import host as H
    from sha2cq_tpu.ops import msm as M

    rng = _r.Random(11)
    uniq = [CH.g1_mul(CH.G1_GEN, rng.randrange(1, H.FR_MOD)) for _ in range(32)]
    n = 20000   # lg=15 -> window c=10 (affine tree path beyond c=8)
    pts = [uniq[i % 32] for i in range(n)]
    # inject exact cancellation pairs and duplicates
    neg = [(p[0], (H.FQ_MOD - p[1]) % H.FQ_MOD) for p in uniq[:8]]
    pts[:8] = uniq[:8]
    pts[8:16] = neg
    sc = [rng.randrange(H.FR_MOD) for _ in range(n)]
    for i in range(8):
        sc[8 + i] = sc[i]          # s*P + s*(-P) cancels inside buckets
    whole = M.msm(sc, pts)
    k = n // 2 + 3
    a = M.msm(sc[:k], pts[:k])
    b = M.msm(sc[k:], pts[k:])
    assert whole == CH.g1_add(a, b)


def test_glv_scalar_mul_matches_double_and_add():
    """GLV (endomorphism-split) scalar mul must equal the plain
    double-and-add export for edge and random scalars; the FK group NTT and
    batch scalar muls route through it."""
    import ctypes
    import random

    from sha2cq_tpu import native_loader as NL
    from sha2cq_tpu.curves import host as CH
    from sha2cq_tpu.fields import host as F

    lib = NL.get_lib()
    if lib is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    lib.g1_scalar_mul_glv.argtypes = [ctypes.POINTER(ctypes.c_uint64)] * 3

    rng = random.Random(99)
    cases = [0, 1, 2, F.FR_MOD - 1, F.FR_MOD - 2, (1 << 128) - 1, 1 << 128]
    cases += [rng.randrange(F.FR_MOD) for _ in range(20)]
    P = CH.g1_mul(CH.G1_GEN, 987654321)
    pj = NL._pack_jac([(P[0], P[1], 1)])
    for k in cases:
        sc = (ctypes.c_uint64 * 4)(*NL._u64s(k))
        o1 = (ctypes.c_uint64 * 12)()
        o2 = (ctypes.c_uint64 * 12)()
        lib.g1_scalar_mul(pj, sc, o1)
        lib.g1_scalar_mul_glv(pj, sc, o2)
        a1 = CH.jac_to_affine(NL._unpack_jac(o1))
        a2 = CH.jac_to_affine(NL._unpack_jac(o2))
        assert a1 == a2, f"GLV mismatch at k={k:#x}"


def test_fr_vec_mul_and_scale_bufs():
    """fr_vec_mul (elementwise canonical product) and the scale/fold buffer
    helpers must match Python bigint arithmetic — the CQ prover's A-side
    counts/(T+beta) pipeline rides these."""
    import random

    import numpy as np

    from sha2cq_tpu import native_loader as NL
    from sha2cq_tpu.fields import host as F

    if NL.get_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable")

    rng = random.Random(5)
    n = 300
    a = [rng.randrange(F.FR_MOD) for _ in range(n)]
    b = [rng.randrange(F.FR_MOD) for _ in range(n)] 
    b[0] = 0
    b[1] = 1
    c = rng.randrange(F.FR_MOD)

    buf = NL.fr_buf(a)
    assert NL.native_fr_vec_mul_buf(buf, NL.fr_buf(b))
    assert NL.fr_unbuf(buf) == [x * y % F.FR_MOD for x, y in zip(a, b)]

    buf2 = NL.fr_buf(a)
    assert NL.native_fr_scale_buf(buf2, c)
    assert NL.fr_unbuf(buf2) == [x * c % F.FR_MOD for x in a]
