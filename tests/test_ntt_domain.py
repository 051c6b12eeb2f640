"""Device NTT + EvaluationDomain vs host oracles.

Pins the device NTT to `best_fft` semantics (arithmetic.rs:171-274) and the
domain transforms to domain.rs round-trip identities at k = 3..6 (reference
tests them at poly/domain.rs:506-575).
"""
import random

from sha2cq_tpu.fields import device as D, host as H
from sha2cq_tpu.ops import ntt as NTT
from sha2cq_tpu.poly.domain import EvaluationDomain

P = H.FR_MOD
random.seed(11)


def test_ntt_host_is_dft():
    k, n = 3, 8
    omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - k), P)
    coeffs = [random.randrange(P) for _ in range(n)]
    evals = NTT.ntt_host(coeffs, omega, P)
    for i in range(n):
        x = pow(omega, i, P)
        expect = sum(c * pow(x, j, P) for j, c in enumerate(coeffs)) % P
        assert evals[i] == expect
    assert NTT.intt_host(evals, omega, P) == coeffs


def test_device_ntt_matches_host():
    for k in (1, 3, 6):
        n = 1 << k
        omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - k), P)
        coeffs = [random.randrange(P) for _ in range(n)]
        dev = NTT.ntt(D.pack(coeffs, D.FR), omega, k)
        assert D.unpack(dev, D.FR) == NTT.ntt_host(coeffs, omega, P)
        # inverse round-trips
        back = NTT.intt(dev, pow(omega, P - 2, P), k, pow(n, P - 2, P))
        assert D.unpack(back, D.FR) == coeffs


def test_domain_roundtrips():
    dom = EvaluationDomain(j=3, k=4)
    n = dom.n
    vals = [random.randrange(P) for _ in range(n)]
    coeffs = dom.lagrange_to_coeff_host(vals)
    assert dom.coeff_to_lagrange_host(coeffs) == vals
    # extended round trip: poly of degree < n survives coset evaluation
    ext = dom.coeff_to_extended_host(coeffs)
    assert len(ext) == dom.extended_n
    back = dom.extended_to_coeff_host(ext)
    assert back[:n] == coeffs
    assert all(x == 0 for x in back[n:])


def test_domain_device_matches_host():
    dom = EvaluationDomain(j=3, k=4)
    vals = [random.randrange(P) for _ in range(dom.n)]
    dvals = D.pack(vals, D.FR)
    coeffs = dom.lagrange_to_coeff(dvals)
    assert D.unpack(coeffs, D.FR) == dom.lagrange_to_coeff_host(vals)
    ext = dom.coeff_to_extended(coeffs)
    assert D.unpack(ext, D.FR) == dom.coeff_to_extended_host(dom.lagrange_to_coeff_host(vals))
    back = dom.extended_to_coeff(ext)
    host_back = dom.extended_to_coeff_host(dom.coeff_to_extended_host(dom.lagrange_to_coeff_host(vals)))
    assert D.unpack(back, D.FR) == host_back


def test_divide_by_vanishing():
    """(X^n - 1) * q(X) divided by t on the coset gives back q's evals."""
    dom = EvaluationDomain(j=3, k=3)
    n = dom.n
    # build p(X) = (X^n - 1) * q(X) in coefficient form
    q = [random.randrange(P) for _ in range(n)]  # deg < n
    p = [0] * (2 * n)
    for i, c in enumerate(q):
        p[i + n] = (p[i + n] + c) % P
        p[i] = (p[i] - c) % P
    p += [0] * (dom.extended_n - len(p))
    ext = NTT.ntt_host(p, dom.extended_omega, P)
    # multiply pointwise by zeta-coset shift: evaluate on coset instead
    # (emulate coeff_to_extended for a 2n-degree poly: distribute zeta first)
    pz = [c * pow(dom.g_coset, i, P) % P for i, c in enumerate(p)]
    ext = NTT.ntt_host(pz, dom.extended_omega, P)
    quotient_ext = dom.divide_by_vanishing_poly_host(ext)
    got = dom.extended_to_coeff_host(quotient_ext)
    assert got[:n] == q
    assert all(x == 0 for x in got[n:])


def test_l_i_range():
    dom = EvaluationDomain(j=2, k=3)
    x = random.randrange(P)
    xn = pow(x, dom.n, P)
    rotations = list(range(-2, 3))
    got = dom.l_i_range(x, xn, rotations)
    # oracle: l_i(x) by direct Lagrange interpolation
    for rot, li in zip(rotations, got):
        i = rot % dom.n
        wi = pow(dom.omega, i, P)
        num, den = 1, 1
        for j in range(dom.n):
            if j == i:
                continue
            wj = pow(dom.omega, j, P)
            num = num * (x - wj) % P
            den = den * (wi - wj) % P
        assert li == num * pow(den, P - 2, P) % P
