"""Probe: where does mxu_ntt wall-clock go at 2^18?

Times (amortized dependent chains, device_get-closed — block_until_ready
lies through the axon tunnel):
  - the full NTT,
  - digit-conv + the two level matmuls alone (planes folded with a cheap
    non-mathematical reduction so data still flows),
  - one _planes_to_limbs epilogue,
  - one twiddle Montgomery multiply,
  - the final canonicalization.
All big arrays travel as jit ARGUMENTS (remote compile rejects embedded
constants).  Drives the epilogue-fusion decision (ROADMAP round-3 item 2).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sha2cq_tpu.fields import device as D, host as H
from sha2cq_tpu.ops import mxu_ntt as MX

K = 18
n = 1 << K


def timeit(fn, arg, runs=20, label=""):
    out = fn(arg)
    _ = jax.device_get(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    r = arg
    for _ in range(runs):
        r = fn(r)
    _ = jax.device_get(r.reshape(-1)[:1])
    dt = (time.perf_counter() - t0) / runs
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - K), H.FR_MOD)
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(32), "little") % H.FR_MOD
            for _ in range(n)]
    a = D.pack(vals, D.FR)
    plan, res_om = MX.get_plan(n, omega, "Fr")

    timeit(lambda x: MX._mxu_ntt_jit(x, plan, 512, "Fr", res_om), a,
           label="full mxu_ntt 2^18")

    @jax.jit
    def matmul_only(x, mat):
        m2 = 512
        m1 = n // m2
        v = x.reshape(D.NLIMB, m2, m1)
        XB = MX._to_digit_cols(v)
        MM = jax.lax.dot_general(mat, XB, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        t = MM.reshape(MX.NDIG, m2, m1).sum(axis=0).astype(jnp.uint32) & 0xFFFF
        v2 = jnp.broadcast_to(t[None], (D.NLIMB, m2, m1))
        v2 = jnp.transpose(v2, (0, 2, 1))
        XB2 = MX._to_digit_cols(v2)
        MM2 = jax.lax.dot_general(mat, XB2, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        t2 = MM2.reshape(MX.NDIG, m1, m2).sum(axis=0).astype(jnp.uint32)
        return jnp.broadcast_to(t2[None], (D.NLIMB, m1, m2)) \
            .reshape(D.NLIMB, n)
    timeit(lambda x: matmul_only(x, plan.base_mat), a,
           label="digitconv+matmul only (2 levels)")

    @jax.jit
    def epi_round(x):
        O = (x[:2].astype(jnp.int32)).reshape(2, 512, 512)
        O = jnp.concatenate([O] * 16, axis=0)          # (32, 512, 512)
        out = MX._planes_to_limbs(jnp.abs(O), D.FR)
        return out.reshape(D.NLIMB, n)
    timeit(epi_round, a, label="_planes_to_limbs (one level equiv)")

    @jax.jit
    def twm(x, tw):
        f = x.reshape(D.NLIMB, 512, 512, 1)
        return D.mont_mul(f, tw, D.FR).reshape(D.NLIMB, n)
    tw = plan.twiddles[0][..., None]
    timeit(lambda x: twm(x, tw), a, label="twiddle mont_mul 2^18")

    @jax.jit
    def canon(x):
        return MX._canonicalize(x, D.FR)
    timeit(canon, a, label="canonicalize 2^18")


if __name__ == "__main__":
    main()
