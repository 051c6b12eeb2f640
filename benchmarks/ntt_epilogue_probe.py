"""Where does the MXU NTT's time go at 2^18?  Times isolated pieces:
digit conversion, int8 matmul, planes->limbs epilogue, twiddle mont_mul.
Each piece is timed as a self-feeding dependent chain (shape-preserving
wrappers) closed by one device_get.  Big constants (digit matrices,
twiddles) travel as jit ARGUMENTS — the axon remote compile rejects
embedded constants (HTTP 413).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sha2cq_tpu.fields import device as D, host as H
from sha2cq_tpu.ops import mxu_ntt as MX

P = H.FR_MOD
K = 18


def timed(name, fn, x, *consts, iters=10):
    fn_j = jax.jit(fn)
    y = fn_j(x, *consts)
    jax.block_until_ready(y)
    jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[:1])
    t0 = time.perf_counter()
    z = x
    for _ in range(iters):
        z = fn_j(z, *consts)
    jax.device_get(jax.tree_util.tree_leaves(z)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms")
    return dt


def main():
    n = 1 << K
    omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - K), P)
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]
    a = D.pack(vals, D.FR)
    plan, res_omega = MX.get_plan(n, omega)
    m2 = 512
    m1 = n // m2
    ctx = D.FR

    # full NTT for reference (already jitted with plan-as-arg)
    def full(x):
        return MX._mxu_ntt_jit(x, plan, 512, "Fr", res_omega)
    y = full(a); jax.block_until_ready(y)
    t0 = time.perf_counter()
    z = a
    for _ in range(10):
        z = full(z)
    jax.device_get(z[:, :1])
    print(f"{'full mxu_ntt':34s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")

    # piece 1: digit conversion (16, m2, m1) -> int8 cols -> back to u32 limbs
    a3 = a.reshape(16, m2, m1)

    def conv_only(x):
        d = MX._to_digit_cols(x)
        r = (d.astype(jnp.int32) + 128).astype(jnp.uint32).reshape(m2, 32, m1)
        return jnp.transpose(r, (1, 0, 2))[:16] & 0xFFFF
    timed("_to_digit_cols (one level)", conv_only, a3)

    # piece 2: int8 matmul only
    XB = jax.jit(MX._to_digit_cols)(a3)

    def mm_only(x, mat):
        y = jax.lax.dot_general(mat, x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y & 0x7F).astype(jnp.int8)
    timed("int8 matmul 16384x16384 @ x512", mm_only, XB, plan.base_mat)

    # piece 3: planes -> limbs epilogue
    def planes(x, mat):
        return jnp.abs(jax.lax.dot_general(mat, x, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.int32))
    O = jax.jit(planes)(XB, plan.base_mat).reshape(32, m2, m1)

    def ep_only(x):
        lim = MX._planes_to_limbs(x, ctx)
        return jnp.concatenate([lim, lim], axis=0).astype(jnp.int32)
    timed("_planes_to_limbs (one level)", ep_only, O)

    # piece 4: twiddle mont_mul
    a4 = a.reshape(16, m2, m1, 1)

    def tmul(x, tw):
        return D.mont_mul(x, tw[..., None], ctx)
    timed("twiddle mont_mul (one level)", tmul, a4, plan.twiddles[0])

    # piece 5: canonicalize
    timed("_canonicalize", lambda x: MX._canonicalize(x, ctx), a)


if __name__ == "__main__":
    main()
