"""Second MXU/VPU probe: exact NTT-pass shapes, dependency-chained inside one
jit so tunnel dispatch is amortized.

Decides the digit scheme for the matmul NTT:
  - int8 path: 8-bit digits, (32m x 32m) @ (32m x B) int8 -> int32
  - bf16 path: 5-bit digits would need (51m x 51m) — measured here at the
    same shape for rate comparison
Also measures elementwise f32 vs int32 multiply (the candidate substrates for
point arithmetic), since uint32 came out ~2.4 Gop/s in probe 1.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=4, label="", work=0):
    f = jax.jit(fn)
    out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])  # warm compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    rate = work / dt / 1e12 if work else 0
    print(f"{label:46s} {dt*1e3:9.3f} ms/iter   {rate:8.2f} T/s")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    M = 16384  # = 32 digit-planes x 512
    B = 512
    CH = 8     # chained matmuls per dispatch

    w8 = jnp.asarray(rng.integers(-127, 127, size=(M, M), dtype=np.int8))
    x8 = jnp.asarray(rng.integers(-127, 127, size=(M, B), dtype=np.int8))

    def chain_i8(w, x):
        r = x
        for _ in range(CH):
            o = jax.lax.dot_general(w, r, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            r = (o & 0x7F).astype(jnp.int8)
        return r

    timed(chain_i8, w8, x8, label=f"int8 ({M}x{M})@({M}x{B}) x{CH} chained",
          work=CH * M * M * B)

    wb = w8.astype(jnp.bfloat16)
    xb = x8.astype(jnp.bfloat16)

    def chain_bf16(w, x):
        r = x
        for _ in range(CH):
            o = jax.lax.dot_general(w, r, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            r = (o * 1e-6).astype(jnp.bfloat16)
        return r

    timed(chain_bf16, wb, xb, label=f"bf16 ({M}x{M})@({M}x{B}) x{CH} chained",
          work=CH * M * M * B)

    # elementwise substrates
    n = 1 << 22
    af = jnp.asarray(rng.random(n, dtype=np.float32))
    bf = jnp.asarray(rng.random(n, dtype=np.float32))

    def chain_f32(a, b):
        r = a
        for _ in range(64):
            r = r * b + a
        return r

    timed(chain_f32, af, bf, label="f32 elementwise mul+add x64 on 2^22",
          work=64 * 2 * n)

    ai = jnp.asarray(rng.integers(0, 2**15, size=n, dtype=np.int32))
    bi = jnp.asarray(rng.integers(0, 2**15, size=n, dtype=np.int32))

    def chain_i32(a, b):
        r = a
        for _ in range(64):
            r = (r * b + a) & 0x7FFF
        return r

    timed(chain_i32, ai, bi, label="int32 elementwise mul+add+and x64 on 2^22",
          work=64 * 3 * n)

    # f32 with exact small products (12-bit digit simulation)
    a12 = jnp.asarray(rng.integers(0, 4096, size=n).astype(np.float32))
    b12 = jnp.asarray(rng.integers(0, 4096, size=n).astype(np.float32))

    def chain_f32_digits(a, b):
        r = a
        for _ in range(64):
            p = r * b                      # exact: 12+12 <= 24-bit mantissa
            hi = jnp.floor(p * (1.0 / 4096.0))
            r = p - hi * 4096.0            # low digit, stays < 4096
        return r

    timed(chain_f32_digits, a12, b12,
          label="f32 12-bit digit mul+carry x64 on 2^22", work=64 * 5 * n)


if __name__ == "__main__":
    main()
