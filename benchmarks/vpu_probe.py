"""Elementwise (VPU) substrate probe: uint32 vs int32 vs f32, and the real
fused mont_mul rate.  Chains enough work per dispatch (~GB-scale) to rise
above the ~7 ms tunnel dispatch floor."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sha2cq_tpu.fields import device as D


def timed(fn, *args, iters=3, label="", work=0):
    f = jax.jit(fn)
    out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:52s} {dt*1e3:9.2f} ms/iter   {work/dt/1e9:9.1f} Gop/s")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    shape = (16, 1 << 18)
    n_el = shape[0] * shape[1]
    STEPS = 256

    au = jnp.asarray(rng.integers(0, 2**16, size=shape, dtype=np.uint32))
    bu = jnp.asarray(rng.integers(0, 2**16, size=shape, dtype=np.uint32))

    def chain_u32(a, b):
        r = a
        for _ in range(STEPS):
            r = (r * b + a) & jnp.uint32(0xFFFF)
        return r

    timed(chain_u32, au, bu, label=f"uint32 mul+add+and x{STEPS} on (16,2^18)",
          work=STEPS * 3 * n_el)

    ai = au.astype(jnp.int32)
    bi = bu.astype(jnp.int32)

    def chain_i32(a, b):
        r = a
        for _ in range(STEPS):
            r = (r * b + a) & 0x7FFF
        return r

    timed(chain_i32, ai, bi, label=f"int32 mul+add+and x{STEPS} on (16,2^18)",
          work=STEPS * 3 * n_el)

    af = jnp.asarray(rng.integers(0, 4096, size=shape).astype(np.float32))
    bf = jnp.asarray(rng.integers(0, 4096, size=shape).astype(np.float32))

    def chain_f32(a, b):
        r = a
        for _ in range(STEPS):
            p = r * b
            hi = jnp.floor(p * (1.0 / 4096.0))
            r = p - hi * 4096.0
        return r

    timed(chain_f32, af, bf, label=f"f32 12-bit digit mul+carry x{STEPS}",
          work=STEPS * 5 * n_el)

    # the real question: fused mont_mul rate on (16, 2^18)
    av = D.pack([int.from_bytes(rng.bytes(31), "little") for _ in range(1 << 12)], D.FR)
    av = jnp.tile(av, (1, 1 << 6))  # (16, 2^18)

    def chain_mm(a, b, steps):
        r = a
        for _ in range(steps):
            r = D.mont_mul(r, b, D.FR)
        return r

    import functools
    for steps in (8, 32):
        dt = timed(functools.partial(chain_mm, steps=steps), av, av,
                   label=f"mont_mul x{steps} chained on (16, 2^18)",
                   work=steps * (1 << 18))
        print(f"   -> {steps * (1 << 18) / dt / 1e6:9.1f} M mont_mul/s")


if __name__ == "__main__":
    main()
