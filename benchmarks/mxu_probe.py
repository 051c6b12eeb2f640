"""Probe MXU int8 matmul throughput on the axon TPU.

Motivation: an NTT over BN254 Fr can be reformulated as small-digit integer
matmuls (digit-decomposed twiddle matrix x digit-decomposed values, with
carry/modular reduction as a VPU epilogue).  Whether that beats VPU butterfly
kernels depends entirely on the chip's int8 (vs f32/bf16) matmul rate, which
this script measures through the tunnel with a dependent-op chain closed by
device_get (block_until_ready lies on axon — see MEMORY).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_chain(make_op, iters=16, warmup=2, label=""):
    op = jax.jit(make_op)
    x = None
    out = op()
    jax.device_get(out)
    t0 = time.perf_counter()
    outs = [op() for _ in range(iters)]
    for o in outs:
        jax.device_get(jnp.sum(o[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt*1e3:8.3f} ms/iter")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    M, K, N = 512, 512, 16384
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N), dtype=np.int8))
    af = a8.astype(jnp.float32)
    bf = b8.astype(jnp.float32)
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    macs = M * K * N

    # single matmul per iter
    dt = bench_chain(lambda: jnp.dot(a8, b8, preferred_element_type=jnp.int32),
                     label=f"int8 {M}x{K}x{N} -> int32")
    print(f"  -> {macs/dt/1e12:.2f} Tmac/s")
    dt = bench_chain(lambda: jnp.dot(af, bf, preferred_element_type=jnp.float32),
                     label=f"f32  {M}x{K}x{N}")
    print(f"  -> {macs/dt/1e12:.2f} Tmac/s")
    dt = bench_chain(lambda: jnp.dot(ab, bb, preferred_element_type=jnp.float32),
                     label=f"bf16 {M}x{K}x{N} -> f32")
    print(f"  -> {macs/dt/1e12:.2f} Tmac/s")

    # chained matmuls (amortize dispatch): 32 matmuls like the NTT digit loop
    T = 32

    def chained():
        acc = jnp.zeros((M, N), dtype=jnp.int32)
        y = b8
        for _ in range(T):
            acc = acc + jnp.dot(a8, y, preferred_element_type=jnp.int32)
            y = jnp.roll(y, 1, axis=0)
        return acc

    dt = bench_chain(chained, iters=4, label=f"int8 chained x{T}")
    print(f"  -> {T*macs/dt/1e12:.2f} Tmac/s")

    # int32 VPU multiply rate for comparison (the limb mont_mul substrate)
    v = jnp.asarray(rng.integers(0, 2**31, size=(16, 1 << 18), dtype=np.uint32))

    def vpu():
        x = v
        for _ in range(64):
            x = (x * v + x) & jnp.uint32(0xFFFF)
        return x

    dt = bench_chain(vpu, iters=4, label="uint32 VPU mul+add+and x64 on (16,2^18)")
    print(f"  -> {64*2*16*(1<<18)/dt/1e12:.3f} Top/s (mul+add counted)")


if __name__ == "__main__":
    main()
