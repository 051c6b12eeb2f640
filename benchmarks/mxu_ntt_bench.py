"""Benchmark the MXU matmul-NTT vs the butterfly NTT on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sha2cq_tpu.fields import device as D, host as H
from sha2cq_tpu.ops import ntt as NTT
from sha2cq_tpu.ops import mxu_ntt as MX

P = H.FR_MOD


def main():
    print("devices:", jax.devices())
    for k in (18, 20):
        n = 1 << k
        omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - k), P)
        rng = np.random.default_rng(0)
        vals = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]
        a = D.pack(vals, D.FR)

        t0 = time.perf_counter()
        plan, res_omega = MX.get_plan(n, omega)
        print(f"k={k}: plan build {time.perf_counter()-t0:.1f}s "
              f"(base {plan.base_mat.shape}, res "
              f"{'butterfly' if res_omega else plan.res_mat.shape}, "
              f"{len(plan.twiddles)} twiddle levels)")

        # warm (compile + matrix upload)
        t0 = time.perf_counter()
        out = MX.mxu_ntt(a, omega, k)
        jax.device_get(out[:, :1])
        print(f"k={k}: mxu warm (compile+upload) {time.perf_counter()-t0:.1f}s")

        # timed: dependent chain amortized
        iters = 10
        t0 = time.perf_counter()
        x = out
        for _ in range(iters):
            x = MX.mxu_ntt(x, omega, k)
        jax.device_get(x[:, :1])
        dt = (time.perf_counter() - t0) / iters
        print(f"k={k}: MXU NTT {dt*1e3:8.2f} ms/op")

        # butterfly baseline
        t0 = time.perf_counter()
        y = NTT.ntt(a, omega, k)
        jax.device_get(y[:, :1])
        print(f"k={k}: butterfly warm {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        x = y
        for _ in range(4):
            x = NTT.ntt(x, omega, k)
        jax.device_get(x[:, :1])
        dt = (time.perf_counter() - t0) / 4
        print(f"k={k}: butterfly NTT {dt*1e3:8.2f} ms/op")

        # spot correctness on device (mxu vs butterfly on same input)
        got = np.asarray(jax.device_get(MX.mxu_ntt(a, omega, k)))
        ref = np.asarray(jax.device_get(NTT.ntt(a, omega, k)))
        print(f"k={k}: mxu == butterfly: {bool((got == ref).all())}")


if __name__ == "__main__":
    main()
