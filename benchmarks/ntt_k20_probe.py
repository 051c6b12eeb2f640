"""k=20 NTT plan tuning probe (VERDICT r2 #6): today's plan is two
512-wide matmul levels + a 4-point butterfly residual (40 ms); a 1024-wide
base matrix makes it two clean matmul levels (1 GB int8 digit matrix).

Usage: python benchmarks/ntt_k20_probe.py [k] [runs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sha2cq_tpu.fields import device as D, host as H
from sha2cq_tpu.ops import mxu_ntt as MX
from sha2cq_tpu.ops import ntt as NTT

P = H.FR_MOD


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n = 1 << k
    omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - k), P)
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]
    a = D.pack(vals, D.FR)

    # small-k oracle for correctness of each plan variant
    oracle = None
    if k <= 16:
        oracle = NTT.ntt_host(vals, omega, P)

    for max_m in (512, 1024):
        t0 = time.perf_counter()
        out = MX.mxu_ntt(a, omega, k, max_m=max_m)
        _ = jax.device_get(out[:, :1])
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = out
        for _ in range(runs):
            r = MX.mxu_ntt(r, omega, k, max_m=max_m)
        _ = jax.device_get(r[:, :1])
        dt = (time.perf_counter() - t0) / runs
        line = f"k={k} max_m={max_m}: {dt*1e3:8.2f} ms (cold {cold:6.1f} s)"
        if oracle is not None:
            ok = D.unpack(out, D.FR) == oracle
            line += f"  correct={ok}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
