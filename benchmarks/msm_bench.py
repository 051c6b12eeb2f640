"""Device MSM benchmark at production sizes vs the native host Pippenger.

Usage: python benchmarks/msm_bench.py [max_logn] [kernel]
  kernel: v2 (default; block-scan, ~2n lane point-adds per window) or
          v1 (Hillis-Steele, n*log2(n)) or both.
"""
import sys
import time

import jax
import numpy as np

from sha2cq_tpu.curves import device as PD, host as CH
from sha2cq_tpu.fields import host as H
from sha2cq_tpu.ops import msm as M


def main():
    print("devices:", jax.devices())
    max_logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = sys.argv[2] if len(sys.argv) > 2 else "v2"
    rng = np.random.default_rng(0)
    base = [CH.g1_mul(CH.G1_GEN, i + 2) for i in range(1 << 10)]

    for logn in range(12, max_logn + 1, 2):
        n = 1 << logn
        # tile points to size n (values don't matter for timing)
        pts = (base * ((n + len(base) - 1) // len(base)))[:n]
        scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]

        t0 = time.perf_counter()
        host = M.msm_host(scalars, pts)
        t_host = time.perf_counter() - t0

        packed = PD.pack_affine(pts)
        for kernel in (("v1", "v2") if which == "both" else (which,)):
            c = (M.pick_window_bits_v2(n) if kernel == "v2"
                 else M.pick_window_bits(n))
            digits = M._scalars_to_digits(scalars, c)
            t0 = time.perf_counter()
            dev = M.msm_device(scalars, packed, digits=digits, c=c,
                               kernel=kernel)
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            dev = M.msm_device(scalars, packed, digits=digits, c=c,
                               kernel=kernel)
            t_dev = time.perf_counter() - t0
            ok = dev == host
            print(f"2^{logn} {kernel}: host {t_host*1e3:8.1f} ms   "
                  f"device {t_dev*1e3:8.1f} ms (cold {t_cold:5.1f} s, c={c})  "
                  f"pts/s/chip {n/t_dev:,.0f}   equal={ok}", flush=True)


if __name__ == "__main__":
    main()
