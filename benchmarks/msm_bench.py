"""Device MSM benchmark at production sizes vs the native host Pippenger."""
import time

import jax
import numpy as np

from sha2cq_tpu.curves import device as PD, host as CH
from sha2cq_tpu.fields import host as H
from sha2cq_tpu.ops import msm as M


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    base = [CH.g1_mul(CH.G1_GEN, i + 2) for i in range(1 << 10)]

    for logn in (12, 14, 16):
        n = 1 << logn
        # tile points to size n (values don't matter for timing)
        pts = (base * ((n + len(base) - 1) // len(base)))[:n]
        scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]

        t0 = time.perf_counter()
        host = M.msm_host(scalars, pts)
        t_host = time.perf_counter() - t0

        packed = PD.pack_affine(pts)
        c = M.pick_window_bits(n)
        digits = M._scalars_to_digits(scalars, c)
        # warm compile
        dev = M.msm_device(scalars, packed, digits=digits, c=c)
        t0 = time.perf_counter()
        dev = M.msm_device(scalars, packed, digits=digits, c=c)
        t_dev = time.perf_counter() - t0
        ok = dev == host
        print(f"2^{logn}: host {t_host*1e3:8.1f} ms   device {t_dev*1e3:8.1f} ms "
              f"(c={c})   equal={ok}")


if __name__ == "__main__":
    main()
