"""Grouped vs row-sparse native MSM at CQ b0/p shapes.

The CQ b0/p commitments put one scalar per support row, but the scalar
depends only on the table row the witness value resolves to — so rows
sharing a value share a scalar.  g1_msm_grouped_multi sums the basis
points per group first (one mixed add per row) and runs the batch-affine
Pippenger over the |distinct| group sums; the row path runs it over all
|support| rows.  This bench times both on the same data and checks the
results are identical, across support/distinct ratios that bracket the
SHA-256 workloads (k=16: distinct ~ 0.6x support; k=18: ~0.25x and below).

Usage: python benchmarks/grouped_msm_bench.py [logn ...]   (default 16 18)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sha2cq_tpu.curves import host as CH
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.native_loader import (fr_buf, native_msm_grouped_multi,
                                      native_msm_multi, pack_points_affine)


def main():
    logns = [int(a) for a in sys.argv[1:]] or [16, 18]
    rng = np.random.default_rng(7)
    base = [CH.g1_mul(CH.G1_GEN, i + 2) for i in range(1 << 10)]

    for logn in logns:
        n = 1 << logn
        pts = (base * ((n + len(base) - 1) // len(base)))[:n]
        packed = pack_points_affine(pts)
        assert packed is not None, "native library required"
        for s in (n // 16, n // 4, n // 2):
            gids = rng.integers(0, s, size=n)            # row -> group
            gsc = [int.from_bytes(rng.bytes(31), "little") % FR_MOD
                   for _ in range(s)]
            gsc_buf = fr_buf(gsc)
            # row path: per-row scalars = group scalar of the row's group
            row_sc = np.ascontiguousarray(gsc_buf[gids])
            rows_all = np.arange(n, dtype=np.int64)

            t0 = time.perf_counter()
            (row_res,) = native_msm_multi([(packed, rows_all, row_sc)])
            t_rows = time.perf_counter() - t0

            order = np.argsort(gids, kind="stable").astype(np.int64)
            counts = np.bincount(gids, minlength=s)
            starts = np.zeros(s + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            t0 = time.perf_counter()
            (grp_res,) = native_msm_grouped_multi(
                [(packed, order, starts, gsc_buf)])
            t_csr = time.perf_counter() - t0
            ok = CH.jac_to_affine(row_res) == CH.jac_to_affine(grp_res)
            print(f"2^{logn} support, {s} distinct ({s/n:.2f}x): "
                  f"rows {t_rows*1e3:7.1f} ms   grouped {t_csr*1e3:7.1f} ms "
                  f"({t_rows/t_csr:4.2f}x)   equal={ok}", flush=True)
            assert ok


if __name__ == "__main__":
    main()
