"""Benchmark driver entrypoint: prints ONE JSON line.

Headline: device NTT throughput at 2^18 on BN254 Fr (the prover's dominant
repeated kernel — dozens of basis conversions per proof, SURVEY.md §3.2),
now on the MXU matmul-NTT path (ops/mxu_ntt.py): the radix-512 four-step
NTT whose twiddle work runs as int8 systolic-array matmuls.  vs_baseline
compares against the reference's rayon `best_fft` on a server CPU (~100 ms
at 2^18 single-socket — measured class of halo2 v0.2 best_fft; the
reference repo itself publishes no numbers and its criterion benches are
disabled, see BASELINE.md).

Methodology (BASELINE.md round-1 discrepancy resolved): on the
axon-tunneled TPU, block_until_ready() returns before remote execution
completes and each dispatch pays a ~7 ms tunnel round trip, so we time a
chain of RUNS dependent NTTs closed by one device_get and amortize; the
first (unamortized) call is reported in "extra" for transparency.
"""
import json
import time

K = 18
RUNS = 20
BASELINE_BEST_FFT_S = 0.100  # reference-class CPU best_fft at 2^18 (see docstring)


def main() -> None:
    import numpy as np
    import jax
    from sha2cq_tpu.fields import device as D, host as H
    from sha2cq_tpu.ops import mxu_ntt as MX

    n = 1 << K
    omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - K), H.FR_MOD)
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(32), "little") % H.FR_MOD for _ in range(n)]
    a = D.pack(vals, D.FR)

    # warmup: plan build + compile + matrix upload
    t0 = time.perf_counter()
    out = MX.mxu_ntt(a, omega, K)
    _ = jax.device_get(out[:, :1])
    warm_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    r = out
    for _ in range(RUNS):
        r = MX.mxu_ntt(r, omega, K)
    _ = jax.device_get(r[:, :1])
    dt = (time.perf_counter() - t0) / RUNS

    print(json.dumps({
        "metric": f"ntt_2e{K}_seconds",
        "value": round(dt, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_BEST_FFT_S / dt, 3),
        "extra": {"first_call_s": round(warm_s, 3), "path": "mxu_int8_matmul"},
    }))


if __name__ == "__main__":
    main()
