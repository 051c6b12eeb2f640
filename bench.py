"""Benchmark driver entrypoint: prints ONE JSON line.

Round-1 headline: device NTT throughput at 2^18 on BN254 Fr (the prover's
dominant repeated kernel — dozens of basis conversions per proof,
SURVEY.md §3.2).  vs_baseline compares against the reference's rayon
`best_fft` on a server CPU (~100 ms at 2^18 single-socket — measured class
of halo2 v0.2 best_fft; the reference repo itself publishes no numbers and
its criterion benches are disabled, see BASELINE.md).

Timing note: on the axon-tunneled TPU, block_until_ready() returns before
remote execution completes, so we time a chain of dependent NTTs closed by
a device_get round trip and amortize.
"""
import json
import time

K = 18
RUNS = 20
BASELINE_BEST_FFT_S = 0.100  # reference-class CPU best_fft at 2^18 (see docstring)


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sha2cq_tpu.fields import device as D, host as H
    from sha2cq_tpu.ops import ntt as NTT

    n = 1 << K
    omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - K), H.FR_MOD)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(D.NLIMB, n), dtype=np.uint32))
    tw = NTT.twiddle_table(omega, K)

    # warmup/compile + drain the remote queue
    out = NTT._ntt_core(a, tw, K)
    _ = jax.device_get(out)

    t0 = time.perf_counter()
    r = a
    for _ in range(RUNS):
        r = NTT._ntt_core(r, tw, K)
    _ = jax.device_get(r)
    dt = (time.perf_counter() - t0) / RUNS

    print(json.dumps({
        "metric": f"ntt_2e{K}_seconds",
        "value": round(dt, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_BEST_FFT_S / dt, 3),
    }))


if __name__ == "__main__":
    main()
