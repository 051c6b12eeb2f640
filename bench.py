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
import os
import signal
import subprocess
import sys
import time

K = 18
RUNS = 20
BASELINE_BEST_FFT_S = 0.100  # reference-class CPU best_fft at 2^18 (see docstring)
WATCHDOG_S = 1600  # the axon tunnel can hang indefinitely when down; emit
                   # an error JSON line instead of stalling the driver.
                   # Sized so ONE program-load-roulette draw (17-850 s
                   # observed, BASELINE round-5 — even the NTT warmup can
                   # draw one) still leaves room for the SHA legs; a DOWN
                   # tunnel is caught by the 120 s probe, not this.
PROBE_S = 120     # tunnel liveness probe budget (device claim, no compile)


def _tpu_alive() -> bool:
    """Probe the axon tunnel in a subprocess: jax.devices() hangs forever
    when the loopback relay (which lives outside this container) is down,
    so a timed child process is the only reliable health check."""
    if os.environ.get("JAX_PLATFORMS", "axon") == "cpu":
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "import sys; sys.exit(0 if d else 1)"],
            timeout=PROBE_S, capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _cpu_fallback() -> None:
    """Tunnel down: report the native host NTT honestly (extra.backend
    says so) instead of stalling into the watchdog with a null metric."""
    import numpy as np
    from sha2cq_tpu import native_loader as NL
    from sha2cq_tpu.fields import host as H

    n = 1 << K
    omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - K), H.FR_MOD)
    tw = [1]
    for _ in range(n // 2 - 1):
        tw.append(tw[-1] * omega % H.FR_MOD)
    twb = NL.fr_buf(tw)
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(32), "little") % H.FR_MOD
            for _ in range(n)]
    buf = NL.fr_buf(vals)
    NL.native_fr_ntt_buf(buf, twb, K)  # warm caches
    runs = 5
    t0 = time.perf_counter()
    for _ in range(runs):
        NL.native_fr_ntt_buf(buf, twb, K)
    dt = (time.perf_counter() - t0) / runs
    signal.alarm(0)
    print(json.dumps({
        "metric": f"ntt_2e{K}_seconds",
        "value": round(dt, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_BEST_FFT_S / dt, 3),
        "extra": {"backend": "cpu_fallback_native_c",
                  "reason": "axon tunnel down (device probe timed out); "
                            "TPU MXU path measured 7.15 ms when live "
                            "(BASELINE.md round 2)"},
    }))


def _last_resort(signum, frame):
    print(json.dumps({
        "metric": f"ntt_2e{K}_seconds", "value": None, "unit": "s",
        "vs_baseline": None,
        "extra": {"error": "watchdog fallback itself stalled"},
    }), flush=True)
    raise SystemExit(3)


def _watchdog(signum, frame):
    """Overall deadline hit with the device path stalled (a tunnel program
    load can block a C call indefinitely — only this handler regains
    control).  Emit the honest host-native NTT as the headline plus the
    host-only 8-bit SHA e2e leg, so a stalled tunnel never produces a null
    metric or zero SHA evidence."""
    signal.signal(signal.SIGALRM, _last_resort)
    signal.alarm(420)
    import numpy as np
    from sha2cq_tpu import native_loader as NL
    from sha2cq_tpu.fields import host as H

    n = 1 << K
    omega = pow(H.FR_ROOT_OF_UNITY, 1 << (H.FR_S - K), H.FR_MOD)
    tw = [1]
    for _ in range(n // 2 - 1):
        tw.append(tw[-1] * omega % H.FR_MOD)
    twb = NL.fr_buf(tw)
    rng = np.random.default_rng(0)
    buf = NL.fr_buf([int.from_bytes(rng.bytes(32), "little") % H.FR_MOD
                     for _ in range(n)])
    NL.native_fr_ntt_buf(buf, twb, K)
    t0 = time.perf_counter()
    for _ in range(3):
        NL.native_fr_ntt_buf(buf, twb, K)
    dt = (time.perf_counter() - t0) / 3
    extra = {"backend": "cpu_fallback_native_c",
             "reason": f"device path stalled past the {WATCHDOG_S}s "
                       "watchdog (tunnel program-load hang); TPU MXU path "
                       "measures 3.5 ms when live (BASELINE.md round 5)"}
    try:
        env = dict(os.environ)
        env["SHA2CQ_H_DEVICE"] = "0"
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "sha_bench.py"), "test"],
            env=env, timeout=300, capture_output=True, text=True)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        stats = json.loads(line) if line.startswith("{") else {}
        if r.returncode == 0 and stats.get("prove_s") is not None:
            extra["sha256_8bit_prove_s"] = stats["prove_s"]
            extra["sha256_8bit_verify_s"] = stats["verify_s"]
            extra["sha256_8bit_verified"] = True
    except Exception as e:
        extra["sha256_8bit_error"] = repr(e)[:120]
    print(json.dumps({
        "metric": f"ntt_2e{K}_seconds",
        "value": round(dt, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_BEST_FFT_S / dt, 3),
        "extra": extra,
    }), flush=True)
    raise SystemExit(0)


def main() -> None:
    _t_start = time.perf_counter()
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_S)
    if not _tpu_alive():
        _cpu_fallback()
        return
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

    extra = {"first_call_s": round(warm_s, 3), "path": "mxu_int8_matmul"}

    # secondary metrics (VERDICT r1 item 5): host-native MSM and a full
    # e2e CQ prove+verify (my_test-equivalent, k=3) — cheap enough to ride
    # along; failures here must not lose the headline NTT number
    try:
        from sha2cq_tpu.curves import host as CH
        nm = 1 << 14
        sc = [int.from_bytes(rng.bytes(8), "little") for _ in range(nm)]
        pts = [CH.g1_mul(CH.G1_GEN, i + 2) for i in range(64)] * (nm // 64)
        from sha2cq_tpu.ops import msm as M
        t0 = time.perf_counter()
        M.msm(sc, pts)
        extra["msm_host_2e14_s"] = round(time.perf_counter() - t0, 4)
    except Exception as e:  # pragma: no cover
        extra["msm_host_error"] = repr(e)[:120]

    try:
        import random as _random
        import tests.test_e2e_cq as E
        from sha2cq_tpu.plonk import (create_proof, keygen_pk, keygen_vk,
                                      verify_proof)
        from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
        from sha2cq_tpu.utils.transcript import Blake2bRead
        prng, srs, t1, t2, params, configs, b0 = E._setup(3)
        circuit = E.MyCircuit(t1, t2)
        vk = keygen_vk(params, circuit)
        pk = keygen_pk(params, configs, b0, vk, circuit)
        t0 = time.perf_counter()
        proof = create_proof(params, pk, [circuit], [[]], rng=prng)
        t1s = time.perf_counter()
        ok = verify_proof(params, vk, AccumulatorStrategy(params, rng=prng),
                          [[]], Blake2bRead(proof)).check()
        extra["e2e_cq_prove_s"] = round(t1s - t0, 4)
        extra["e2e_cq_verify_s"] = round(time.perf_counter() - t1s, 4)
        extra["e2e_cq_verified"] = bool(ok)
    except Exception as e:  # pragma: no cover
        extra["e2e_cq_error"] = repr(e)[:120]

    # flagship workload (VERDICT r2 #1): FIPS SHA-256 1-block prove at k=13,
    # riding the cached 32-bit table setup.  Only runs when the multi-hour
    # table cache exists on this machine; never triggers a fresh build.
    try:
        from sha2cq_tpu.models.sha.setup32 import _cache_file
        PINNED_S = 0x2b068e00660fd714ab61695867925740388c0d300215adf8c964f5d93e9a76e7
        kk = 13
        cache = _cache_file(f"sha256_setup_32_{1 << kk}_{PINNED_S:x}")
        elapsed = time.perf_counter() - _t_start
        if elapsed > WATCHDOG_S - 300:
            extra["sha256_skipped"] = (
                f"insufficient watchdog budget left ({elapsed:.0f}s elapsed)")
        elif os.path.exists(cache):
            # timeboxed SUBPROCESS: the leg must not be able to blow the
            # shared watchdog and destroy the already-measured primary
            # metrics (axon remote-compile stalls run to minutes)
            # overall leg budget leaves >=250 s for the 8-bit fallback tier;
            # each ATTEMPT is capped at 350 s — a fresh process redraws the
            # program-load roulette (17-850 s observed, BASELINE round-5),
            # so two capped draws beat one long one
            budget = min(700,
                         int(WATCHDOG_S - (time.perf_counter() - _t_start)
                             - 120))
            env = dict(os.environ)
            h_dev = os.environ.get("SHA2CQ_BENCH_SHA_DEVICE", "1") == "1"
            env["SHA2CQ_H_DEVICE"] = "1" if h_dev else "0"
            env["SHA2CQ_BENCH_WARM"] = "1"
            env["SHA2CQ_BENCH_BOTH_MULTIOPEN"] = "1"
            try:
                # retries cover both wedged sessions (exit 9 via the bench's
                # own probe) and slow-load draws (per-attempt timeout)
                deadline = time.perf_counter() + budget
                r = None
                timed_out = 0
                for attempt in range(2):
                    left = min(350, int(deadline - time.perf_counter()))
                    if left < 60:
                        break
                    try:
                        r = subprocess.run(
                            [sys.executable,
                             os.path.join(
                                 os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "sha256_bench.py"),
                             "1", str(kk)],
                            env=env, timeout=left, capture_output=True,
                            text=True)
                    except subprocess.TimeoutExpired:
                        timed_out += 1
                        r = None
                        continue
                    if r.returncode != 9:
                        break
                if r is None:
                    raise subprocess.TimeoutExpired("sha256_bench", 350)
                line = (r.stdout.strip().splitlines() or ["{}"])[-1]
                stats = json.loads(line) if line.startswith("{") else {}
                if timed_out:
                    extra["sha256_attempts_timed_out"] = timed_out
                if r.returncode == 0 and stats.get("prove_s") is not None:
                    extra["sha256_prove_s"] = stats["prove_s"]
                    extra["sha256_verify_s"] = stats["verify_s"]
                    extra["sha256_verified"] = True  # bench asserts verify
                    extra["sha256_proof_bytes"] = stats["proof_bytes"]
                    extra["sha256_k"] = kk
                    extra["sha256_h_device"] = h_dev
                    if "prove_warm_s" in stats:
                        extra["sha256_prove_warm_s"] = stats["prove_warm_s"]
                    if "prove_warm_shplonk_s" in stats:
                        extra["sha256_prove_warm_shplonk_s"] = (
                            stats["prove_warm_shplonk_s"])
                else:
                    extra["sha256_error"] = (
                        f"rc={r.returncode}: " + r.stdout[-80:].strip())
            except subprocess.TimeoutExpired:
                extra["sha256_skipped"] = "timeboxed (350 s/attempt)"
        else:
            extra["sha256_skipped"] = "no cached table setup on this machine"
    except Exception as e:  # pragma: no cover
        extra["sha256_error"] = repr(e)[:160]

    # fallback tier (VERDICT r4 #2): when the multi-hour 32-bit table cache
    # is absent (or the flagship leg failed), prove+verify the 8-bit SHA
    # scheme instead — its ~35 s setup builds anywhere, so the bench can
    # never again emit only "sha256_skipped" with zero e2e SHA evidence.
    if "sha256_prove_s" not in extra:
        try:
            budget = int(WATCHDOG_S - (time.perf_counter() - _t_start) - 60)
            if budget < 120:
                extra["sha256_8bit_skipped"] = (
                    f"insufficient watchdog budget left ({budget}s)")
            else:
                env = dict(os.environ)
                env.setdefault("SHA2CQ_H_DEVICE", "0")  # host h: no tunnel risk
                r = subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "benchmarks", "sha_bench.py"), "test"],
                    env=env, timeout=budget, capture_output=True, text=True)
                line = (r.stdout.strip().splitlines() or ["{}"])[-1]
                stats = json.loads(line) if line.startswith("{") else {}
                if r.returncode == 0 and stats.get("prove_s") is not None:
                    extra["sha256_8bit_prove_s"] = stats["prove_s"]
                    extra["sha256_8bit_verify_s"] = stats["verify_s"]
                    extra["sha256_8bit_setup_s"] = stats["setup_s"]
                    extra["sha256_8bit_proof_bytes"] = stats["proof_bytes"]
                    extra["sha256_8bit_verified"] = True  # bench asserts
                else:
                    extra["sha256_8bit_error"] = (
                        f"rc={r.returncode}: " + r.stdout[-80:].strip())
        except subprocess.TimeoutExpired:
            extra["sha256_8bit_skipped"] = "timeboxed"
        except Exception as e:  # pragma: no cover
            extra["sha256_8bit_error"] = repr(e)[:160]

    signal.alarm(0)
    print(json.dumps({
        "metric": f"ntt_2e{K}_seconds",
        "value": round(dt, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_BEST_FFT_S / dt, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
