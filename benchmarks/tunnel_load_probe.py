"""Tunnel-load roulette quantification (VERDICT r4 #7): distribution of the
per-process h-executable load across N fresh processes.

Through the axon tunnel the dominant cold-process cost is loading the fused
h executable onto the remote backend at its first execution: ~6 s on a
quiet tunnel, 59-204 s observed under load (BASELINE.md round 4).  The AOT
disk blob (zlib-compressed since round 5) removes the COMPILE, not the
remote load — this probe measures what remains.

Each child process: build the flagship k=13 pipeline from the cached table
setup, run get_h_fn(...).prewarm() (deserialize + one zero-input dispatch
that pays the remote program load), and report phase timings.  The parent
prints the distribution (min/p50/p95/max) as one JSON line.

Usage: python benchmarks/tunnel_load_probe.py [nproc=20]
Requires the cached 32-bit table setup (sha256_bench.py 1 13 run once).
"""
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ["SHA2CQ_PROFILE"] = "1"
t_start = time.perf_counter()
from sha2cq_tpu.models.sha.setup32 import build_sha256_setup
from sha2cq_tpu.models.sha.tables32 import SCHEME32
from sha2cq_tpu.models.sha.circuit32 import Sha256Circuit
from sha2cq_tpu.plonk import keygen_pk, keygen_vk
from sha2cq_tpu.poly.kzg.params import ParamsKZG
S = 0x2b068e00660fd714ab61695867925740388c0d300215adf8c964f5d93e9a76e7
K = 13
tables, configs, b0, srs = build_sha256_setup(SCHEME32, 1 << K, S)
params = ParamsKZG.setup_from_toxic_waste(K, S)
circuit = Sha256Circuit([[0] * 16], tables)
vk = keygen_vk(params, circuit)
pk = keygen_pk(params, configs, b0, vk, circuit)
t_setup = time.perf_counter() - t_start

from sha2cq_tpu.plonk.device_eval import get_h_fn
from sha2cq_tpu.utils.profiling import profiler
t0 = time.perf_counter()
fn = get_h_fn(pk, use_mxu=True)
t_build = time.perf_counter() - t0
t0 = time.perf_counter()
pw = getattr(fn, "prewarm", None)
assert pw is not None, "one-program path off: no prewarm hook"
pw()                  # deserialize + zero-input dispatch = remote load
t_load = time.perf_counter() - t0
tm = profiler.timings()
print("CHILD " + json.dumps({
    "setup_s": round(t_setup, 2), "build_s": round(t_build, 2),
    "load_s": round(t_load, 2),
    "aot_deser_s": round(tm.get("aot_deser", 0), 2),
    "aot_compile_s": round(tm.get("aot_compile", 0), 2),
}), flush=True)
"""


def main():
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    child_src = CHILD % {"repo": os.path.dirname(HERE)}
    rows = []
    for i in range(nproc):
        t0 = time.perf_counter()
        r = subprocess.run([sys.executable, "-c", child_src],
                           capture_output=True, text=True, timeout=1200)
        wall = time.perf_counter() - t0
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("CHILD ")), None)
        if r.returncode != 0 or line is None:
            rows.append({"error": (r.stdout + r.stderr)[-160:], "wall_s": wall})
            print(f"[{i}] FAILED wall={wall:.1f}s", flush=True)
            continue
        row = json.loads(line[len("CHILD "):])
        row["wall_s"] = round(wall, 2)
        rows.append(row)
        print(f"[{i}] load={row['load_s']}s deser={row['aot_deser_s']}s "
              f"compile={row['aot_compile_s']}s wall={wall:.1f}s", flush=True)

    loads = sorted(r["load_s"] for r in rows if "load_s" in r
                   and r.get("aot_compile_s", 0) == 0)
    out = {"nproc": nproc, "n_ok": len(loads), "rows": rows}
    if loads:
        out.update({
            "load_min_s": loads[0], "load_max_s": loads[-1],
            "load_p50_s": round(statistics.median(loads), 2),
            "load_p95_s": round(
                loads[min(len(loads) - 1, int(0.95 * len(loads)))], 2),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
