"""Standalone probe of the fused one-program h path at SHA-256 k=13 shapes.

Separates (a) program load/compile, (b) steady-state execution, (c) the
device->host fetch — the three costs the prover profile can't distinguish
because block_until_ready returns early through the axon tunnel.

Usage: python benchmarks/h_oneprog_probe.py [k] [iters]
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from sha256_bench import pad_message
from sha2cq_tpu.fields import device as D
from sha2cq_tpu.models.sha.circuit32 import Sha256Circuit
from sha2cq_tpu.models.sha.setup32 import build_sha256_setup
from sha2cq_tpu.models.sha.tables32 import SCHEME32
from sha2cq_tpu.plonk import keygen_pk, keygen_vk
from sha2cq_tpu.plonk.device_eval import get_h_fn, prepare_h_inputs
from sha2cq_tpu.poly.kzg.params import ParamsKZG

PINNED_S = 0x2b068e00660fd714ab61695867925740388c0d300215adf8c964f5d93e9a76e7


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    t0 = time.time()
    tables, configs, b0s, _ = build_sha256_setup(SCHEME32, 1 << k, PINNED_S)
    params = ParamsKZG.setup_from_toxic_waste(k, PINNED_S)
    msg = bytes(random.Random(0x5256).randrange(256) for _ in range(55))
    circuit = Sha256Circuit(pad_message(msg), tables)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0s, vk, circuit)
    print(f"setup+keygen {time.time()-t0:.1f}s", flush=True)

    n = pk.vk.domain.n
    cs = pk.vk.cs
    rng = random.Random(9)
    P = D.FR.p

    def col():
        return [rng.randrange(P) for _ in range(n)]

    adv = [col() for _ in range(cs.num_advice_columns)]
    inst = [col() for _ in range(cs.num_instance_columns)]
    n_z = (len(cs.permutation.columns) + max(pk.vk.cs_degree - 2 - 1, 0)) \
        // max(pk.vk.cs_degree - 2, 1) if cs.permutation.columns else 0
    perms = [{"sets": [{"lagrange": col()} for _ in range(n_z)]}] if n_z else []
    sls = [[{"b": col(), "f": col()} for _ in range(len(cs.static_lookups))]]
    challenges = [rng.randrange(P) for _ in range(cs.num_challenges)]

    t0 = time.time()
    fn = get_h_fn(pk, use_mxu=True)
    print(f"h_fn build {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    inputs = prepare_h_inputs(
        pk, [adv], [inst], challenges, rng.randrange(P), rng.randrange(P),
        rng.randrange(P), rng.randrange(P), [[]], sls, perms)
    jax.block_until_ready(inputs["advice"])
    print(f"pack+ship {time.time()-t0:.1f}s", flush=True)

    for i in range(iters):
        t0 = time.time()
        h_dev, adv_coeff = fn(inputs)
        t_disp = time.time() - t0
        t0 = time.time()
        h_host = np.asarray(jax.device_get(h_dev))
        t_fetch_h = time.time() - t0
        t0 = time.time()
        _ = np.asarray(jax.device_get(adv_coeff))
        t_fetch_a = time.time() - t0
        print(f"iter {i}: dispatch {t_disp:7.2f}s  fetch_h {t_fetch_h:6.2f}s  "
              f"fetch_adv {t_fetch_a:6.2f}s   h[0,:2]={h_host[0,:2]}",
              flush=True)


if __name__ == "__main__":
    main()
