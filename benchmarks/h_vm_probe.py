"""Probe: h-VM program size + on-device execution time, isolated from the
prover.  Assembles the SHA-256 (k=13) h program from the cached setup and
times _vm_run on synthetic register/column data (amortized dependent chain,
device_get-closed — block_until_ready lies through the axon tunnel).

Usage: python benchmarks/h_vm_probe.py [k] [--tiny]
  --tiny uses the e2e CQ test circuit instead of SHA (no cache needed).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sha_pk(k: int):
    from sha2cq_tpu.models.sha.circuit32 import Sha256Circuit
    from sha2cq_tpu.models.sha.setup32 import build_sha256_setup
    from sha2cq_tpu.models.sha.tables32 import SCHEME32
    from sha2cq_tpu.plonk import keygen_pk, keygen_vk
    from sha2cq_tpu.poly.kzg.params import ParamsKZG

    PINNED_S = 0x2b068e00660fd714ab61695867925740388c0d300215adf8c964f5d93e9a76e7
    tables, configs, b0, srs = build_sha256_setup(SCHEME32, 1 << k, PINNED_S)
    params = ParamsKZG.setup_from_toxic_waste(k, PINNED_S)
    blocks = [[i + 1 for i in range(16)]]
    circuit = Sha256Circuit(blocks, tables)
    vk = keygen_vk(params, circuit)
    return keygen_pk(params, configs, b0, vk, circuit)


def tiny_pk():
    import random
    import tests.test_e2e_cq as E
    from sha2cq_tpu.plonk import keygen_pk, keygen_vk
    rng, srs, t1, t2, params, configs, b0 = E._setup(3)
    circuit = E.MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    return keygen_pk(params, configs, b0, vk, circuit)


def main():
    tiny = "--tiny" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    k = int(args[0]) if args else 13

    t0 = time.time()
    pk = tiny_pk() if tiny else sha_pk(k)
    print(f"pk built: {time.time() - t0:.1f}s", flush=True)

    from sha2cq_tpu.plonk import h_vm
    t0 = time.time()
    prog = h_vm.assemble_h_program(pk)
    cs = pk.vk.cs
    print(f"assemble: {time.time() - t0:.2f}s; "
          f"instrs={len(prog.instrs)} regs={prog.n_reg} "
          f"consts={len(prog.const_scalars)} "
          f"(gates={len(cs.gates)} static={len(cs.static_lookups)})",
          flush=True)

    import jax
    import jax.numpy as jnp
    from sha2cq_tpu.fields import device as D
    from sha2cq_tpu.fields.device import FR, NLIMB, U32

    domain = pk.vk.domain
    size = domain.extended_n
    rng = np.random.default_rng(0)

    def cols(c):
        a = rng.integers(0, 1 << 16, size=(NLIMB, max(c, 1), size),
                         dtype=np.uint32)
        return jnp.asarray(a)

    state = {
        "advice": cols(cs.num_advice_columns),
        "instance": cols(cs.num_instance_columns),
        "z": cols(2),
        "lk": cols(3 * max(len(cs.lookups), 1)),
        "st": cols(2 * max(len(cs.static_lookups), 1)),
    }
    consts = {
        "fixed": cols(cs.num_fixed_columns),
        "sigma": cols(len(cs.permutation.columns)),
        "l0": cols(1)[:, 0], "l_last": cols(1)[:, 0],
        "l_active": cols(1)[:, 0], "zeta_times_coset": cols(1)[:, 0],
    }
    one = D.pack_scalar(1, FR).reshape(NLIMB, 1)
    scalars = {
        "y": one, "beta": one, "gamma": one, "theta": one,
        "challenges": jnp.zeros((NLIMB, cs.num_challenges, 1), dtype=U32),
    }

    print(f"size={size} cols: adv={state['advice'].shape[1]} "
          f"fixed={consts['fixed'].shape[1]} st={state['st'].shape[1]}",
          flush=True)

    t0 = time.time()
    out = h_vm.run_program(prog, state, consts, scalars, size)
    got = jax.device_get(out[:, :1])
    print(f"first run (compile+exec): {time.time() - t0:.1f}s", flush=True)

    RUNS = 5
    t0 = time.time()
    for i in range(RUNS):
        # dependent chain: feed the output back in as l0 so runs serialize
        consts["l0"] = out
        out = h_vm.run_program(prog, state, consts, scalars, size)
    got = jax.device_get(out[:, :1])
    dt = (time.time() - t0) / RUNS
    print(f"amortized exec: {dt * 1e3:.1f} ms "
          f"({dt / max(len(prog.instrs), 1) * 1e6:.1f} us/instr)", flush=True)


if __name__ == "__main__":
    main()
