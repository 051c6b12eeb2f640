"""sha2cq_tpu: a TPU-native halo2-style proving stack (KZG on BN254, PLONK
with CQ static lookups, SHA2-on-CQ circuits) built on JAX/XLA/Pallas.

Capability map vs the reference (aleph-zero-foundation/sha2-on-cq-halo2):
  fields/, curves/   <- arithmetic/curves (halo2curves)
  ops/               <- halo2_proofs/src/arithmetic.rs hot kernels (NTT, MSM)
  poly/              <- halo2_proofs/src/poly (domain, KZG, GWC/SHPLONK)
  plonk/             <- halo2_proofs/src/plonk (IR, keygen, prover, verifier,
                        permutation, lookup, static_lookup/CQ, vanishing)
  circuit/, dev/     <- halo2_proofs/src/circuit + dev (layouter, MockProver)
  models/            <- sha/, sha-reference (tables + circuits)
  parallel/          <- multi-chip sharding (the rayon analogue, done with
                        jax.sharding meshes + collectives)
  utils/             <- transcript, serde, rng
"""
import os

import jax

# Persistent compilation cache: the limb-arithmetic kernels produce large HLO
# whose compiles are expensive; cache them across processes.
#
# Namespacing: under the axon plugin (PALLAS_AXON_POOL_IPS set at interpreter
# start) remote_compile=1 routes compiles to the terminal machine, which
# returns blobs targeted at ITS cpu features (+amx*, +prefer-no-scatter) for
# any CPU-backend piece.  Those blobs are keyed identically to local CPU
# compiles, so sharing one cache dir poisons every later pure-CPU run with
# executables this host can't run properly (observed: 30+ min 32 GB "hangs"
# when XLA falls back around them).  Axon-mode processes therefore get their
# own namespace; pure-CPU processes use the root; pytest uses cputest (see
# tests/conftest.py, which also falls back to a throwaway dir when the
# plugin got registered before it could scrub the env).
_cache_dir = os.environ.get("SHA2CQ_JAX_CACHE")
if _cache_dir is None:
    _cache_dir = os.path.expanduser("~/.cache/sha2cq_jax")
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        _cache_dir = os.path.join(_cache_dir, "axon")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # cache is an optimization only
    pass
