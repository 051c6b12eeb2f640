"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware isn't available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

Must run before jax is first imported anywhere in the test process: the
axon TPU plugin registers itself from sitecustomize when
PALLAS_AXON_POOL_IPS is set and then pins jax_platforms to "axon,cpu".
"""
import os

_axon_registered = bool(os.environ.pop("PALLAS_AXON_POOL_IPS", None))
# Remote compile must die with the pool: if the axon plugin registered at
# interpreter start (POOL_IPS was set then), leaked remote compiles return
# executables built on/for the remote machine — they poison the persistent
# cache for every later local-CPU run (AOT "machine feature" mismatches,
# minutes-long zero-CPU waits per piece).  Tests therefore also use their
# own cache namespace, keyed off the main one — and when the plugin DID
# register before we could scrub the env (pytest launched without the
# `PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu` prefix), a throwaway dir, so a
# single bare run can never poison the shared cputest namespace (observed:
# 194 poisoned entries -> 30+ min 32 GB compile stalls in later runs).
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
if _axon_registered:
    import tempfile
    os.environ["SHA2CQ_JAX_CACHE"] = tempfile.mkdtemp(prefix="sha2cq_jax_")
    import sys
    print("conftest: axon plugin registered before env scrub; using a "
          "throwaway compile cache (launch pytest with "
          "`PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu` to reuse the shared "
          "cputest cache)", file=sys.stderr)
else:
    os.environ.setdefault(
        "SHA2CQ_JAX_CACHE",
        os.path.join(os.path.expanduser(
            os.environ.get("SHA2CQ_CACHE", "~/.cache/sha2cq_jax")), "cputest"))
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The env scrub above is not enough when the axon plugin registered at
# interpreter start: it pins the jax_platforms CONFIG to "axon,cpu", which
# wins over the env var — and then a single mid-suite jax.devices() call
# can flip to the 1-chip tunnel backend once it becomes reachable
# (observed: test_sharded_h_vm_2d_mesh seeing 1 device after 39 green
# tests).  Pin the config itself.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
