"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware isn't available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

Must run before jax is first imported anywhere in the test process: the
axon TPU plugin registers itself from sitecustomize when
PALLAS_AXON_POOL_IPS is set and then pins jax_platforms to "axon,cpu".
"""
import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
