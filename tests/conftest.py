"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (the driver dry-runs the real
multi-chip path separately via __graft_entry__.dryrun_multichip).

Set BP_TPU_TESTS=1 to keep the real TPU backend instead (enables the
tests marked tpu-only, e.g. the fused Pallas matvec parity checks).

Note: the axon TPU plugin in this environment ignores the JAX_PLATFORMS
env var, so the platform must be forced via jax.config before first use."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("BP_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
