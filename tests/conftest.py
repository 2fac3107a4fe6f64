"""Test configuration: force an 8-virtual-device CPU platform.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md section 4): XLA's host platform is split into 8 virtual devices so
`jax.sharding.Mesh` / `shard_map` code paths run for real, including
collectives, on any machine.
"""

import os

# Must be set before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
