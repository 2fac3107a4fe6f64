"""Test configuration: force an 8-virtual-device CPU platform.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md section 4): XLA's host platform is split into 8 virtual devices so
`jax.sharding.Mesh` / `shard_map` code paths run for real, including
collectives, on any machine.

Note: the environment pre-imports jax via PYTHONPATH sitecustomize with
JAX_PLATFORMS=axon (remote TPU tunnel), so env vars alone are not enough —
we must also flip the platform on the already-imported jax config.  XLA_FLAGS
still applies because CPU backends initialize lazily on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
