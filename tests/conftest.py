"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) since only one real TPU
chip is available in this environment.

Note: the environment's sitecustomize registers a remote TPU backend and
programmatically sets jax_platforms, which both overrides the JAX_PLATFORMS
env var and makes backend init take ~70s through the relay. Re-setting the
config after import restores fast CPU-only init for the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
