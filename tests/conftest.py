"""Test harness config: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): XLA's host platform is forced to expose 8 devices so sharding
tests exercise real collectives, and tests stay independent of the single
tunnelled TPU chip.  Note: this environment's sitecustomize registers the `axon`
TPU platform for every interpreter, and `JAX_PLATFORMS=cpu` in the environment is
not honored by it — `jax.config.update('jax_platforms', ...)` after import is,
so that's what we use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.default_backend() == "cpu", jax.default_backend()
