"""Test config: force an 8-device virtual CPU mesh so sharding paths run.

The environment presets JAX_PLATFORMS=axon (the tunneled real TPU) and
pre-imports jax at interpreter startup, so plain env-var edits are too late.
Backends initialize lazily, though — overriding via jax.config before the
first device query still wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
