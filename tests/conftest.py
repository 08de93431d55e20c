"""Test config: run JAX on the host CPU with 8 virtual devices so sharding
tests can exercise a multi-chip mesh without TPU hardware.

The environment pre-registers a tunneled TPU backend at interpreter startup
(sitecustomize) and pins ``JAX_PLATFORMS=axon``, so plain env vars set here
are too late; ``jax.config.update`` before first backend use is the reliable
override.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
