"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the standard JAX
fake-multi-device trick), replacing the reference's (absent) distributed
tests.

NOTE: this image's sitecustomize imports jax and registers the `axon` TPU
backend at interpreter start, so JAX_PLATFORMS env tweaks are too late —
the platform must be forced through jax.config before backends initialize.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
