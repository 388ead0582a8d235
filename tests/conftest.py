"""Test environment: CPU backend with 8 virtual devices, x64 enabled.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the driver
separately dry-run-compiles the multi-chip path); numerics tests want f64.

NOTE: this image boots an `axon` TPU PJRT plugin from sitecustomize.py and
pins JAX_PLATFORMS=axon in the process environment, so env vars set here are
too late / overridden. The reliable switch is jax.config.update("jax_platforms")
immediately after importing jax; XLA_FLAGS must still be set before the CPU
backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
