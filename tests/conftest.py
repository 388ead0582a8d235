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

import pytest  # noqa: E402

# Heavyweight tests (measured >=2 min each in the round-3 full-suite run:
# 8-device mesh compiles, dd interpret sweeps, 4096-point interpret kernels).
# The quick tier (`pytest -m "not slow"`) excludes them; the full tier
# (pre-commit / CI) runs everything. Patterns match test nodeid prefixes.
_SLOW_PATTERNS = (
    "test_vpu_dd.py",
    "test_dd_split.py::test_split_vs_oracle",
    "test_sharded.py",
    "test_vpu.py::test_vpu_modes",
    "test_dct.py::test_dct_dd_lane",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[4096",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[2187",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[1728",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[1024",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[729",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[576",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[512",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[625",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[320",
    "test_vpu.py::test_vpu_batch_minor_vs_oracle[1000",
    "test_rfft.py::test_rfft_c128_dd",
    "test_ndim.py::test_numpy_compat_kwargs",
    "test_mxu.py::test_mxu_vs_oracle[pallas-4096",
    "test_mxu.py::test_mxu_vs_oracle[xla-4096",
    "test_integrity.py::test_roundtrips[73",
    "test_dd.py::test_dd_jit_scaled_modes",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.split("/")[-1]
        if any(nodeid.startswith(p) for p in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
