"""Driver-contract tests for __graft_entry__.

The driver compile-checks `entry()` (which may initialize the single-chip
axon/TPU backend) and then calls `dryrun_multichip(8)` IN THE SAME PROCESS.
Round 1 and round 2 both recorded a red MULTICHIP artifact because the
CPU-mesh platform flip is a no-op once any jax backend client exists.
These tests pin the fix: the dryrun must succeed from a process whose jax
is already initialized with a single device.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pristine_detection_sees_initialized_jax():
    import jax

    jax.devices()  # conftest already initialized the CPU backend anyway
    sys.path.insert(0, REPO)
    import __graft_entry__

    assert not __graft_entry__._jax_is_pristine()


@pytest.mark.slow
def test_dryrun_multichip_after_jax_initialized():
    """The exact driver pattern: jax.devices() first, then dryrun_multichip(8).

    The outer process pins a 1-device CPU client (no XLA_FLAGS), so the
    in-process platform flip cannot work — dryrun_multichip must detect the
    dirty state and re-exec in a clean child.
    """
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "ndev = len(jax.devices())\n"
        "assert ndev < 8, f'test precondition: expected <8 devices, got {ndev}'\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    env = dict(os.environ)
    # Keep the process off the TPU tunnel and off the conftest 8-device flags:
    # a plain 1-device CPU client is the dirty state the driver produces.
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-u", "-c", code],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "dryrun_multichip(8): OK" in res.stdout
