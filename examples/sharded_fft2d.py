"""Pod-sharded 2-D FFT: spectral filtering of a large image across devices.

Demonstrates the net-new multi-chip capability: a 2-D transform sharded over a
device mesh with all_to_all transposes over ICI. Runs on any device count —
here on the host's devices (use XLA_FLAGS=--xla_force_host_platform_device_count=8
with a CPU backend to simulate a mesh).

Run:  python examples/sharded_fft2d.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if jax.default_backend() != "tpu" and len(jax.devices()) < 2:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from fourier_tpu import Transform
from fourier_tpu.parallel import Fft2dPlan


def main():
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("fft",))
    n1 = n2 = 64 * len(devices)
    print(f"mesh: {len(devices)} x {devices[0].platform}, image {n1}x{n2}")

    plan = Fft2dPlan(n1, n2, mesh)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((n1, n2)).astype(np.float32)

    # Forward 2-D FFT, zero out high frequencies, inverse.
    fre, fim = plan.transform_planar(img, np.zeros_like(img), Transform.FFT)
    keep = n1 // 8
    mask = np.zeros((n1, n2), np.float32)
    mask[:keep, :keep] = mask[:keep, -keep:] = 1.0
    mask[-keep:, :keep] = mask[-keep:, -keep:] = 1.0
    lre, lim = plan.transform_planar(fre * mask, fim * mask, Transform.IFFT)

    smoothed = np.asarray(lre)
    want = np.real(np.fft.ifft2(np.fft.fft2(img) * mask))
    err = np.max(np.abs(smoothed - want))
    print(f"max |sharded - numpy| = {err:.3e}")
    print(f"energy kept: {np.var(smoothed) / np.var(img) * 100:.1f}%")
    assert err < 1e-3


if __name__ == "__main__":
    main()
