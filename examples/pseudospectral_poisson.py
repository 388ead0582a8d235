"""Pod-sharded pseudospectral Poisson solve: the Rfft3dPlan showcase.

Solves the periodic Poisson equation  laplacian(u) = f  on a 3-D grid with
the classic pseudospectral method:

    u_hat(k) = -f_hat(k) / |k|^2        (u_hat(0) = 0)

using the pencil-decomposed real-input 3-D FFT over a 2-D device mesh. The
forward transform is left in the **spectral layout** (``spectral_output=
True``), the pointwise solve happens right there, and the inverse consumes
it directly (``from_spectral=True``) — 4 all_to_alls for the whole solve
instead of 8. This is the communication pattern of production
pseudospectral solvers (CFD, PME electrostatics).

Runs on any device count; on a CPU host use
XLA_FLAGS=--xla_force_host_platform_device_count=8 to simulate the mesh.

Run:  python examples/pseudospectral_poisson.py
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

from fourier_tpu.parallel import Rfft3dPlan


def main():
    devices = np.array(jax.devices())
    ndev = len(devices)
    sa = 2 if ndev % 2 == 0 else 1
    mesh = Mesh(devices.reshape(sa, ndev // sa), ("x", "y"))
    n = 32  # grid points per axis (periodic unit box)
    print(f"mesh: {dict(mesh.shape)} x {devices[0].platform}, grid {n}^3")

    plan = Rfft3dPlan(n, n, n, mesh, spectral_output=True)
    print(plan)

    # Manufactured solution: u = sin(2pi*3x) cos(2pi*2y) sin(2pi*z),
    # so f = laplacian(u) = -(2pi)^2 (9 + 4 + 1) u.
    g = np.arange(n) / n
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    u_exact = np.sin(2 * np.pi * 3 * X) * np.cos(2 * np.pi * 2 * Y) * np.sin(
        2 * np.pi * Z
    )
    f = -((2 * np.pi) ** 2) * (9 + 4 + 1) * u_exact

    # Forward r2c into the spectral layout (2 all_to_alls).
    fre, fim = plan.rfft_planar(f.astype(np.float32))

    # |k|^2 on the padded one-sided grid; pad bins (zero-valued) get 1 to
    # keep the division well-defined. DC solves to 0 (mean-free u).
    k0 = np.fft.fftfreq(n, d=1.0 / n)
    k2 = np.arange(plan.n2p)  # rfft bins 0..out_len-1, then pad
    KX, KY, KZ = np.meshgrid(k0, k0, k2, indexing="ij")
    ksq = (2 * np.pi) ** 2 * (KX**2 + KY**2 + KZ**2)
    ksq[0, 0, 0] = 1.0
    inv = (-1.0 / ksq).astype(np.float32)
    inv[0, 0, 0] = 0.0
    inv[..., plan.out_len:] = 0.0  # pad bins stay zero

    # Pointwise solve in the spectral layout — no communication at all.
    ure, uim = fre * inv, fim * inv

    # Inverse c2r straight from the spectral layout (2 all_to_alls).
    u = np.asarray(plan.irfft_planar(ure, uim, from_spectral=True))

    err = np.max(np.abs(u - u_exact))
    print(f"max |u - u_exact| = {err:.3e}")
    assert err < 1e-4, "pseudospectral Poisson solve mismatch"
    print("OK: 3-D Poisson solved with 4 all_to_alls (vs 8 natural-layout)")


if __name__ == "__main__":
    main()
