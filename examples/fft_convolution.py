"""FFT-based circular convolution / filtering with fourier-tpu.

Demonstrates the classic FFT use-case: O(n log n) circular convolution via
forward transform -> spectral multiply -> inverse transform, with the
TPU-native planar API so everything runs on-device under one jit.

Run:  python examples/fft_convolution.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import fourier_tpu as ft
from fourier_tpu import Transform
from fourier_tpu.ops import cplx


def circular_convolve(plan, sig_re, sig_im, ker_re, ker_im):
    """Planar circular convolution of signal and kernel (both length n)."""
    s = plan.transform_planar(sig_re, sig_im, Transform.FFT)
    k = plan.transform_planar(ker_re, ker_im, Transform.FFT)
    prod = cplx.mul(s, k)
    return plan.transform_planar(prod[0], prod[1], Transform.IFFT)


def main():
    n = 4096
    plan = ft.create_fft_f32(n)
    rng = np.random.default_rng(0)

    # A noisy signal and a low-pass (moving-average) kernel.
    t = np.arange(n)
    signal = np.sin(2 * np.pi * 5 * t / n) + 0.5 * rng.standard_normal(n)
    width = 32
    kernel = np.zeros(n)
    kernel[:width] = 1.0 / width

    conv = jax.jit(lambda sr, si, kr, ki: circular_convolve(plan, sr, si, kr, ki))
    ore, oim = conv(
        jnp.asarray(signal, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.asarray(kernel, jnp.float32),
        jnp.zeros(n, jnp.float32),
    )
    smoothed = np.asarray(ore)

    # Reference: numpy spectral convolution.
    want = np.real(np.fft.ifft(np.fft.fft(signal) * np.fft.fft(kernel)))
    err = np.max(np.abs(smoothed - want))
    print(f"n={n}, moving-average width={width}")
    print(f"max |fourier_tpu - numpy| = {err:.3e}")
    print(f"input  std: {signal.std():.3f}")
    print(f"output std: {smoothed.std():.3f} (smoothed)")
    assert err < 1e-3


if __name__ == "__main__":
    main()
