"""Tour of the wider spectral surface: real FFTs, DCT, convolution, c128.

Everything routes through the same planner — on TPU the fused VPU kernels do
the heavy lifting; on CPU the XLA Stockham path runs the show.

Run:  python examples/spectral_toolkit.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import fourier_tpu as ft

rng = np.random.default_rng(0)

# Real-input FFT: one-sided spectrum, half the work of a c2c transform.
x = rng.standard_normal(4096).astype(np.float32)
spec = ft.rfft(x)
print(f"rfft: {x.shape} real -> {spec.shape} bins, "
      f"rel err {np.linalg.norm(spec - np.fft.rfft(x)) / np.linalg.norm(spec):.1e}")
back = ft.irfft(spec, n=4096)
print(f"irfft roundtrip max err {np.max(np.abs(back - x)):.1e}")

# 2-D real transform (e.g. an image).
img = rng.standard_normal((256, 256)).astype(np.float32)
s2 = ft.rfft2(img)
print(f"rfft2: {img.shape} -> {s2.shape}")

# DCT-II with orthonormal scaling — the JPEG/spectral-methods workhorse.
blocks = rng.standard_normal((128, 64)).astype(np.float32)
coeffs = ft.dct(blocks, type=2, norm="ortho")
rec = ft.idct(coeffs, type=2, norm="ortho")
print(f"dct/idct ortho roundtrip max err {np.max(np.abs(rec - blocks)):.1e}")

# Linear convolution via FFT: padded sizes always land on a fast 2^a*3^b
# plan (next_fast_len), never a Bluestein detour.
sig = rng.standard_normal(10_000).astype(np.float32)
ker = np.exp(-0.5 * np.linspace(-3, 3, 301) ** 2).astype(np.float32)
smooth = ft.fftconvolve(sig, ker, mode="same")
print(f"fftconvolve: n={len(sig)} * k={len(ker)} -> {smooth.shape} "
      f"(padded to {ft.next_fast_len(len(sig) + len(ker) - 1)})")

# Double precision without device f64: the dd (two-f32) path meets 1e-12.
xd = rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
plan = ft.create_fft(1024, np.complex128, backend="dd")
yd = plan.fft(xd)
print(f"c128 dd fft rel err "
      f"{np.linalg.norm(yd - np.fft.fft(xd)) / np.linalg.norm(yd):.1e}")
