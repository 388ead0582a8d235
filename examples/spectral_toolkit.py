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

# Overlap-add convolution: the long axis is cut into blocks that become a
# BATCH dimension — many small fused-kernel transforms instead of one giant
# padded FFT.
long_sig = rng.standard_normal(300_000).astype(np.float32)
fir = np.blackman(401).astype(np.float32)
filt = ft.oaconvolve(long_sig, fir, mode="same")
print(f"oaconvolve: n={len(long_sig)} * k={len(fir)} -> {filt.shape}")

# Spectral analysis: Welch PSD and a spectrogram, frames = batch dimension.
fs = 1000.0
tt = np.arange(60_000) / fs
tone = (np.sin(2 * np.pi * 123 * tt)
        + 0.5 * rng.standard_normal(tt.size)).astype(np.float32)
f, p = ft.welch(tone, fs=fs, nperseg=1024)
print(f"welch: peak at {f[np.argmax(p)]:.1f} Hz (expected 123)")
f, t, z = ft.stft(tone, fs=fs, nperseg=512)
_, rec = ft.istft(z, fs=fs, nperseg=512)
print(f"stft/istft: {z.shape} spectrogram, roundtrip rel err "
      f"{np.linalg.norm(rec[:tone.size] - tone) / np.linalg.norm(tone):.1e}")

# Device-resident STFT: a pytree plan, traceable end-to-end (stays on-chip).
import jax

splan = ft.StftPlan(512, hop=256, fs=fs)
sre, sim = jax.jit(splan.stft_planar)(tone)
print(f"StftPlan (jitted): {sre.shape} frames x bins, "
      f"peak {splan.f()[np.argmax(np.abs(np.asarray(sre) + 1j*np.asarray(sim)).mean(0))]:.1f} Hz")

# Analytic signal + envelope, and Fourier resampling.
env = np.abs(np.asarray(ft.hilbert(tone[:4096])))
print(f"hilbert envelope mean {env.mean():.2f}")
down = ft.resample(tone[:8192], 2048)
print(f"resample: 8192 -> {down.shape}")
