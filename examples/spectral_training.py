"""Training through the FFT: fit an FIR filter with a spectral loss.

Demonstrates that fourier-tpu plans are differentiable end-to-end: the
forward pass runs the planner's kernels (fused Pallas on TPU — their VJP is
the linearity-based custom rule in plan/base.py), and `jax.grad` backprops a
log-magnitude spectral loss to the filter taps. This is the spectral-loss
pattern used by audio/vocoder models, running on this framework's plans
instead of jnp.fft.

Run:  python examples/spectral_training.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import fourier_tpu as ft
from fourier_tpu import Transform

N = 512         # signal length
TAPS = 64       # FIR filter length
STEPS = 600
LR = 0.01


def main():
    rng = np.random.default_rng(0)
    plan = ft.create_fft(N)  # planner picks the backend (fused VPU on TPU)

    # Target filter: a band-pass; we recover it from input/output pairs by
    # matching log-magnitude spectra (a nonconvex, phase-blind loss — the
    # interesting case for gradients).
    t = np.arange(TAPS)
    target = (np.sinc((t - TAPS / 2) / 4) - np.sinc((t - TAPS / 2) / 8)) * (
        np.hamming(TAPS)
    )
    x = rng.standard_normal((8, N)).astype(np.float32)  # probe batch

    def apply_fir(signal, taps):
        # FFT convolution through the plan (all planar, all on-device).
        tap_sig = jnp.zeros((N,), jnp.float32).at[:TAPS].set(taps)
        sre, sim = plan.transform_planar(
            signal, jnp.zeros_like(signal), Transform.FFT
        )
        kre, kim = plan.transform_planar(
            tap_sig, jnp.zeros_like(tap_sig), Transform.FFT
        )
        yre = sre * kre - sim * kim
        yim = sre * kim + sim * kre
        ore, _ = plan.transform_planar(yre, yim, Transform.IFFT)
        return ore

    y_target = apply_fir(x, jnp.asarray(target.astype(np.float32)))

    def spectral_loss(taps):
        # Phase-blind relative magnitude matching (the STFT-loss family).
        y = apply_fir(x, taps)
        yre, yim = plan.transform_planar(
            y, jnp.zeros_like(y), Transform.FFT
        )
        tre, tim = plan.transform_planar(
            y_target, jnp.zeros_like(y_target), Transform.FFT
        )
        m2, mt2 = yre**2 + yim**2, tre**2 + tim**2
        diff = jnp.sqrt(m2 + 1e-8) - jnp.sqrt(mt2 + 1e-8)
        return jnp.mean(diff**2) / jnp.mean(mt2)

    value_and_grad = jax.jit(jax.value_and_grad(spectral_loss))
    # Identity-plus-noise init: taps=0 is a saddle of any magnitude loss
    # (|Y| is quadratically flat there).
    taps = jnp.asarray(
        (0.01 * rng.standard_normal(TAPS)).astype(np.float32)
    ).at[0].add(1.0)
    m_s = jnp.zeros_like(taps)
    v_s = jnp.zeros_like(taps)
    for step in range(STEPS):  # Adam
        loss, g = value_and_grad(taps)
        m_s = 0.9 * m_s + 0.1 * g
        v_s = 0.999 * v_s + 0.001 * g * g
        mh = m_s / (1 - 0.9 ** (step + 1))
        vh = v_s / (1 - 0.999 ** (step + 1))
        taps = taps - LR * mh / (jnp.sqrt(vh) + 1e-8)
        if step % 150 == 0 or step == STEPS - 1:
            print(f"step {step:3d}  spectral loss {float(loss):.6f}")

    final = float(spectral_loss(taps))
    print(f"final spectral loss: {final:.6f}")
    assert final < 1e-3, "spectral training failed to converge"
    print("OK: FIR filter recovered by backprop through fourier-tpu plans")


if __name__ == "__main__":
    main()
