"""Exhaustive size sweep: every n in [2, 513] plus random larger sizes.

The planner must produce a correct plan for EVERY size (the reference's
planner contract, fourier/src/lib.rs:31-60: autosort else Bluestein, no
unsupported sizes). Execution uses the eager-numpy path (`_apply` on numpy
planes — the repo's backend-polymorphic convention), so the full sweep
costs milliseconds per size instead of an XLA compile per size; this is
the safety net under the family-specific suites, catching schedule/twiddle
bugs at sizes nobody hand-picked.
"""

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu.transform import Transform

RNG = np.random.default_rng(0xF022)


def _gate(n, dtype):
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(dtype)
    plan = ft.create_fft(n, dtype, cache=False)
    rt = np.float32 if dtype == np.complex64 else np.float64
    re, im = x.real.astype(rt).copy(), x.imag.astype(rt).copy()
    if hasattr(plan, "_apply"):
        fre, fim = plan._apply(re, im, Transform.FFT)
        bre, bim = plan._apply(np.asarray(fre), np.asarray(fim),
                               Transform.IFFT)
    else:  # dd 4-plane plan
        from fourier_tpu.precision import ddreal as dd

        planes = (*dd.from_f64(x.real), *dd.from_f64(x.imag))
        (frh, frl), (fih, fil) = plan._apply_dd(
            ((planes[0], planes[1]), (planes[2], planes[3])), Transform.FFT
        )
        (brh, brl), (bih, bil) = plan._apply_dd(
            ((frh, frl), (fih, fil)), Transform.IFFT
        )
        fre, fim = dd.to_f64((np.asarray(frh), np.asarray(frl))), dd.to_f64(
            (np.asarray(fih), np.asarray(fil))
        )
        bre, bim = dd.to_f64((np.asarray(brh), np.asarray(brl))), dd.to_f64(
            (np.asarray(bih), np.asarray(bil))
        )
    got = np.asarray(fre) + 1j * np.asarray(fim)
    want = np.fft.fft(x)
    # c128 Bluestein accumulates ~1e-13 rel-L2 by n=1000 and ~7e-13 by 4096
    # (two padded inner transforms; matches BENCH_SUITE rel_l2 on-chip).
    tol = 1e-5 if dtype == np.complex64 else 1e-12
    assert np.linalg.norm(got - want) <= tol * max(
        1.0, np.linalg.norm(want)
    ), f"n={n} {np.dtype(dtype).name}"
    back = np.asarray(bre) + 1j * np.asarray(bim)
    assert np.linalg.norm(back - x) <= tol * max(
        1.0, np.linalg.norm(x)
    ), f"roundtrip n={n}"


@pytest.mark.parametrize("residue", range(8))
def test_every_size_2_to_513_c64(residue):
    for n in range(2 + residue, 514, 8):
        _gate(n, np.complex64)


def test_random_larger_sizes_both_dtypes():
    sizes = sorted(RNG.choice(np.arange(514, 4097), size=8, replace=False))
    for n in sizes:
        _gate(int(n), np.complex64)
    for n in sizes[:4]:
        _gate(int(n), np.complex128)


def test_small_sizes_c128():
    for n in list(range(2, 34)) + [61, 97, 128, 243, 256, 360, 509]:
        _gate(n, np.complex128)
