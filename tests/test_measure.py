"""Measured planning + wisdom (plan/measure.py).

Off-TPU the c64 candidate set collapses to the Stockham family (Pallas
families would time the Mosaic emulator), so the interesting timed path on
CPU is c128, where native-f64 Stockham and the XLA dd emulation are both
plain-XLA candidates.
"""

import json

import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu.plan import measure
from fourier_tpu.transform import Transform


@pytest.fixture(autouse=True)
def _fresh_wisdom():
    measure.forget_wisdom()
    yield
    measure.forget_wisdom()


def _fft_via(plan, x):
    re, im = plan.fft_planar(x.real.copy(), x.imag.copy())
    return np.asarray(re) + 1j * np.asarray(im)


def test_measure_c64_single_candidate_no_timing():
    res = ft.measure_fft(96, np.complex64)
    assert res.best == "stockham"
    assert res.timings_us == {"stockham": 0.0}  # sole candidate: not timed
    x = (np.random.default_rng(0).standard_normal(96)
         + 1j * np.random.default_rng(1).standard_normal(96)).astype(
             np.complex64)
    got = _fft_via(res.plan, x)
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


def test_measure_c128_times_candidates_and_remembers():
    res = ft.measure_fft(32, np.complex128, batch=8, chain=2, iters=1)
    assert set(res.timings_us) == {"stockham", "dd_xla"}
    assert all(v > 0 for v in res.timings_us.values())
    assert res.best in res.timings_us
    # wisdom remembered: plan_from_wisdom rebuilds without timing
    plan = measure.plan_from_wisdom(32, np.complex128)
    assert plan is not None
    x = np.random.default_rng(2).standard_normal(32) + 1j * (
        np.random.default_rng(3).standard_normal(32))
    got = np.asarray(plan.fft(x))  # both c128 families expose .fft
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


def test_create_fft_backend_measure():
    plan = ft.create_fft(64, np.complex64, backend="measure", cache=False)
    x = (np.random.default_rng(4).standard_normal(64)
         + 1j * np.random.default_rng(5).standard_normal(64)).astype(
             np.complex64)
    got = _fft_via(plan, x)
    want = np.fft.fft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5
    # second creation hits wisdom (no re-measure): poison measure_fft
    orig = measure.measure_fft
    measure.measure_fft = None
    try:
        plan2 = ft.create_fft(64, np.complex64, backend="measure",
                              cache=False)
    finally:
        measure.measure_fft = orig
    got2 = _fft_via(plan2, x)
    assert np.linalg.norm(got2 - want) / np.linalg.norm(want) < 1e-5


def test_wisdom_export_import_roundtrip(tmp_path):
    ft.measure_fft(96, np.complex64)
    doc = ft.export_wisdom()
    parsed = json.loads(doc)
    assert parsed["version"] == measure.WISDOM_VERSION
    assert len(parsed["entries"]) == 1

    path = tmp_path / "wisdom.json"
    ft.export_wisdom(str(path))
    ft.forget_wisdom()
    assert measure.plan_from_wisdom(96, np.complex64) is None
    n = ft.import_wisdom(str(path))
    assert n == 1
    assert measure.plan_from_wisdom(96, np.complex64) is not None
    # import from a JSON string too
    ft.forget_wisdom()
    assert ft.import_wisdom(doc) == 1


def test_wisdom_rejects_malformed():
    with pytest.raises(ValueError):
        ft.import_wisdom("{not json")
    with pytest.raises(ValueError):
        ft.import_wisdom(json.dumps({"version": 999, "entries": {}}))
    with pytest.raises(ValueError):
        ft.import_wisdom(json.dumps({
            "version": measure.WISDOM_VERSION,
            "entries": {"cpu/complex64/64": {"backend": "evil_pickle"}},
        }))


def test_measured_plan_modes_roundtrip():
    res = ft.measure_fft(48, np.complex64)
    plan = res.plan
    x = (np.random.default_rng(6).standard_normal((4, 48))
         + 1j * np.random.default_rng(7).standard_normal((4, 48))).astype(
             np.complex64)
    fre, fim = plan.transform_planar(x.real.copy(), x.imag.copy(),
                                     Transform.FFT)
    bre, bim = plan.transform_planar(fre, fim, Transform.IFFT)
    got = np.asarray(bre) + 1j * np.asarray(bim)
    assert np.linalg.norm(got - x) / np.linalg.norm(x) < 1e-5
