"""DCT/DST tests vs scipy.fft across types, norms, dtypes, axes."""

import numpy as np
import pytest
from scipy import fft as sfft

from fourier_tpu.dctdst import dct, dst, idct, idst

RNG_SEED = 0xDC7

TYPES = [1, 2, 3, 4]
NORMS = [None, "ortho", "forward"]


def _rel(got, want):
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)


@pytest.mark.parametrize("n", [2, 5, 8, 16, 27])
@pytest.mark.parametrize("type", TYPES)
def test_dct_vs_scipy(n, type):
    rng = np.random.default_rng(RNG_SEED + n)
    x = rng.standard_normal((3, n))
    for norm in NORMS:
        got = dct(x, type=type, norm=norm)
        want = sfft.dct(x, type=type, norm=norm)
        assert _rel(got, want) < 1e-12, (type, norm)
        goti = idct(x, type=type, norm=norm)
        wanti = sfft.idct(x, type=type, norm=norm)
        assert _rel(goti, wanti) < 1e-12, ("i", type, norm)


@pytest.mark.parametrize("n", [2, 5, 8, 16, 27])
@pytest.mark.parametrize("type", TYPES)
def test_dst_vs_scipy(n, type):
    rng = np.random.default_rng(RNG_SEED + n)
    x = rng.standard_normal((3, n))
    for norm in NORMS:
        got = dst(x, type=type, norm=norm)
        want = sfft.dst(x, type=type, norm=norm)
        assert _rel(got, want) < 1e-12, (type, norm)
        goti = idst(x, type=type, norm=norm)
        wanti = sfft.idst(x, type=type, norm=norm)
        assert _rel(goti, wanti) < 1e-12, ("i", type, norm)


@pytest.mark.parametrize("type", TYPES)
def test_dct_roundtrip(type):
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(24)
    for norm in NORMS:
        assert _rel(idct(dct(x, type, norm), type, norm), x) < 1e-12
        assert _rel(idst(dst(x, type, norm), type, norm), x) < 1e-12


def test_dct_f32_dtype_and_axis():
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((6, 4)).astype(np.float32)
    got = dct(x, axis=0)
    assert got.dtype == np.float32
    want = sfft.dct(x.astype(np.float64), axis=0)
    assert _rel(got, want) < 1e-5


def test_dct_validation():
    with pytest.raises(ValueError):
        dct(np.zeros(4), type=5)
    with pytest.raises(ValueError):
        dct(np.zeros(4), norm="bogus")
    with pytest.raises(ValueError):
        dct(np.zeros(1), type=1)  # DCT-I needs n >= 2
    with pytest.raises(TypeError):
        dct(np.zeros(4, np.complex64))


def test_dct_dd_lane(monkeypatch):
    """float64 on the dd (double-word f32) plans — what TPU runs."""
    import fourier_tpu.dctdst as dctmod
    from fourier_tpu.plan.planner import create_fft
    from fourier_tpu.rfft import RfftPlan

    from collections import OrderedDict

    monkeypatch.setattr(dctmod, "_RPLAN_CACHE", OrderedDict())
    monkeypatch.setattr(dctmod, "_CPLAN_CACHE", OrderedDict())
    monkeypatch.setattr(
        dctmod, "RfftPlan", lambda n, d: RfftPlan(n, d, backend="dd")
    )
    monkeypatch.setattr(
        dctmod, "create_fft", lambda n, d: create_fft(n, d, backend="dd")
    )
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal(20)
    for type in TYPES:
        assert _rel(dct(x, type), sfft.dct(x, type)) < 1e-12, type
        assert _rel(dst(x, type), sfft.dst(x, type)) < 1e-12, type


def test_dct_n1_edge():
    x = np.array([3.0])
    for type in (2, 3, 4):
        assert _rel(dct(x, type), sfft.dct(x, type)) < 1e-14
        assert _rel(idct(x, type), sfft.idct(x, type)) < 1e-14
