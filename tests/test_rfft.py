"""Real-input transform tests vs numpy.fft.rfft / irfft."""

import numpy as np
import pytest

from fourier_tpu.rfft import RfftPlan, irfft, rfft, rfftfreq

RNG_SEED = 0x5EA1


@pytest.mark.parametrize("n", [2, 4, 16, 48, 64, 100, 256, 1024])
def test_rfft_even_vs_numpy(n):
    rng = np.random.default_rng(RNG_SEED + n)
    x = rng.standard_normal((3, n)).astype(np.float32)
    got = rfft(x)
    want = np.fft.rfft(x, axis=-1)
    assert got.shape == want.shape
    assert np.linalg.norm(got - want) < 1e-5 * np.linalg.norm(want)


@pytest.mark.parametrize("n", [1, 3, 7, 15, 81, 243])
def test_rfft_odd_vs_numpy(n):
    rng = np.random.default_rng(RNG_SEED + n)
    x = rng.standard_normal(n).astype(np.float32)
    got = rfft(x)
    want = np.fft.rfft(x)
    assert got.shape == want.shape
    assert np.linalg.norm(got - want) < 1e-5 * max(np.linalg.norm(want), 1.0)


@pytest.mark.parametrize("n", [7, 15, 81, 101, 243])
@pytest.mark.parametrize("batch", [2, 5, (2, 3), (3, 1)])
def test_rfft_odd_two_for_one_batched(n, batch):
    """Odd n, batch >= 2: the two-for-one packed path (incl. odd-batch
    remainder rows and multi-dim leading shapes) matches numpy."""
    rng = np.random.default_rng(RNG_SEED + n)
    shape = (batch if isinstance(batch, tuple) else (batch,)) + (n,)
    x = rng.standard_normal(shape).astype(np.float32)
    got = rfft(x)
    want = np.fft.rfft(x, axis=-1)
    assert got.shape == want.shape
    assert np.linalg.norm(got - want) < 1e-5 * np.linalg.norm(want)
    back = irfft(got, n=n)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_rfft_odd_two_for_one_dd():
    """dd (c128) twin of the packed odd path: 1e-12 gate, batch 2/5."""
    n = 101
    rng = np.random.default_rng(RNG_SEED)
    for batch in (2, 5):
        x = rng.standard_normal((batch, n))
        got = rfft(x, dtype=np.complex128)
        want = np.fft.rfft(x, axis=-1)
        assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)
        back = irfft(got, n=n, dtype=np.complex128)
        np.testing.assert_allclose(back, x, atol=1e-12)


@pytest.mark.parametrize("n", [4, 16, 100, 7, 15])
def test_irfft_roundtrip(n):
    rng = np.random.default_rng(RNG_SEED + n)
    x = rng.standard_normal((2, n)).astype(np.float32)
    back = irfft(rfft(x), n=n)
    assert back.shape == x.shape
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_irfft_vs_numpy():
    rng = np.random.default_rng(RNG_SEED)
    spec = (
        rng.standard_normal((2, 33)) + 1j * rng.standard_normal((2, 33))
    ).astype(np.complex64)
    got = irfft(spec)  # n = 64
    want = np.fft.irfft(spec, axis=-1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rfft_c128_x64():
    rng = np.random.default_rng(RNG_SEED)
    n = 96
    x = rng.standard_normal(n)
    plan = RfftPlan(n, np.complex128)
    got = plan.rfft(x)
    want = np.fft.rfft(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)
    back = plan.irfft(got)
    np.testing.assert_allclose(back, x, atol=1e-12)


@pytest.mark.parametrize("n", [8, 64, 96, 100, 7, 33])
def test_rfft_c128_dd(n):
    """The dd (double-word) c128 path: what TPU / non-x64 backends run."""
    rng = np.random.default_rng(RNG_SEED + n)
    plan = RfftPlan(n, np.complex128, backend="dd")
    assert plan.dd
    x = rng.standard_normal((2, n))
    got = plan.rfft(x)
    want = np.fft.rfft(x, axis=-1)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)
    back = plan.irfft(got)
    np.testing.assert_allclose(back, x, atol=1e-12)


def test_rfft_dd_planar_api_guards():
    plan = RfftPlan(16, np.complex128, backend="dd")
    with pytest.raises(TypeError):
        plan.rfft_planar(np.zeros(16, np.float32))
    with pytest.raises(TypeError):
        plan.irfft_planar(np.zeros(9, np.float32), np.zeros(9, np.float32))
    with pytest.raises(ValueError):
        plan.rfft_planar_dd(np.zeros(15, np.float32), np.zeros(15, np.float32))


def test_rfft_dd_planar_jit():
    import jax
    import jax.numpy as jnp

    from fourier_tpu.precision import ddreal as dd

    rng = np.random.default_rng(RNG_SEED)
    n = 64
    plan = RfftPlan(n, np.complex128, backend="dd")
    x = rng.standard_normal((4, n))
    xh, xl = dd.from_f64(x)

    @jax.jit
    def run(p, h, l):
        return p.rfft_planar_dd(h, l)

    rh, rl, ih, il = run(plan, jnp.asarray(xh), jnp.asarray(xl))
    f64 = lambda p: np.asarray(p, np.float64)
    got = (f64(rh) + f64(rl)) + 1j * (f64(ih) + f64(il))
    want = np.fft.rfft(x, axis=-1)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)


def test_rfft_planar_jit_and_pytree():
    import jax

    rng = np.random.default_rng(RNG_SEED)
    n = 64
    plan = RfftPlan(n)
    x = rng.standard_normal((4, n)).astype(np.float32)

    @jax.jit
    def run(p, a):
        return p.rfft_planar(a)

    re, im = run(plan, x)
    want = np.fft.rfft(x, axis=-1)
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.linalg.norm(got - want) < 1e-5 * np.linalg.norm(want)


def test_rfftn_vs_numpy():
    from fourier_tpu.rfft import irfft2, irfftn, rfft2, rfftn

    rng = np.random.default_rng(RNG_SEED)
    rel = lambda g, w: np.linalg.norm(np.asarray(g) - w) / np.linalg.norm(w)
    x = rng.standard_normal((5, 12, 16)).astype(np.float32)
    assert rel(rfft2(x), np.fft.rfft2(x)) < 1e-5
    assert rel(rfftn(x), np.fft.rfftn(x)) < 1e-5
    assert rel(rfftn(x, 2), np.fft.rfftn(x, axes=(-2, -1))) < 1e-5
    y = np.fft.rfftn(x.astype(np.float64)).astype(np.complex64)
    assert rel(irfftn(y), np.fft.irfftn(y)) < 1e-4
    assert irfftn(y, shape=(5, 12, 16)).shape == (5, 12, 16)
    # odd last axis needs the explicit shape
    xo = rng.standard_normal((4, 9))
    yo = np.fft.rfft2(xo)
    assert rel(
        irfft2(yo.astype(np.complex64), shape=(4, 9)),
        np.fft.irfft2(yo, s=(4, 9)),
    ) < 1e-4


def test_rfftn_c128():
    from fourier_tpu.rfft import irfftn, rfftn

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((6, 8))
    got = rfftn(x, dtype=np.complex128)
    want = np.fft.rfftn(x)
    assert np.linalg.norm(got - want) < 1e-12 * np.linalg.norm(want)
    back = irfftn(got, shape=(6, 8), dtype=np.complex128)
    np.testing.assert_allclose(back, x, atol=1e-12)


def test_hfft_ihfft_vs_numpy():
    from fourier_tpu.rfft import hfft, ihfft

    rng = np.random.default_rng(RNG_SEED)
    rel = lambda g, w: np.linalg.norm(np.asarray(g) - w) / np.linalg.norm(w)
    a = (
        rng.standard_normal((2, 17)) + 1j * rng.standard_normal((2, 17))
    ).astype(np.complex64)
    assert rel(hfft(a), np.fft.hfft(a)) < 1e-4
    assert hfft(a, n=33).shape == (2, 33)
    x = rng.standard_normal((2, 32)).astype(np.float32)
    assert rel(ihfft(x), np.fft.ihfft(x)) < 1e-5
    # roundtrip on a consistent (truly Hermitian-derived) spectrum: the
    # imaginary parts of the DC/Nyquist bins of a random input are not
    # representable and are dropped, exactly as numpy.fft does.
    spec = ihfft(x)
    assert rel(hfft(spec), x) < 1e-4
    with pytest.raises(ValueError):
        hfft(a, n=100)


def test_rfftn_hfft_norms():
    from fourier_tpu.rfft import hfft, ihfft, irfftn, rfftn

    rng = np.random.default_rng(RNG_SEED)
    rel = lambda g, w: np.linalg.norm(np.asarray(g) - w) / max(
        np.linalg.norm(w), 1e-30
    )
    x = rng.standard_normal((4, 6, 8)).astype(np.float32)
    a = (
        rng.standard_normal((2, 17)) + 1j * rng.standard_normal((2, 17))
    ).astype(np.complex64)
    xr = rng.standard_normal((2, 32)).astype(np.float32)
    for norm in (None, "ortho", "forward"):
        assert rel(rfftn(x, norm=norm), np.fft.rfftn(x, norm=norm)) < 1e-5
        y = np.fft.rfftn(x).astype(np.complex64)
        assert rel(
            irfftn(y, shape=(4, 6, 8), norm=norm),
            np.fft.irfftn(y, s=(4, 6, 8), axes=(0, 1, 2), norm=norm),
        ) < 1e-4
        assert rel(hfft(a, norm=norm), np.fft.hfft(a, norm=norm)) < 1e-4
        assert rel(ihfft(xr, norm=norm), np.fft.ihfft(xr, norm=norm)) < 1e-5


def test_rfftn_validation():
    from fourier_tpu.rfft import irfftn, rfftn

    with pytest.raises(ValueError):
        rfftn(np.zeros((2, 3), np.float32), ndim=3)
    with pytest.raises(ValueError):
        irfftn(np.zeros((2, 5), np.complex64), shape=(3, 8))


@pytest.mark.parametrize(
    "kwargs", [{}, {"dtype": np.complex128, "backend": "dd"}]
)
def test_rfft_serialize_roundtrip(tmp_path, kwargs):
    from fourier_tpu.plan.serialize import load_plan, save_plan

    rng = np.random.default_rng(RNG_SEED)
    plan = RfftPlan(64, **kwargs)
    path = str(tmp_path / "rfft.npz")
    save_plan(plan, path)
    loaded = load_plan(path)
    assert isinstance(loaded, RfftPlan)
    assert (loaded.n, loaded.dtype, loaded.dd) == (plan.n, plan.dtype, plan.dd)
    rt = np.float64 if plan.dd else np.float32
    x = rng.standard_normal((2, 64)).astype(rt)
    np.testing.assert_array_equal(plan.rfft(x), loaded.rfft(x))


def test_rfftfreq():
    for n in (8, 9, 16):
        np.testing.assert_allclose(rfftfreq(n, d=0.25), np.fft.rfftfreq(n, d=0.25))


def test_rfft_validation():
    plan = RfftPlan(16)
    with pytest.raises(ValueError):
        plan.rfft_planar(np.zeros((2, 17), np.float32))
    with pytest.raises(ValueError):
        plan.irfft_planar(np.zeros(8, np.float32), np.zeros(8, np.float32))
    with pytest.raises(ValueError):
        RfftPlan(0)
    with pytest.raises(ValueError):
        irfft(np.zeros(9, np.complex64), n=14)


def test_hfftn_ihfftn_vs_scipy():
    import scipy.fft as sfft
    from fourier_tpu.rfft import hfft2, hfftn, ihfft2, ihfftn

    rng = np.random.default_rng(RNG_SEED)
    rel = lambda g, w: np.linalg.norm(np.asarray(g) - w) / np.linalg.norm(w)
    a = (
        rng.standard_normal((4, 6, 9)) + 1j * rng.standard_normal((4, 6, 9))
    ).astype(np.complex64)
    x = rng.standard_normal((4, 6, 16)).astype(np.float32)
    for norm in (None, "ortho", "forward"):
        assert rel(hfftn(a, norm=norm), sfft.hfftn(a, norm=norm)) < 1e-4
        assert rel(ihfftn(x, norm=norm), sfft.ihfftn(x, norm=norm)) < 1e-5
    # explicit odd output shape + trailing-axes (ndim) selection
    assert rel(
        hfftn(a, shape=(4, 6, 17)), sfft.hfftn(a, s=(4, 6, 17))
    ) < 1e-4
    assert rel(
        hfftn(a, ndim=2), sfft.hfftn(a, axes=(-2, -1))
    ) < 1e-4
    assert rel(
        ihfftn(x, ndim=2), sfft.ihfftn(x, axes=(-2, -1))
    ) < 1e-5
    # 2-D wrappers
    assert rel(hfft2(a[0]), sfft.hfft2(a[0])) < 1e-4
    assert rel(ihfft2(x[0]), sfft.ihfft2(x[0])) < 1e-5
    with pytest.raises(ValueError):
        hfft2(a[0], shape=(4, 6, 8))


def test_hfftn_roundtrip_and_dtype_inference():
    from fourier_tpu.rfft import hfftn, ihfftn, rfft2, rfftn

    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((3, 5, 8))  # f64 -> dd (complex128) path
    spec = ihfftn(x)
    assert np.asarray(spec).dtype == np.complex128
    back = hfftn(spec, shape=x.shape)
    assert np.linalg.norm(np.asarray(back) - x) < 1e-12 * np.linalg.norm(x)
    # f64 input infers the complex128 path across the N-D real family too
    assert np.asarray(rfftn(x)).dtype == np.complex128
    assert np.asarray(rfft2(x.astype(np.float32))).dtype == np.complex64


# -- batch-minor (n, B) path --------------------------------------------------


@pytest.mark.parametrize("n", [4, 16, 64, 256, 1024])
@pytest.mark.parametrize("b", [1, 3, 8])
def test_rfft_bm_even_vs_numpy(n, b):
    """Batch-minor even path matches numpy over (n, B) planes."""
    rng = np.random.default_rng(RNG_SEED + n + b)
    x = rng.standard_normal((b, n)).astype(np.float32)
    plan = RfftPlan(n, np.complex64)
    re, im = plan.rfft_planar_bm(x.T)
    got = (np.asarray(re) + 1j * np.asarray(im)).T
    want = np.fft.rfft(x, axis=-1)
    assert got.shape == want.shape
    assert np.linalg.norm(got - want) < 1e-5 * np.linalg.norm(want)
    back = np.asarray(plan.irfft_planar_bm(re, im)).T
    np.testing.assert_allclose(back, x, atol=1e-4)


@pytest.mark.parametrize("n", [7, 15, 101, 1013])
@pytest.mark.parametrize("b", [1, 2, 5, 8])
def test_rfft_bm_odd_vs_numpy(n, b):
    """Batch-minor odd two-for-one (incl. odd-batch remainder, batch 1)."""
    rng = np.random.default_rng(RNG_SEED + n + b)
    x = rng.standard_normal((b, n)).astype(np.float32)
    plan = RfftPlan(n, np.complex64)
    re, im = plan.rfft_planar_bm(x.T)
    got = (np.asarray(re) + 1j * np.asarray(im)).T
    want = np.fft.rfft(x, axis=-1)
    assert got.shape == want.shape
    assert np.linalg.norm(got - want) < 1e-5 * np.linalg.norm(want)
    back = np.asarray(plan.irfft_planar_bm(re, im)).T
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_rfft_bm_validation():
    plan = RfftPlan(16, np.complex64)
    with pytest.raises(ValueError):
        plan.rfft_planar_bm(np.zeros((8, 4), np.float32))  # wrong n
    with pytest.raises(ValueError):
        plan.rfft_planar_bm(np.zeros(16, np.float32))  # not 2-D
    with pytest.raises(ValueError):
        plan.irfft_planar_bm(
            np.zeros((16, 4), np.float32), np.zeros((16, 4), np.float32)
        )  # spectrum axis must be n//2+1
    dd_plan = RfftPlan(16, np.complex128)
    if dd_plan.dd:
        with pytest.raises(TypeError):
            dd_plan.rfft_planar_bm(np.zeros((16, 4), np.float32))


def test_rfft_bm_jit_chain():
    """The bm roundtrip chains under jit/scan (the bench harness shape)."""
    import jax

    n, b = 64, 4
    plan = RfftPlan(n, np.complex64)
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((n, b)).astype(np.float32)

    @jax.jit
    def step(x):
        def body(carry, _):
            re, im = plan.rfft_planar_bm(carry)
            return plan.irfft_planar_bm(re, im), None

        out, _ = jax.lax.scan(body, x, None, length=3)
        return out

    out = np.asarray(step(x))
    np.testing.assert_allclose(out, x, atol=1e-4)


@pytest.mark.parametrize("dma_eo", [False, True])
def test_rfft_fused_kernels_both_eo_strategies(dma_eo):
    """Both even/odd split strategies of the fused pack kernels agree with
    numpy: in-VMEM shuffles (small m) and DMA-addressed row-pair-view blocks
    (m >= _RFFT_DMA_EO_MIN_M in production, forced here via ``dma_eo``)."""
    import jax.numpy as jnp

    from fourier_tpu.ops.pallas import stockham_vpu as sv

    m, b = 64, 256
    n = 2 * m
    rng = np.random.default_rng(RNG_SEED)
    x = rng.standard_normal((n, b)).astype(np.float32)
    fwd = sv.make_stage_tables(m, True)
    inv = sv.make_stage_tables(m, False)
    k = np.arange(m)
    wc = np.exp(-2j * np.pi * k / n)
    w = (
        jnp.asarray(wc.real.astype(np.float32)).reshape(m, 1),
        jnp.asarray(wc.imag.astype(np.float32)).reshape(m, 1),
    )
    xr, xi = sv.vpu_rfft_pack_batch_minor(
        jnp.asarray(x), m, fwd, w, interpret=True, dma_eo=dma_eo
    )
    got = np.asarray(xr) + 1j * np.asarray(xi)
    want = np.fft.rfft(x, axis=0)
    assert np.linalg.norm(got - want) < 1e-5 * np.linalg.norm(want)
    back = sv.vpu_irfft_unpack_batch_minor(
        xr, xi, m, inv, w, interpret=True, dma_eo=dma_eo
    )
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)
