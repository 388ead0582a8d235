"""Autodiff through every plan family.

The pure-XLA families differentiate natively (forward and reverse mode);
the Mosaic-kernel families have no AD rules, so `transform_planar` routes
them through the linearity-based custom VJP (plan/base.py): the DFT matrix
is symmetric, so the planar-transpose of mode T is just another plan call
in the transposed mode. Gates: reverse-mode agreement between an opaque
(Pallas) plan and the Stockham oracle under identical losses, plus the
Parseval gradient identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_tpu as ft
from fourier_tpu.transform import Transform

RNG = np.random.default_rng(0xD1FF)
N = 64


def _planes(shape):
    return (
        jnp.asarray(RNG.standard_normal(shape).astype(np.float32)),
        jnp.asarray(RNG.standard_normal(shape).astype(np.float32)),
    )


def _loss_fn(plan, mode, cre, cim):
    def loss(re, im):
        ore, oim = plan.transform_planar(re, im, mode)
        return jnp.sum(ore * cre + oim * cim)

    return loss


@pytest.mark.parametrize(
    "mode",
    [Transform.FFT, Transform.IFFT, Transform.UNSCALED_IFFT,
     Transform.SQRT_SCALED_FFT, Transform.SQRT_SCALED_IFFT],
)
def test_vpu_custom_vjp_matches_stockham(mode):
    """Reverse-mode through the fused VPU kernel == through pure XLA."""
    vpu = ft.create_fft(N, np.complex64, backend="vpu", cache=False)
    oracle = ft.create_fft(N, np.complex64, backend="stockham", cache=False)
    assert vpu.ad_opaque and not oracle.ad_opaque
    re, im = _planes((2, N))
    cre, cim = _planes((2, N))
    g_vpu = jax.grad(_loss_fn(vpu, mode, cre, cim), argnums=(0, 1))(re, im)
    g_ora = jax.grad(_loss_fn(oracle, mode, cre, cim), argnums=(0, 1))(re, im)
    np.testing.assert_allclose(
        np.asarray(g_vpu[0]), np.asarray(g_ora[0]), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(g_vpu[1]), np.asarray(g_ora[1]), atol=1e-3, rtol=1e-3
    )


def test_mxu_custom_vjp_matches_stockham():
    mxu = ft.create_fft(N, np.complex64, backend="mxu", cache=False)
    oracle = ft.create_fft(N, np.complex64, backend="stockham", cache=False)
    assert mxu.ad_opaque
    re, im = _planes((2, N))
    cre, cim = _planes((2, N))
    g_m = jax.grad(_loss_fn(mxu, Transform.FFT, cre, cim), argnums=(0, 1))(
        re, im
    )
    g_o = jax.grad(_loss_fn(oracle, Transform.FFT, cre, cim), argnums=(0, 1))(
        re, im
    )
    np.testing.assert_allclose(
        np.asarray(g_m[0]), np.asarray(g_o[0]), atol=1e-3, rtol=1e-3
    )


def test_parseval_gradient_identity():
    """grad of sum|FFT(x)|^2 = 2N x; unitary mode: = 2x."""
    plan = ft.create_fft(N, np.complex64, backend="stockham", cache=False)
    re, im = _planes((N,))

    def energy(mode):
        return lambda r, i: (
            lambda o: jnp.sum(o[0] ** 2 + o[1] ** 2)
        )(plan.transform_planar(r, i, mode))

    g = jax.grad(energy(Transform.FFT), argnums=(0, 1))(re, im)
    np.testing.assert_allclose(np.asarray(g[0]), 2 * N * np.asarray(re),
                               rtol=1e-4)
    gu = jax.grad(energy(Transform.SQRT_SCALED_FFT), argnums=(0, 1))(re, im)
    np.testing.assert_allclose(np.asarray(gu[1]), 2 * np.asarray(im),
                               rtol=1e-4)


def test_native_families_support_jvp():
    """Forward-mode stays available on the non-opaque families (linearity:
    jvp of the transform IS the transform of the tangent)."""
    plan = ft.create_fft(48, np.complex64, backend="stockham", cache=False)
    re, im = _planes((48,))
    tre, tim = _planes((48,))
    out, tangent = jax.jvp(
        lambda r, i: plan.transform_planar(r, i, Transform.FFT),
        (re, im), (tre, tim),
    )
    want = plan.transform_planar(tre, tim, Transform.FFT)
    np.testing.assert_allclose(np.asarray(tangent[0]), np.asarray(want[0]),
                               atol=1e-4)


def test_grad_through_jit_and_vmap():
    plan = ft.create_fft(N, np.complex64, backend="vpu", cache=False)
    xs_re, xs_im = _planes((3, 2, N))

    @jax.jit
    def batch_loss(re, im):
        f = jax.vmap(lambda r, i: jnp.sum(
            plan.transform_planar(r, i, Transform.SQRT_SCALED_FFT)[0] ** 2
        ))
        return jnp.sum(f(re, im))

    g = jax.grad(batch_loss, argnums=(0, 1))(xs_re, xs_im)
    assert np.all(np.isfinite(np.asarray(g[0])))
    assert np.asarray(g[0]).shape == (3, 2, N)


def test_fused_bluestein_custom_vjp():
    from fourier_tpu.plan.bluestein_fused import VpuBluesteinPlan

    plan = VpuBluesteinPlan.create(97)
    oracle = ft.create_fft(97, np.complex64, backend="stockham", cache=False)
    assert plan is not None and plan.ad_opaque
    re, im = _planes((2, 97))
    cre, cim = _planes((2, 97))
    g_f = jax.grad(_loss_fn(plan, Transform.FFT, cre, cim), argnums=(0, 1))(
        re, im
    )
    g_o = jax.grad(_loss_fn(oracle, Transform.FFT, cre, cim), argnums=(0, 1))(
        re, im
    )
    np.testing.assert_allclose(
        np.asarray(g_f[0]), np.asarray(g_o[0]), atol=1e-3, rtol=1e-3
    )


def test_rfft_grad_with_fused_inner():
    """rfft/irfft gradients work when the inner c2c is a Mosaic kernel
    (RfftPlan._inner_apply routes opaque inners through the custom VJP)."""
    from fourier_tpu.rfft import RfftPlan

    fused = RfftPlan(128, backend="vpu")
    oracle = RfftPlan(128, backend="stockham")
    assert fused.inner.ad_opaque and not oracle.inner.ad_opaque
    x = jnp.asarray(RNG.standard_normal((2, 128)).astype(np.float32))
    cre = jnp.asarray(RNG.standard_normal((2, 65)).astype(np.float32))
    cim = jnp.asarray(RNG.standard_normal((2, 65)).astype(np.float32))

    def loss(plan):
        def f(v):
            re, im = plan.rfft_planar(v)
            return jnp.sum(re * cre + im * cim)

        return f

    g = jax.grad(loss(fused))(x)
    go = jax.grad(loss(oracle))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(go), atol=1e-3)

    ct = jnp.asarray(RNG.standard_normal((2, 128)).astype(np.float32))
    gi = jax.grad(
        lambda r, i: jnp.sum(fused.irfft_planar(r, i) * ct), argnums=(0, 1)
    )(cre, cim)
    goi = jax.grad(
        lambda r, i: jnp.sum(oracle.irfft_planar(r, i) * ct), argnums=(0, 1)
    )(cre, cim)
    np.testing.assert_allclose(np.asarray(gi[0]), np.asarray(goi[0]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gi[1]), np.asarray(goi[1]),
                               atol=1e-3)


def test_rfft_bm_grad_through_fused_pack_kernels():
    """Batch-minor rfft/irfft gradients when the even path runs the fused
    Pallas pack/unpack kernels (no AD rules): the linearity-based VJP
    (rfft.py:_rfft_bm_linear) must match the pure-XLA oracle.

    Transpose identities under test: J_rfft^T ct = n*irfft(ct/d) and
    J_irfft^T g = (d/n)*rfft(g), d_k = 2 - delta_{k in {0, Nyquist}}.
    """
    from fourier_tpu.plan.vpu import VpuFftPlan
    from fourier_tpu.rfft import RfftPlan

    n, B = 256, 8
    fused = RfftPlan(n, np.complex64)
    fused.inner = VpuFftPlan.create(n // 2, interpret=True)
    assert fused._fused_even_cfg() is not None
    oracle = RfftPlan(n, np.complex64, backend="stockham")
    x = jnp.asarray(RNG.standard_normal((n, B)).astype(np.float32))
    L = n // 2 + 1
    ctr = jnp.asarray(RNG.standard_normal((L, B)).astype(np.float32))
    cti = jnp.asarray(RNG.standard_normal((L, B)).astype(np.float32))

    def loss(plan):
        def f(v):
            sr, si = plan.rfft_planar_bm(v)
            return jnp.sum(sr * ctr + si * cti)

        return f

    gf = jax.grad(loss(fused))(x)
    go = jax.grad(loss(oracle))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(go),
                               atol=2e-3, rtol=2e-3)

    gt = jnp.asarray(RNG.standard_normal((n, B)).astype(np.float32))
    gi = jax.grad(
        lambda r, i: jnp.sum(fused.irfft_planar_bm(r, i) * gt),
        argnums=(0, 1),
    )(ctr, cti)
    goi = jax.grad(
        lambda r, i: jnp.sum(oracle.irfft_planar_bm(r, i) * gt),
        argnums=(0, 1),
    )(ctr, cti)
    np.testing.assert_allclose(np.asarray(gi[0]), np.asarray(goi[0]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gi[1]), np.asarray(goi[1]),
                               atol=2e-3, rtol=2e-3)
