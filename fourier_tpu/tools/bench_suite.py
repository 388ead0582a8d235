"""Comparative benchmark harness: fourier-tpu vs numpy.fft / scipy.fft / FFTW.

The fourier-bench analog (``fourier-bench/benches/fft_bench.rs``): the same
five size families — pow2 {256,512,1024}, pow3 {243,729,2187}, pow5
{125,625,3125}, composite {222,722,1418}, prime {191,439,1013} — across the
reference's full matrix {c64, c128} x {fft, ifft} (``fft_bench.rs:141-159``),
benchmarking this framework's TPU path against host baselines, reporting wall
time per batched transform and GFLOP/s (5*N*log2(N) convention).

Baselines: numpy.fft and scipy.fft (pocketfft — the same split-radix family
as FFTW and its performance proxy). The reference also benches FFTW proper
(``fft_bench.rs:49-70``); **pyfftw is not installed in this image** (no
network installs), so the `fftw` column reports per-row when the module is
importable and the correctness gate is taken against scipy explicitly.

Methodology (matches bench.py, per the round-1 review): iterations are
DEPENDENT — each jitted step runs CHAIN transforms via ``lax.scan`` with the
output feeding the next input (unitary sqrt-scaled modes keep magnitudes
bounded), so no dispatch can be elided or dishonestly overlapped; the
steady-state per-transform rate is what a sustained spectral pipeline sees.
Batch follows BASELINE.json config 4: 65536 lanes at n<=1024, scaled down
inversely above to hold the per-step footprint constant. c128 rows run the
double-word (dd) path on TPU — each nominal flop costs ~10 hardware f32
flops, so dd GFLOP/s are reported in the same nominal convention (the
apples-to-apples number vs a native-f64 host).

Every row also records ``rel_l2`` — single-application relative L2 error vs
scipy on the same inputs (the correctness gate riding along with the timing).

Run:  python -m fourier_tpu.tools.bench_suite [--json out.json]
      [--family pow2 ...] [--max-sizes K] [--dtype c64|c128] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, List, Optional

import numpy as np

SIZE_FAMILIES = {
    "pow2": [256, 512, 1024],
    "pow3": [243, 729, 2187],
    "pow5": [125, 625, 3125],
    "composite": [222, 722, 1418],
    "prime": [191, 439, 1013],
    # Above the fused kernel's VMEM cap: FourStepLocalPlan with fused legs
    # (batch-minor native), matching the reference's size-unbounded planner
    # contract (fourier/src/lib.rs:31-43). c64 only — dd at these sizes
    # composes through the XLA dd path and would dominate suite wall-clock.
    "large": [65536, 262144],
}

#: families measured at c64 only (see the `large` comment above).
C64_ONLY_FAMILIES = {"large"}

#: real-input rows (round-4 addition, VERDICT item 5): rfft+irfft ROUNDTRIP
#: per row — the roundtrip is shape-preserving so iterations chain honestly,
#: and it exercises both the forward split/pack and the inverse rebuild.
#: 1024 = even split path (one c2c of n/2), 1013 = odd two-for-one packing
#: (two real rows per c2c), 4096 = flagship even size. f32 real / c64
#: spectra only: the dd twins share the identical pack/unpack structure and
#: their cost is already pinned by the c128 complex rows.
RFFT_SIZES = [1024, 1013, 4096]

CHAIN = 128
CHAIN_DD = 16  # dd transforms are ~10x the work; keep steps bounded
ITERS = 3
HOST_ITERS = 5


def _plan_repr(n: int, dtype) -> str:
    """repr of the plan the row will execute (cached; audits the routing)."""
    import fourier_tpu as ft

    try:
        return repr(ft.create_fft(n, dtype))
    except Exception as e:  # pragma: no cover
        return f"<plan error: {e}>"


def _gflops(n: int, batch: int, seconds: float) -> float:
    return 5.0 * n * np.log2(max(n, 2)) * batch / seconds / 1e9


def default_batch(n: int, base: int = 65536) -> int:
    """BASELINE config-4 batch at n<=1024; constant footprint above."""
    if n <= 1024:
        return base
    b = base * 1024 // n
    floor = 256 if n > 16384 else 1024  # large-n planes must also fit HBM
    return max(floor, 1 << int(np.log2(max(b, 1))))


def _sync(out):
    """Force completion via a 4-byte element fetch.

    On this relay, block_until_ready has been observed to return before some
    chained programs finish (round-3 finding), while a full np.asarray fetch
    drags the whole array through the slow tunnel; fetching one element is
    the honest sync.
    """
    import jax

    first = jax.tree_util.tree_leaves(out)[0]
    float(first[(0,) * first.ndim])


def _time_steps(step, args, chain: int, iters: int):
    """Median steady-state seconds per transform over 3 dependent rounds."""
    out = step(*args)
    _sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        cur = out
        for _ in range(iters):
            cur = step(*cur)
        _sync(cur)
        times.append((time.perf_counter() - t0) / (iters * chain))
        out = cur
    return sorted(times)[1]


def bench_fourier_tpu(n: int, batch: int, forward: bool) -> float:
    """Seconds per batched c64 transform on the default backend."""
    import jax

    import fourier_tpu as ft
    from fourier_tpu.transform import Transform

    plan = ft.create_fft(n, np.complex64)
    mode = Transform.SQRT_SCALED_FFT if forward else Transform.SQRT_SCALED_IFFT
    batch_minor = hasattr(plan, "transform_planar_bm")

    if batch_minor:
        apply_fn = lambda re, im: plan.transform_planar_bm(re, im, mode)
        shape = (n, batch)
    else:
        apply_fn = lambda re, im: plan._apply(re, im, mode)
        shape = (batch, n)

    @jax.jit
    def step(re, im):
        def body(carry, _):
            r, i = carry
            return apply_fn(r, i), None

        (re, im), _ = jax.lax.scan(body, (re, im), None, length=CHAIN)
        return re, im

    rng = np.random.default_rng(0)
    re = jax.numpy.asarray(rng.standard_normal(shape).astype(np.float32))
    im = jax.numpy.asarray(rng.standard_normal(shape).astype(np.float32))
    return _time_steps(step, (re, im), CHAIN, ITERS)


def bench_fourier_tpu_dd(n: int, batch: int, forward: bool) -> float:
    """Seconds per batched c128 transform (double-word path on TPU)."""
    import jax

    import fourier_tpu as ft
    from fourier_tpu.transform import Transform

    plan = ft.create_fft(n, np.complex128)
    mode = Transform.SQRT_SCALED_FFT if forward else Transform.SQRT_SCALED_IFFT

    batch_minor = hasattr(plan, "transform_planar_dd_bm")
    if batch_minor:
        # Transpose-free chain, same treatment as the c64 rows: the carry
        # stays in the kernels' native (n, B) layout across the whole scan.
        apply_fn = lambda *p: plan.transform_planar_dd_bm(*p, mode)
        unpack = lambda v: v
    elif hasattr(plan, "_apply_dd"):
        apply_fn = lambda *p: plan._apply_dd(((p[0], p[1]), (p[2], p[3])), mode)
        unpack = lambda v: (v[0][0], v[0][1], v[1][0], v[1][1])
    else:  # native-f64 host path (x64 CPU): planes are (re, im, 0, 0)
        apply_fn = lambda *p: plan._apply(p[0], p[2], mode)
        unpack = None

    @jax.jit
    def step(rh, rl, ih, il):
        def body(carry, _):
            if unpack is not None:
                return unpack(apply_fn(*carry)), None
            re, im = apply_fn(*carry)
            return (re, carry[1], im, carry[3]), None

        carry, _ = jax.lax.scan(body, (rh, rl, ih, il), None, length=CHAIN_DD)
        return carry

    rng = np.random.default_rng(0)
    shape = (n, batch) if batch_minor else (batch, n)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    if unpack is not None:
        from fourier_tpu.precision import ddreal as dd

        rh, rl = dd.from_f64(x.real)
        ih, il = dd.from_f64(x.imag)
        planes = tuple(
            jax.numpy.asarray(p) for p in (rh, rl, ih, il)
        )
    else:
        z = np.zeros_like(x.real)
        planes = tuple(
            jax.numpy.asarray(p) for p in (x.real, z, x.imag, z)
        )
    return _time_steps(step, planes, CHAIN_DD, ITERS)


def _rfft_plan_repr(n: int) -> str:
    from fourier_tpu.rfft import RfftPlan

    try:
        plan = RfftPlan(n, np.complex64)
        return f"{plan!r} inner={plan.inner!r}"
    except Exception as e:  # pragma: no cover
        return f"<plan error: {e}>"


def bench_fourier_tpu_rfft(n: int, batch: int) -> float:
    """Seconds per batched real-input ROUNDTRIP (rfft + irfft) on device.

    Batch-minor (n, B) layout — the transpose-free native path
    (``RfftPlan.rfft_planar_bm``); batch-major callers pay one transpose at
    each pipeline boundary, not per transform.
    """
    import jax

    from fourier_tpu.rfft import RfftPlan

    plan = RfftPlan(n, np.complex64)

    @jax.jit
    def step(x):
        def body(carry, _):
            re, im = plan.rfft_planar_bm(carry)
            return plan.irfft_planar_bm(re, im), None

        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return (out,)  # tuple: _time_steps re-splats the carry into step(*cur)

    rng = np.random.default_rng(0)
    x = jax.numpy.asarray(
        rng.standard_normal((n, batch)).astype(np.float32)
    )
    return _time_steps(step, (x,), CHAIN, ITERS)


def bench_host_rfft(module, n: int, batch: int) -> float:
    """Host rfft+irfft roundtrip (numpy.fft or scipy.fft namespace)."""
    nb = min(batch, _HOST_ROW_CAP)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n)).astype(np.float32)
    fn = lambda a: module.irfft(module.rfft(a, axis=-1), n=n, axis=-1)
    return _host_bench(fn, x) * (batch / nb)


def accuracy_rel_l2_rfft(n: int) -> float:
    """Roundtrip rel-L2 of rfft->irfft vs the input (the identity gate)."""
    from fourier_tpu.rfft import RfftPlan

    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, n)).astype(np.float32)
    plan = RfftPlan(n, np.complex64)
    got = np.asarray(plan.irfft(plan.rfft(x)))
    return float(np.linalg.norm(got - x) / np.linalg.norm(x))


def _host_bench(fn, x, iters: int = HOST_ITERS) -> float:
    fn(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(x)
    return (time.perf_counter() - t0) / iters


_HOST_ROW_CAP = 8192  # single-threaded host rate is batch-independent past ~1k


def bench_numpy(n: int, batch: int, forward: bool, dtype) -> float:
    nb = min(batch, _HOST_ROW_CAP)
    rng = np.random.default_rng(0)
    x = (
        rng.standard_normal((nb, n)) + 1j * rng.standard_normal((nb, n))
    ).astype(dtype)
    fn = np.fft.fft if forward else np.fft.ifft
    return _host_bench(lambda a: fn(a, axis=-1), x) * (batch / nb)


def bench_scipy(n: int, batch: int, forward: bool, dtype) -> float:
    try:
        import scipy.fft as sfft
    except ImportError:  # pragma: no cover
        return float("nan")
    nb = min(batch, _HOST_ROW_CAP)
    rng = np.random.default_rng(0)
    x = (
        rng.standard_normal((nb, n)) + 1j * rng.standard_normal((nb, n))
    ).astype(dtype)
    fn = sfft.fft if forward else sfft.ifft
    return _host_bench(lambda a: fn(a, axis=-1), x) * (batch / nb)


def bench_fftw(n: int, batch: int, forward: bool, dtype) -> Optional[float]:
    """FFTW via pyfftw when importable; None when absent (this image)."""
    try:
        import pyfftw  # noqa: F401
    except ImportError:
        return None
    import pyfftw.interfaces.numpy_fft as fftw

    rng = np.random.default_rng(0)
    x = (
        rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    ).astype(dtype)
    fn = fftw.fft if forward else fftw.ifft
    return _host_bench(lambda a: fn(a, axis=-1), x)


def bench_native(n: int, batch: int, forward: bool, dtype) -> Optional[float]:
    """The repo's own native C++ core (ctypes) as the third comparator.

    The reference's bench philosophy is a three-way comparison (Fourier vs
    RustFFT vs FFTW, ``fft_bench.rs:26-70``); FFTW is uninstallable here, so
    the third implementation is the framework's native host core
    (``ffi/src/fft_core.cpp``), driven through the batched C ABI entry so one
    FFI crossing covers the whole batch. Rows are capped at 2048 (the
    per-transform rate is batch-independent for a single-threaded host loop);
    the returned time is scaled to the row's nominal batch. None when the
    native library can't be built (no toolchain).
    """
    try:
        from fourier_tpu.ffi import NativeFftPlan

        plan = NativeFftPlan(n, dtype)
    except Exception:
        return None
    nb = min(batch, 2048)
    rng = np.random.default_rng(0)
    x = np.ascontiguousarray(
        (rng.standard_normal((nb, n)) + 1j * rng.standard_normal((nb, n)))
        .astype(dtype)
    )
    code = 0 if forward else 1
    plan.transform_batch_in_place(x, code)  # warmup
    t0 = time.perf_counter()
    for _ in range(HOST_ITERS):
        plan.transform_batch_in_place(x, code)
    dt = (time.perf_counter() - t0) / HOST_ITERS
    return dt * (batch / nb)


def accuracy_rel_l2(n: int, forward: bool, dtype) -> float:
    """Single-application rel-L2 of this framework vs scipy (the gate)."""
    import scipy.fft as sfft

    import fourier_tpu as ft
    from fourier_tpu.transform import Transform

    rng = np.random.default_rng(1)
    x = (
        rng.standard_normal((64, n)) + 1j * rng.standard_normal((64, n))
    ).astype(dtype)
    plan = ft.create_fft(n, dtype)
    mode = Transform.FFT if forward else Transform.IFFT
    if hasattr(plan, "transform"):
        got = np.asarray(plan.transform(x, mode))
    else:  # pragma: no cover
        raise TypeError(f"plan {plan!r} lacks a complex API")
    want = (sfft.fft if forward else sfft.ifft)(
        x.astype(np.complex128), axis=-1
    )
    return float(
        np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    )


def run(
    batch: Optional[int] = None,
    families=None,
    max_sizes: int = 0,
    dtypes=("c64", "c128"),
    json_path: Optional[str] = None,
) -> List[Dict]:
    """Run the suite; with `json_path`, results are flushed after EVERY row
    (a multi-hour run killed early still leaves a usable file)."""
    rows = []
    for family, sizes in SIZE_FAMILIES.items():
        if families and family not in families:
            continue
        if max_sizes:
            sizes = sizes[:max_sizes]
        for n in sizes:
            for dkey in dtypes:
                if family in C64_ONLY_FAMILIES and dkey != "c64":
                    continue
                dtype = np.complex64 if dkey == "c64" else np.complex128
                b = batch or default_batch(n)
                # c128 rows run the SAME batch as c64: dd is ~10x work/bytes
                # per lane, but fixed per-call and per-iteration costs
                # dominate small-n rows at reduced batches (measured round 3:
                # dd n=256 at 123 GF with b/8, 199 at b/2, 244 at full b) and
                # the 4-plane footprint still fits HBM at every suite size.
                for forward in (True, False):
                    row = {
                        "family": family,
                        "n": n,
                        "dtype": dkey,
                        "direction": "fft" if forward else "ifft",
                        "batch": b,
                        "chain": CHAIN if dkey == "c64" else CHAIN_DD,
                        "plan": _plan_repr(n, dtype),
                    }
                    ours = (
                        bench_fourier_tpu
                        if dkey == "c64"
                        else bench_fourier_tpu_dd
                    )
                    for name, fn in (
                        ("fourier_tpu", lambda: ours(n, b, forward)),
                        ("numpy", lambda: bench_numpy(n, b, forward, dtype)),
                        ("scipy", lambda: bench_scipy(n, b, forward, dtype)),
                        ("native", lambda: bench_native(n, b, forward, dtype)),
                        ("fftw", lambda: bench_fftw(n, b, forward, dtype)),
                    ):
                        try:
                            dt = fn()
                            if dt is None:
                                row[f"{name}_note"] = (
                                    "pyfftw not installed"
                                    if name == "fftw"
                                    else "native library unavailable"
                                )
                                continue
                            row[f"{name}_us"] = round(dt * 1e6, 1)
                            row[f"{name}_gflops"] = round(
                                _gflops(n, b, dt), 1
                            )
                        except Exception as e:  # pragma: no cover
                            row[f"{name}_error"] = str(e)[:150]
                    try:
                        row["rel_l2"] = accuracy_rel_l2(n, forward, dtype)
                    except Exception as e:  # pragma: no cover
                        row["rel_l2_error"] = str(e)[:150]
                    rows.append(row)
                    if json_path:
                        with open(json_path, "w") as f:
                            json.dump(rows, f, indent=1)
                    print(
                        f"{family:10s} n={n:5d} {dkey} {row['direction']:4s} "
                        f"tpu={row.get('fourier_tpu_gflops', '?'):>8} GF  "
                        f"numpy={row.get('numpy_gflops', '?'):>7} GF  "
                        f"scipy={row.get('scipy_gflops', '?'):>7} GF  "
                        f"native={row.get('native_gflops', '?'):>6} GF  "
                        f"rel_l2={row.get('rel_l2', float('nan')):.2e}",
                        flush=True,
                    )
    if not families or "rfft" in families:
        import scipy.fft as _sfft

        for n in RFFT_SIZES:
            b = batch or default_batch(n)
            # Roundtrip nominal flops: 2 directions x half the c2c count.
            rt_gflops = lambda dt: round(
                2 * 2.5 * n * np.log2(n) * b / dt / 1e9, 1
            )
            row = {
                "family": "rfft",
                "n": n,
                "dtype": "f32/c64",
                "direction": "roundtrip",
                "batch": b,
                "chain": CHAIN,
                "plan": _rfft_plan_repr(n),
            }
            for name, fn in (
                ("fourier_tpu", lambda: bench_fourier_tpu_rfft(n, b)),
                ("numpy", lambda: bench_host_rfft(np.fft, n, b)),
                ("scipy", lambda: bench_host_rfft(_sfft, n, b)),
            ):
                try:
                    dt = fn()
                    row[f"{name}_us"] = round(dt * 1e6, 1)
                    row[f"{name}_gflops"] = rt_gflops(dt)
                except Exception as e:  # pragma: no cover
                    row[f"{name}_error"] = str(e)[:150]
            try:
                row["rel_l2"] = accuracy_rel_l2_rfft(n)
            except Exception as e:  # pragma: no cover
                row["rel_l2_error"] = str(e)[:150]
            rows.append(row)
            if json_path:
                with open(json_path, "w") as f:
                    json.dump(rows, f, indent=1)
            print(
                f"{'rfft':10s} n={n:5d} f32  rtrip "
                f"tpu={row.get('fourier_tpu_gflops', '?'):>8} GF  "
                f"numpy={row.get('numpy_gflops', '?'):>7} GF  "
                f"scipy={row.get('scipy_gflops', '?'):>7} GF  "
                f"rel_l2={row.get('rel_l2', float('nan')):.2e}",
                flush=True,
            )
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", help="write results to this JSON file")
    ap.add_argument("--batch", type=int, default=0,
                    help="override batch (0 = BASELINE config-4 scaling)")
    ap.add_argument("--family", action="append", help="limit to these families")
    ap.add_argument("--max-sizes", type=int, default=0,
                    help="limit sizes per family (0 = all)")
    ap.add_argument("--dtype", action="append", choices=["c64", "c128"],
                    help="limit dtypes (default both)")
    args = ap.parse_args()
    rows = run(
        args.batch or None,
        families=args.family,
        max_sizes=args.max_sizes,
        dtypes=tuple(args.dtype) if args.dtype else ("c64", "c128"),
        json_path=args.json,
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
