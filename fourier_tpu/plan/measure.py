"""Measured planning + wisdom: plan-time autotuning over plan families.

The static planner (:func:`fourier_tpu.create_fft`) picks a plan family by
rules that were measured once on this chip (``planner.py``).
``backend="measure"`` instead times every candidate family for the exact
``(size, dtype)`` on the *current* backend — chained dependent iterations
inside one jit plus a one-element-fetch sync, the measurement-integrity
methodology from ``docs/DESIGN.md`` — and remembers the winner in a
process-global **wisdom** table. Wisdom round-trips to JSON
(:func:`export_wisdom` / :func:`import_wisdom`), so a deployment can tune
once on its hardware and ship the table; subsequent ``backend="measure"``
plans are created without re-timing.

Reference parity: the reference's runtime planner is static
(``fourier/src/lib.rs:31-60``); measured planning is beyond-reference
surface whose closest cousin is FFTW's ``FFTW_MEASURE`` mode + wisdom
files. Like FFTW wisdom, measurements are shape-sensitive: the winner is
recorded for the batch it was timed at (stored in the entry), and a
deployment with a very different batch regime should re-measure.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

WISDOM_VERSION = 1

# key "platform/dtype/size" -> entry dict (JSON-serializable)
_WISDOM: Dict[str, dict] = {}


def _wisdom_key(platform: str, size: int, dtype: np.dtype) -> str:
    return f"{platform}/{np.dtype(dtype).name}/{int(size)}"


# ---------------------------------------------------------------------------
# Candidate families
# ---------------------------------------------------------------------------


def _candidates(
    size: int, dtype: np.dtype, platform: str
) -> List[Tuple[str, Callable[[], object]]]:
    """(label, factory) per plan family eligible on this backend.

    Pallas families (vpu/mxu/dd fused kernels) only run natively on TPU —
    off-TPU they would time Mosaic interpret mode, which measures the
    emulator, not the machine — so off-TPU the c64 candidate set collapses
    to the XLA Stockham family and c128 to the families that execute as
    plain XLA (native-f64 Stockham under x64, the XLA dd emulation).
    """
    from fourier_tpu.plan import planner as _planner

    dtype = np.dtype(dtype)
    cands: List[Tuple[str, Callable[[], object]]] = []
    if dtype == np.dtype(np.complex64):
        if platform == "tpu":
            cands.append(
                ("vpu", lambda: _planner.create_fft(
                    size, dtype, backend="vpu", cache=False))
            )
            cands.append(
                ("mxu", lambda: _planner.create_fft(
                    size, dtype, backend="mxu", cache=False))
            )
        cands.append(
            ("stockham", lambda: _planner.create_fft(
                size, dtype, backend="stockham", cache=False))
        )
        return cands

    # complex128
    if platform == "tpu":
        cands.append(("dd", lambda: _planner._create_dd(size)))
        from fourier_tpu.precision import DdFftPlan

        cands.append(("dd_xla", lambda: DdFftPlan(size)))
        return cands
    import jax

    if jax.config.jax_enable_x64:
        cands.append(
            ("stockham", lambda: _planner.create_fft(
                size, dtype, backend="stockham", cache=False))
        )
    from fourier_tpu.precision import DdFftPlan

    cands.append(("dd_xla", lambda: DdFftPlan(size)))
    return cands


def _plan_for_label(label: str, size: int, dtype: np.dtype):
    """Rebuild the plan a wisdom label names (no timing)."""
    from fourier_tpu.plan import planner as _planner

    if label in ("vpu", "mxu", "stockham"):
        return _planner.create_fft(size, dtype, backend=label, cache=False)
    if label == "dd":
        return _planner._create_dd(size)
    if label == "dd_xla":
        from fourier_tpu.precision import DdFftPlan

        return DdFftPlan(size)
    raise ValueError(f"unknown wisdom plan label {label!r}")


# ---------------------------------------------------------------------------
# Timing (chained dependent iterations, one-element-fetch sync)
# ---------------------------------------------------------------------------


def _time_plan(plan, size: int, batch: int, chain: int, iters: int) -> float:
    """Median steady-state seconds per batched transform for this plan."""
    import jax

    from fourier_tpu.tools.bench_suite import _sync, _time_steps
    from fourier_tpu.transform import Transform

    mode = Transform.SQRT_SCALED_FFT  # unitary: chained magnitudes bounded
    rng = np.random.default_rng(0)

    if hasattr(plan, "_apply_dd"):
        from fourier_tpu.precision import ddreal as dd

        x = rng.standard_normal((batch, size)) + 1j * rng.standard_normal(
            (batch, size)
        )
        rh, rl = dd.from_f64(x.real)
        ih, il = dd.from_f64(x.imag)
        planes = tuple(jax.numpy.asarray(p) for p in (rh, rl, ih, il))

        @jax.jit
        def step(rh, rl, ih, il):
            def body(carry, _):
                (a, b), (c, d) = plan._apply_dd(
                    ((carry[0], carry[1]), (carry[2], carry[3])), mode
                )
                return (a, b, c, d), None

            carry, _ = jax.lax.scan(body, (rh, rl, ih, il), None, length=chain)
            return carry

        return _time_steps(step, planes, chain, iters)

    batch_minor = hasattr(plan, "transform_planar_bm")
    shape = (size, batch) if batch_minor else (batch, size)
    if batch_minor:
        apply_fn = lambda re, im: plan.transform_planar_bm(re, im, mode)
    else:
        apply_fn = lambda re, im: plan._apply(re, im, mode)

    f32 = np.dtype(plan.dtype) == np.dtype(np.complex64)
    fdt = np.float32 if f32 else np.float64

    @jax.jit
    def step(re, im):
        def body(carry, _):
            return apply_fn(*carry), None

        carry, _ = jax.lax.scan(body, (re, im), None, length=chain)
        return carry

    re = jax.numpy.asarray(rng.standard_normal(shape).astype(fdt))
    im = jax.numpy.asarray(rng.standard_normal(shape).astype(fdt))
    return _time_steps(step, (re, im), chain, iters)


# ---------------------------------------------------------------------------
# measure_fft + wisdom API
# ---------------------------------------------------------------------------


@dataclass
class MeasureResult:
    size: int
    dtype: str
    platform: str
    best: str
    timings_us: Dict[str, float] = field(default_factory=dict)
    plan: object = None


def measure_fft(
    size: int,
    dtype=np.complex64,
    *,
    batch: Optional[int] = None,
    chain: Optional[int] = None,
    iters: int = 2,
    remember: bool = True,
) -> MeasureResult:
    """Time every eligible plan family for ``(size, dtype)``; pick the winner.

    Skips timing entirely when only one family is eligible (off-TPU c64).
    With ``remember`` the winner is stored in the wisdom table so subsequent
    ``create_fft(size, dtype, backend="measure")`` calls plan instantly.
    """
    import jax

    from fourier_tpu.tools.bench_suite import default_batch

    dtype = np.dtype(dtype)
    platform = jax.default_backend()
    is_dd = dtype == np.dtype(np.complex128)
    if batch is None:
        # Quarter of the bench batch: enough lanes to amortize per-call cost
        # without the full suite's footprint/time.
        batch = max(64, default_batch(size) // 4)
    if chain is None:
        chain = 8 if is_dd else 32

    cands = _candidates(size, dtype, platform)
    timings_us: Dict[str, float] = {}
    plans: Dict[str, object] = {}
    for label, factory in cands:
        plan = factory()
        if plan is None:
            continue
        plans[label] = plan
        if len(cands) == 1:
            timings_us[label] = 0.0  # sole candidate: no timing needed
            continue
        sec = _time_plan(plan, size, batch, chain, iters)
        timings_us[label] = sec * 1e6
    if not plans:
        raise ValueError(f"no eligible plan family for n={size} {dtype}")
    best = min(timings_us, key=timings_us.get)
    result = MeasureResult(
        size=int(size),
        dtype=dtype.name,
        platform=platform,
        best=best,
        timings_us=timings_us,
        plan=plans[best],
    )
    if remember:
        _WISDOM[_wisdom_key(platform, size, dtype)] = {
            "backend": best,
            "timings_us": {k: round(v, 3) for k, v in timings_us.items()},
            "batch": int(batch),
            "chain": int(chain),
        }
    return result


def plan_from_wisdom(size: int, dtype) -> Optional[object]:
    """Plan for a prior measurement's winner, or None if no wisdom exists."""
    import jax

    dtype = np.dtype(dtype)
    entry = _WISDOM.get(_wisdom_key(jax.default_backend(), size, dtype))
    if entry is None:
        return None
    return _plan_for_label(entry["backend"], size, dtype)


def export_wisdom(path: Optional[str] = None) -> str:
    """Serialize accumulated wisdom to JSON; write it to ``path`` if given."""
    doc = json.dumps(
        {"version": WISDOM_VERSION, "entries": _WISDOM},
        indent=2,
        sort_keys=True,
    )
    if path is not None:
        with open(path, "w") as f:
            f.write(doc)
    return doc


def import_wisdom(source: str) -> int:
    """Merge wisdom from a JSON string or a path to one; returns entry count.

    Entries validate structurally (version, backend label, key shape);
    unknown plan labels are rejected so a stale/foreign file cannot make
    ``backend="measure"`` construct nonsense later.
    """
    import os

    text = source
    if os.path.exists(source):
        with open(source) as f:
            text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"wisdom is not valid JSON: {e}") from e
    if not isinstance(doc, dict) or doc.get("version") != WISDOM_VERSION:
        raise ValueError(
            f"unsupported wisdom document (want version={WISDOM_VERSION})"
        )
    entries = doc.get("entries")
    if not isinstance(entries, dict):
        raise ValueError("wisdom document has no entries table")
    known = {"vpu", "mxu", "stockham", "dd", "dd_xla"}
    n = 0
    for key, entry in entries.items():
        if (
            not isinstance(entry, dict)
            or entry.get("backend") not in known
            or len(key.split("/")) != 3
        ):
            raise ValueError(f"malformed wisdom entry {key!r}")
        _WISDOM[key] = entry
        n += 1
    return n


def forget_wisdom() -> None:
    _WISDOM.clear()
