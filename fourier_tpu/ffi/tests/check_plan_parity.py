#!/usr/bin/env python3
"""Differential gate: native C++ planner vs Python planner.

Runs the ``dump_plan`` CLI for a set of sizes covering every plan family
(pure pow2, pow3, composite-with-5, prime — Stockham and Bluestein) and both
dtypes, parses the dumped schedule + tables, and rebuilds the same quantities
with the Python planner's own plan-time functions
(``fourier_tpu.plan.factor.factorize_autosort``, ``fourier_tpu.twiddle``,
``fourier_tpu.plan.bluestein._chirp_tables``). Any disagreement on schedule,
inner size, table shapes, or table values fails the test — the two planners
share semantics by contract (both mirror the reference's
``autosort/mod.rs:104-134`` + ``bluesteins.rs:18-61``), and this script turns
the contract into a ctest/pytest gate.

Exit codes: 0 pass, 1 mismatch, 77 environment cannot run the check (skipped).
"""

import os
import subprocess
import sys

# The check needs only plan-time numpy math, but importing fourier_tpu pulls
# in jax; make sure jax initializes the CPU backend wherever this runs (the
# TPU image pins JAX_PLATFORMS to a tunnel plugin that isn't on ctest's path).
os.environ["JAX_PLATFORMS"] = "cpu"

SIZES = [64, 73, 100, 243, 1013]
DTYPES = {"f32": ("float32", 4e-7, 2e-5), "f64": ("float64", 4e-15, 1e-12)}


def parse_dump(text):
    """Parse dump_plan output into a nested dict."""
    lines = text.splitlines()
    pos = [0]

    def next_line():
        line = lines[pos[0]]
        pos[0] += 1
        return line

    def parse_plan():
        import numpy as np

        head = next_line().split()
        assert head[0] == "plan", head
        plan = {"kind": head[1], "tables": {}}
        while True:
            parts = next_line().split()
            if parts[0] == "end":
                return plan
            if parts[0] == "size":
                plan["size"] = int(parts[1])
            elif parts[0] == "inner_size":
                plan["inner_size"] = int(parts[1])
            elif parts[0] == "radices":
                plan["radices"] = tuple(int(r) for r in parts[1:])
            elif parts[0] == "table":
                name, count = parts[1], int(parts[2])
                vals = np.empty(count, dtype=np.complex128)
                for i in range(count):
                    re, im = next_line().split()
                    vals[i] = complex(float(re), float(im))
                plan["tables"][name] = vals
            elif parts[0] == "inner":
                plan["inner"] = parse_plan()
            else:
                raise AssertionError(f"unexpected dump line: {parts}")

    return parse_plan()


def expected_stockham_tables(size, radices, real_dtype):
    """The Python planner's stage tables, flattened in dump order."""
    import numpy as np

    from fourier_tpu.twiddle import stage_twiddles

    fwd, inv = [], []
    s = size
    for r in radices:
        tf = stage_twiddles(s, r, True)
        ti = stage_twiddles(s, r, False)
        fwd.append(_narrow(tf, real_dtype).reshape(-1))
        inv.append(_narrow(ti, real_dtype).reshape(-1))
        s //= r
    return np.concatenate(fwd), np.concatenate(inv)


def _narrow(table, real_dtype):
    import numpy as np

    return table.real.astype(real_dtype).astype(np.float64) + 1j * (
        table.imag.astype(real_dtype).astype(np.float64)
    )


def check_table(label, got, want, atol):
    import numpy as np

    if got.shape != want.shape:
        return [f"{label}: shape {got.shape} != {want.shape}"]
    err = np.max(np.abs(got - want)) if got.size else 0.0
    scale = max(1.0, float(np.max(np.abs(want))) if want.size else 1.0)
    if err > atol * scale:
        return [f"{label}: max |diff| {err:.3e} > {atol:.1e} * {scale:.3e}"]
    return []


def check_size(dump_bin, size, dkey):
    import numpy as np

    from fourier_tpu.plan.bluestein import _chirp_tables
    from fourier_tpu.plan.factor import factorize_autosort, next_power_of_two

    real_dtype, tw_tol, fft_tol = DTYPES[dkey]
    out = subprocess.run(
        [dump_bin, str(size), dkey], capture_output=True, text=True, check=True
    )
    plan = parse_dump(out.stdout)
    errors = []
    radices = factorize_autosort(size)
    if radices is None:
        # Python planner says Bluestein; the native planner must agree.
        if plan["kind"] != "bluestein":
            return [f"n={size}: native kind {plan['kind']}, python bluestein"]
        m = next_power_of_two(2 * size - 1)
        if plan["inner_size"] != m:
            errors.append(
                f"n={size}: inner size {plan['inner_size']} != python {m}"
            )
        w_fwd, w_inv, x_fwd, x_inv = _chirp_tables(size, m)
        # Chirp angles reach pi*n (theta = pi*j^2/n), so libm-vs-numpy
        # argument-reduction differences scale with n*eps; the stage-table
        # tolerance is widened by the size for the x tables.
        x_tol = tw_tol * max(1.0, float(size))
        for name, want in (
            ("x_fwd", x_fwd),
            ("x_inv", x_inv),
            ("w_fwd", w_fwd),
            ("w_inv", w_inv),
        ):
            tol = x_tol if name.startswith("x") else fft_tol
            errors += check_table(
                f"n={size}/{dkey} {name}",
                plan["tables"][name],
                _narrow(np.asarray(want), real_dtype) if name.startswith("x")
                else np.asarray(want),
                tol,
            )
        inner_radices = factorize_autosort(m)
        if plan["inner"]["radices"] != tuple(inner_radices):
            errors.append(
                f"n={size}: inner schedule {plan['inner']['radices']} != "
                f"python {tuple(inner_radices)}"
            )
        fwd, inv = expected_stockham_tables(m, inner_radices, real_dtype)
        errors += check_table(
            f"n={size}/{dkey} inner fwd_tw", plan["inner"]["tables"]["fwd_tw"],
            fwd, tw_tol,
        )
        return errors
    # Stockham on both sides.
    if plan["kind"] != "stockham":
        return [f"n={size}: native kind {plan['kind']}, python stockham"]
    if plan["radices"] != tuple(radices):
        return [
            f"n={size}: schedule {plan['radices']} != python {tuple(radices)}"
        ]
    fwd, inv = expected_stockham_tables(size, radices, real_dtype)
    errors += check_table(f"n={size}/{dkey} fwd_tw", plan["tables"]["fwd_tw"],
                          fwd, tw_tol)
    errors += check_table(f"n={size}/{dkey} inv_tw", plan["tables"]["inv_tw"],
                          inv, tw_tol)
    return errors


def main():
    if len(sys.argv) != 2:
        print("usage: check_plan_parity.py <dump_plan binary>")
        return 2
    dump_bin = sys.argv[1]
    try:
        import numpy  # noqa: F401

        import fourier_tpu  # noqa: F401
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"SKIP: cannot import the Python planner ({e})")
        return 77
    failures = []
    for size in SIZES:
        for dkey in DTYPES:
            failures += check_size(dump_bin, size, dkey)
    if failures:
        print("PLAN PARITY FAILURES:")
        for f in failures:
            print(" ", f)
        return 1
    print(f"plan parity OK: sizes {SIZES} x dtypes {list(DTYPES)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
