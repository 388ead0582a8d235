#!/usr/bin/env python
"""One-command verification: the CI entry point (ci.yml / ffi.yml analog).

Runs, in order, with a PASS/FAIL summary:

  1. pytest quick tier  — `pytest tests/ -m "not slow"` (~5-8 min, CPU; the
     heavyweights are marked slow by tests/conftest.py)
  2. FFI build + ctest  — cmake/ninja the native core, run its C/C++
     roundtrip + plan-parity gates
  3. bench smoke        — plan + execute the headline config once (a dry-run
     of bench.py's path; full timing only makes sense on the TPU chip)
  4. multichip dryrun   — the driver's own gate: `dryrun_multichip(8)` jits
     the sharded plan families over a virtual 8-device CPU mesh and checks
     them numerically (__graft_entry__.py)

`--full` replaces the quick tier with the full suite (~50-60 min).
Exit code 0 iff every step passed.

Reference analog: the three CI workflow matrices
(`.github/workflows/ci.yml:10-27`, `no_std.yml`, `ffi.yml`).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_step(name: str, cmd, timeout: int = 4800) -> bool:
    print(f"\n=== {name}: {' '.join(map(str, cmd))}", flush=True)
    t0 = time.time()
    try:
        rc = subprocess.run(cmd, cwd=REPO, timeout=timeout).returncode
    except subprocess.TimeoutExpired:
        print(f"=== {name}: TIMEOUT after {timeout}s", flush=True)
        return False
    ok = rc == 0
    print(f"=== {name}: {'PASS' if ok else f'FAIL (rc={rc})'} "
          f"[{time.time() - t0:.0f}s]", flush=True)
    return ok


def bench_smoke() -> bool:
    code = (
        "import numpy as np, jax, fourier_tpu as ft\n"
        "from fourier_tpu.transform import Transform\n"
        "plan = ft.create_fft_f32(4096)\n"
        "rng = np.random.default_rng(0)\n"
        "x = (rng.standard_normal(4096) + 1j*rng.standard_normal(4096)).astype(np.complex64)\n"
        "got = np.asarray(plan.transform(x, Transform.FFT))\n"
        "ref = np.fft.fft(x)\n"
        "rel = np.linalg.norm(got-ref)/np.linalg.norm(ref)\n"
        "print('bench-smoke platform:', jax.default_backend(), 'rel-L2:', rel)\n"
        "assert rel < 1e-5, rel\n"
    )
    return run_step("bench smoke", [sys.executable, "-c", code], timeout=900)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full", action="store_true",
                    help="run the full pytest suite instead of the quick tier")
    ap.add_argument("-n", default="8",
                    help="pytest-xdist workers (default 8; '0' = serial)")
    args = ap.parse_args()

    pytest_cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if not args.full:
        pytest_cmd += ["-m", "not slow"]
    if args.n != "0":
        pytest_cmd += ["-p", "xdist", "-n", args.n]

    results = {}
    results["pytest " + ("full" if args.full else "quick")] = run_step(
        "pytest", pytest_cmd
    )
    ffi = REPO / "fourier_tpu" / "ffi"
    results["ffi cmake"] = run_step(
        "ffi cmake", ["cmake", "-B", str(ffi / "build"), "-G", "Ninja", str(ffi)]
    ) and run_step("ffi ninja", ["ninja", "-C", str(ffi / "build")])
    results["ffi ctest"] = run_step(
        "ffi ctest", ["ctest", "--test-dir", str(ffi / "build"),
                      "--output-on-failure"]
    )
    results["bench smoke"] = bench_smoke()
    results["multichip dryrun"] = run_step(
        "multichip dryrun",
        [sys.executable, "-u", str(REPO / "__graft_entry__.py")],
        timeout=1800,
    )

    print("\n==== summary ====")
    for name, ok in results.items():
        print(f"  {'PASS' if ok else 'FAIL'}  {name}")
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
