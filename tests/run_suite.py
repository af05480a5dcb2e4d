"""Run the full test suite as a handful of isolated pytest processes.

Why not one `pytest tests/`: on this box, XLA:CPU segfaults
intermittently inside `backend_compile_and_load` once a single process
has accumulated on the order of a hundred compiled programs (r3: three
crashes at three different tests; r4: two more at a reproducible
position, with the persistent compilation cache fully disabled and every
crashed test green in isolation). Bounding the number of tests per
process sidesteps the accumulation; each batch pays its own ~30 s jax
import + compile warmup, which is the price of a suite that finishes.

    python tests/run_suite.py            # all batches, summary at the end
    python tests/run_suite.py -k expr    # extra args forwarded to pytest
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

# 6-file batches still hit the crash once (a compile-heavy batch —
# hypothesis fuzz + the 165-id registry matrix — reached ~170 tests in
# one process); 3 bounds every batch comfortably below the observed
# threshold.
BATCH_FILES = 3


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    extra = sys.argv[1:]
    t0 = time.time()
    failed: list[str] = []
    for i in range(0, len(files), BATCH_FILES):
        batch = files[i : i + BATCH_FILES]
        names = ", ".join(os.path.basename(f) for f in batch)
        print(f"=== batch {i // BATCH_FILES + 1}: {names}", flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *extra, *batch],
            cwd=os.path.dirname(here),
        )
        if r.returncode != 0:
            # One retry in a fresh process: the box's stochastic XLA:CPU
            # compile segfault (see conftest) kills pytest with a signal;
            # genuine test failures reproduce on the retry.
            print(f"batch rc={r.returncode} — retrying once "
                  f"(XLA:CPU crash suspected)", flush=True)
            r = subprocess.run(
                [sys.executable, "-m", "pytest", "-q", *extra, *batch],
                cwd=os.path.dirname(here),
            )
        if r.returncode != 0:
            failed.append(names)
    dt = time.time() - t0
    if failed:
        print(f"SUITE FAILED in {dt:.0f}s — failing batches:")
        for n in failed:
            print(f"  {n}")
        return 1
    print(f"SUITE GREEN in {dt:.0f}s ({len(files)} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
