"""Run the full test suite as a handful of isolated pytest processes.

Why not one `pytest tests/`: on this box, XLA:CPU segfaults
intermittently inside `backend_compile_and_load` once a single process
has accumulated on the order of a hundred compiled programs (r3: three
crashes at three different tests; r4: two more at a reproducible
position, with the persistent compilation cache fully disabled and every
crashed test green in isolation). Bounding the number of tests per
process sidesteps the accumulation; each batch pays its own ~30 s jax
import + compile warmup, which is the price of a suite that finishes.

`test_registry_matrix.py` alone compiles one reset program per
registered env id (165 in r4) and crossed the crash threshold as a
single process (r4: SIGSEGV at ~155/168 tests, rc=139, zero assertion
failures). It is therefore excluded from the normal batching and run as
REGISTRY_SHARDS separate shard subprocesses via
$CLIP_PPO_REGISTRY_SHARD="k/N" (see _shard in that file).

Retries fire ONLY on signal deaths (rc < 0 or rc >= 128, e.g. 134 =
SIGABRT / 139 = SIGSEGV) — the stochastic XLA:CPU crash. A genuine
assertion failure (rc == 1) fails the suite immediately and is never
retried to green.

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
# 165 ids / 4 shards ≈ 42 reset compiles per process, well under the
# ~120-150-compile crash threshold.
REGISTRY_SHARDS = 4
SHARDED_FILES = {"test_registry_matrix.py": REGISTRY_SHARDS}


def _is_signal_death(rc: int) -> bool:
    return rc < 0 or rc >= 128


def _run_batch(cmd: list[str], cwd: str, env: dict | None = None) -> int:
    r = subprocess.run(cmd, cwd=cwd, env=env)
    if _is_signal_death(r.returncode):
        # One retry in a fresh process: the box's stochastic XLA:CPU
        # compile segfault kills pytest with a signal; assertion
        # failures (rc==1) are NOT retried — they must fail the suite.
        print(
            f"batch died with rc={r.returncode} — retrying once "
            f"(XLA:CPU crash suspected)",
            flush=True,
        )
        r = subprocess.run(cmd, cwd=cwd, env=env)
    return r.returncode


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    batched = [f for f in files if os.path.basename(f) not in SHARDED_FILES]
    sharded = [f for f in files if os.path.basename(f) in SHARDED_FILES]
    extra = sys.argv[1:]
    t0 = time.time()
    failed: list[str] = []
    n_batches = 0
    for i in range(0, len(batched), BATCH_FILES):
        batch = batched[i : i + BATCH_FILES]
        names = ", ".join(os.path.basename(f) for f in batch)
        n_batches += 1
        print(f"=== batch {n_batches}: {names}", flush=True)
        rc = _run_batch(
            [sys.executable, "-m", "pytest", "-q", *extra, *batch], root
        )
        if rc != 0:
            failed.append(names)
    for f in sharded:
        name = os.path.basename(f)
        n = SHARDED_FILES[name]
        for k in range(n):
            n_batches += 1
            print(f"=== batch {n_batches}: {name} [shard {k}/{n}]", flush=True)
            env = dict(os.environ, CLIP_PPO_REGISTRY_SHARD=f"{k}/{n}")
            rc = _run_batch(
                [sys.executable, "-m", "pytest", "-q", *extra, f], root, env
            )
            if rc != 0:
                failed.append(f"{name} [shard {k}/{n}]")
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
