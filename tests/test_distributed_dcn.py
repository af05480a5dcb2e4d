"""Two-process DCN smoke: the multi-host init path actually executes.

VERDICT r2 item 2 / SURVEY §2c comm-backend row: `parallel/distributed.py`
was the only parallelism artifact with zero runtime coverage. This test
subprocess-launches two coordinated CPU processes (localhost
`jax.distributed.initialize` via `initialize_distributed`), builds the
2-process global mesh, and runs one data-parallel PPO update with psum'd
gradients through the framework's own `ppo.update_epochs` — asserting both
processes finish with bit-identical parameters that differ from the
initial ones. The reference has no distributed backend at all
(`ppo_minigrid.py:195`, single device).
"""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "helpers", "dcn_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode: str):
    port = _free_port()
    env = dict(os.environ)
    # each worker gets exactly one CPU device → a 2-device global mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    parsed = []
    for out in outs:
        m = re.search(r"DIGEST (\w+) INIT (\w+) PG (\S+)", out)
        assert m, f"no digest line in:\n{out}"
        parsed.append(m.groups())

    (d0, i0, pg0), (d1, i1, pg1) = parsed
    assert d0 == d1, "updated params diverged across processes"
    assert i0 == i1, "initial params differ (seeding bug)"
    assert d0 != i0, "update was a no-op"
    assert pg0 == pg1


def test_two_process_dcn_update():
    _run_workers("update")


def test_two_process_dcn_trainer():
    """The full user-facing Trainer trains across the two-process mesh:
    init_state → a 3-iteration run_iterations chunk (rollout + GAE +
    updates, SPMD) → fetch_logs_chunk's cross-process allgather."""
    _run_workers("trainer")
