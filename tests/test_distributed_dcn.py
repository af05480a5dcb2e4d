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


def _run_workers(mode: str, nprocs: int = 2):
    port = _free_port()
    env = dict(os.environ)
    # each worker gets exactly one CPU device → an nprocs-device global mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), mode, str(nprocs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env, text=True,
        )
        for i in range(nprocs)
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

    d0, i0, pg0 = parsed[0]
    for d, i, pg in parsed[1:]:
        assert d == d0, "updated params diverged across processes"
        assert i == i0, "initial params differ (seeding bug)"
        assert pg == pg0
    assert d0 != i0, "update was a no-op"


def test_two_process_dcn_update():
    _run_workers("update")


def test_four_process_dcn_update():
    """Same psum'd update over a 4-process mesh — the collective path is
    size-generic, pinned here beyond the minimal pair."""
    _run_workers("update", nprocs=4)


def test_two_process_distributed_cli(tmp_path):
    """`--distributed` end-to-end through the real ppo_minigrid CLI: two
    processes rendezvous via the documented JAX_* env vars, train 4
    iterations on a cross-host dp mesh, and only process 0 writes the TB
    run and the checkpoint."""
    import shutil

    port = _free_port()
    run_name = f"dcn_cli_{port}"
    shutil.rmtree(f"runs/{run_name}", ignore_errors=True)
    shutil.rmtree("/tmp/cli_dcn_ckpt", ignore_errors=True)
    cli_worker = os.path.join(REPO, "tests", "helpers", "cli_dcn_worker.py")
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, cli_worker, run_name],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env, text=True,
        ))
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

    summaries = []
    for out in outs:
        m = re.search(r"SUMMARY step=(\d+) n_returns=(\d+)", out)
        assert m, f"no summary in:\n{out}"
        summaries.append(m.groups())
    assert summaries[0] == summaries[1]
    assert summaries[0][0] == "128"

    # Artifacts written by process 0 only.
    run_dir = os.path.join(REPO, "runs", run_name)
    assert os.path.isdir(run_dir) and os.listdir(run_dir)
    ckpts = os.listdir("/tmp/cli_dcn_ckpt")
    assert any(f.startswith(run_name) and "final" in f for f in ckpts), ckpts

    # SPS progress printed by process 0, silent on process 1.
    main_out = outs[0] if "iteration" in outs[0] else outs[1]
    other = outs[1] if main_out is outs[0] else outs[0]
    assert "SPS:" in main_out
    assert "SPS:" not in other
    shutil.rmtree(run_dir, ignore_errors=True)
    shutil.rmtree("/tmp/cli_dcn_ckpt", ignore_errors=True)


def test_two_process_dcn_trainer():
    """The full user-facing Trainer trains across the two-process mesh:
    init_state → a 3-iteration run_iterations chunk (rollout + GAE +
    updates, SPMD) → fetch_logs_chunk's cross-process allgather."""
    _run_workers("trainer")
