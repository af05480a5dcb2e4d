"""Worker for the two-process `--distributed` CLI test.

Usage: python tests/helpers/cli_dcn_worker.py <run_name>

The distributed rendezvous config comes from the JAX_COORDINATOR_ADDRESS
/ JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars set by the parent — the
exact contract the CLI flag documents. Runs the real
`cli.ppo_minigrid.train` with ``--distributed`` and prints a summary
digest line the parent compares across processes.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

# The axon sitecustomize overrides JAX_PLATFORMS after env parsing; force
# CPU before any backend use (and before jax.distributed initializes).
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    run_name = sys.argv[1]

    from clip_ppo_tpu.cli import ppo_minigrid as m

    args = m.Args(
        env_id="MiniGrid-Empty-5x5-v0",
        total_timesteps=128,
        num_envs=4,
        num_steps=8,
        num_minibatches=2,
        update_epochs=1,
        capture_video=False,
        save_model=True,
        model_path="/tmp/cli_dcn_ckpt",
        distributed=True,
        iterations_per_dispatch=2,
    )
    out = m.train(args, run_name=run_name)
    print(
        f"SUMMARY step={out['global_step']} "
        f"n_returns={len(out['recent_returns'])}",
        flush=True,
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
