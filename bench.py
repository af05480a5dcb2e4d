"""End-to-end benchmark: env steps/sec for vanilla PPO on MiniGrid.

Matches BASELINE.md config 1 (MiniGrid-Empty-16x16-v0, 8 envs, CleanRL
hyperparameters). The reference publishes no number; the baseline constant
below is a generous estimate of the reference-on-GPU throughput for this
config (host-looped SyncVectorEnv rollouts + per-step H2D/D2H, observed
around 1-2k SPS for CleanRL-style MiniGrid PPO on a modern GPU; see
BASELINE.md). vs_baseline = measured / BASELINE_SPS.

Measurement methodology (important on tunneled TPU devices, where
``block_until_ready`` does not reliably wait and host↔device transfers are
slow): every iteration's TrainState depends on the previous one, so the
timed region dispatches all iterations and then fetches ONE scalar that
depends on the final state — the fetch cannot complete before every
iteration's compute has. The fixed dispatch+fetch round-trip latency is
measured separately with a null chain and subtracted.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import numpy as np


BASELINE_SPS = 2000.0  # reference-on-GPU estimate (no published number)


def main() -> None:
    from clip_ppo_tpu.envs import JaxVectorEnv
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    env_id, num_envs, num_steps = "MiniGrid-Empty-16x16-v0", 8, 128
    env = JaxVectorEnv(env_id, num_envs)
    cfg = PPOConfig(num_envs=num_envs, num_steps=num_steps)
    trainer = Trainer(cfg, env, num_iterations=1000)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    state = trainer.init_state(params, seed=0)

    def fetch(state, scalars) -> float:
        # One scalar, data-dependent on the whole iteration chain.
        return float(scalars["policy_loss"])

    # Warmup: compile + 2 steady-state iterations, fully synced.
    for it in range(1, 4):
        state, scalars, _ = trainer.run_iteration(state, it)
    _ = fetch(state, scalars)

    # Fixed round-trip latency of a single dispatch+fetch (null-ish chain).
    t0 = time.perf_counter()
    state, scalars, _ = trainer.run_iteration(state, 4)
    _ = fetch(state, scalars)
    single_iter_plus_rtt = time.perf_counter() - t0

    iters = 50
    t0 = time.perf_counter()
    for it in range(5, 5 + iters):
        state, scalars, _ = trainer.run_iteration(state, it)
    _ = fetch(state, scalars)
    total = time.perf_counter() - t0

    # Amortized per-iteration time; subtract the single-dispatch RTT once
    # (the final fetch), clamped to stay conservative.
    compute_time = max(total - max(single_iter_plus_rtt - total / iters, 0.0), 1e-9)
    sps = iters * num_envs * num_steps / compute_time
    print(json.dumps({
        "metric": "ppo_minigrid_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_SPS, 2),
    }))


if __name__ == "__main__":
    main()
