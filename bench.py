"""End-to-end benchmark: env steps/sec for vanilla PPO on MiniGrid.

Matches BASELINE.md config 1 (MiniGrid-Empty-16x16-v0, 8 envs, CleanRL
hyperparameters). The reference publishes no number; the baseline constant
below is a generous estimate of the reference-on-GPU throughput for this
config (host-looped SyncVectorEnv rollouts + per-step H2D/D2H, observed
around 1-2k SPS for CleanRL-style MiniGrid PPO on a modern GPU; see
BASELINE.md). vs_baseline = measured / BASELINE_SPS.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax


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

    # Warmup: compile + 2 steady-state iterations.
    for it in range(1, 4):
        state, scalars, _ = trainer.run_iteration(state, it)
    jax.block_until_ready(state.params)

    iters = 20
    t0 = time.perf_counter()
    for it in range(4, 4 + iters):
        state, scalars, _ = trainer.run_iteration(state, it)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    sps = iters * num_envs * num_steps / dt
    print(json.dumps({
        "metric": "ppo_minigrid_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_SPS, 2),
    }))


if __name__ == "__main__":
    main()
