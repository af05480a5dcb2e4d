"""Atari (pure-JAX env) learning checks, one JSON line each — the Atari
counterpart of benchmarks/learning_checks.py, through the public
``cli.ppo_atari.train`` API (the same path the CLI drives).

    python benchmarks/learning_checks_atari.py "ALE/Pong-v5=10000000"
    python benchmarks/learning_checks_atari.py "ALE/Pong-v5=10000000,envs=32,ent=0.005"

Options per spec: ``envs=N`` (--num-envs), ``ent=C`` (--ent-coef),
``steps=N`` (--num-steps), ``lr=X`` (--learning-rate). Runs execute
sequentially in ONE process (tunnel safety, CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from clip_ppo_tpu.cli import ppo_atari

    for spec in sys.argv[1:]:
        head, *opts = spec.split(",")
        env_id, _, steps = head.partition("=")
        steps = int(steps or 1_000_000)
        num_envs, num_steps, ent, lr = 8, 128, 0.01, 2.5e-4
        for o in opts:
            if o.startswith("envs="):
                num_envs = int(o[5:])
            elif o.startswith("steps="):
                num_steps = int(o[6:])
            elif o.startswith("ent="):
                ent = float(o[4:])
            elif o.startswith("lr="):
                lr = float(o[3:])
        t0 = time.time()
        run_name = f"lcheck_{env_id.replace('/', '_')}_{int(t0)}"
        out = ppo_atari.train(
            ppo_atari.Args(
                env_id=env_id, seed=0, total_timesteps=steps,
                capture_video=False, num_envs=num_envs,
                num_steps=num_steps, ent_coef=ent, learning_rate=lr,
            ),
            run_name=run_name,
        )
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        ea = EventAccumulator(f"runs/{run_name}",
                              size_guidance={"scalars": 0})
        ea.Reload()
        ret = [e.value for e in ea.Scalars("charts/episodic_return")]
        k = min(200, max(len(ret) // 2, 1))
        line = {
            "metric": "learning_check", "env_id": env_id, "steps": steps,
            "num_envs": num_envs, "ent_coef": ent,
            "sps": round(out["sps"], 1),
            "wall_s": round(time.time() - t0, 1),
            "episodes": len(ret),
            "first_mean": round(sum(ret[:k]) / max(len(ret[:k]), 1), 3),
            "last_mean": round(sum(ret[-k:]) / max(len(ret[-k:]), 1), 3),
            "max_return": round(max(ret, default=0.0), 3),
        }
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
