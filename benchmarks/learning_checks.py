"""Vanilla-PPO learning checks over MiniGrid families, one JSON line each.

Reproduces the docs/PERFORMANCE.md "learning check" rows: a real training
run per env id through the public CLI train() API (the same path
`python -m clip_ppo_tpu.cli.ppo_minigrid` drives), reporting wall SPS and
the first/last recent-return means so learning (or an honest negative)
is visible from one line.

    python benchmarks/learning_checks.py                 # default new-family sweep
    python benchmarks/learning_checks.py MiniGrid-LockedRoom-v0=2000000 ...
    python benchmarks/learning_checks.py MiniGrid-MemoryS7-v0=1000000,recurrent
    python benchmarks/learning_checks.py MiniGrid-LockedRoom-v0=2000000,eb=0.005

Each positional arg is ``env_id[=total_timesteps][,opt...]`` (default 1M
steps). Options: ``recurrent`` (LSTM agent, --recurrent), ``eb=BETA``
(SimHash count bonus, --exploration-bonus), ``epb=BETA`` (episodic
first-visit bonus, --episodic-bonus), ``mission``
(--mission-conditioning), ``envs=N`` (--num-envs; the LSTM minibatch is
an env slice, so more envs = more sequences per minibatch), ``ent=C``
(--ent-coef), ``steps=N`` (--num-steps), ``hidden=H``
(--lstm-hidden), and ``decay=F`` (--bonus-decay: anneal the intrinsic
reward to zero over the first F of training). Runs execute sequentially in
ONE process — on the tunneled TPU, rapid sequential client processes can
wedge the tunnel (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

DEFAULT = (
    "MiniGrid-LockedRoom-v0=2000000",
    "MiniGrid-MemoryS7-v0",
    "MiniGrid-MemoryS13-v0",
    "MiniGrid-GoToDoor-5x5-v0",
    "MiniGrid-Fetch-5x5-N2-v0",
    "MiniGrid-GoToObject-6x6-N2-v0",
    "MiniGrid-PutNear-6x6-N2-v0",
    "MiniGrid-ObstructedMaze-2Dl-v0",
)


def main() -> None:
    from clip_ppo_tpu.cli import ppo_minigrid

    specs = sys.argv[1:] or list(DEFAULT)
    for spec in specs:
        head, *opts = spec.split(",")
        env_id, _, steps = head.partition("=")
        steps = int(steps or 1_000_000)
        recurrent = "recurrent" in opts
        mission = "mission" in opts
        eb = 0.0
        epb = 0.0
        num_envs = 8
        num_steps = 128
        ent = 0.01
        hidden = 128
        decay = 0.0
        for o in opts:
            if o.startswith("decay="):
                decay = float(o[6:])
            if o.startswith("eb="):
                eb = float(o[3:])
            elif o.startswith("epb="):
                epb = float(o[4:])
            elif o.startswith("envs="):
                num_envs = int(o[5:])
            elif o.startswith("steps="):
                num_steps = int(o[6:])
            elif o.startswith("ent="):
                ent = float(o[4:])
            elif o.startswith("hidden="):
                hidden = int(o[7:])
        t0 = time.time()
        run_name = f"lcheck_{env_id}_{int(t0)}"
        out = ppo_minigrid.train(
            ppo_minigrid.Args(
                env_id=env_id, seed=0, total_timesteps=steps,
                capture_video=False, save_model=False,
                recurrent=recurrent, exploration_bonus=eb,
                episodic_bonus=epb, bonus_decay=decay,
                mission_conditioning=mission,
                num_envs=num_envs, num_steps=num_steps, ent_coef=ent,
                lstm_hidden=hidden,
            ),
            run_name=run_name,
        )
        # Full per-episode history from the run's TB events (train()'s
        # recent_returns is only the last-100 tail).
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
        # size_guidance 0: keep EVERY episode scalar — the default
        # reservoir-downsamples to 10k points, which would silently turn
        # first-k means into a sample of early training on long runs.
        ea = EventAccumulator(f"runs/{run_name}",
                              size_guidance={"scalars": 0})
        ea.Reload()
        ret = [e.value for e in ea.Scalars("charts/episodic_return")]
        k = min(200, max(len(ret) // 2, 1))
        line = {
            "metric": "learning_check", "env_id": env_id, "steps": steps,
            **({"recurrent": True} if recurrent else {}),
            **({"mission": True} if mission else {}),
            **({"exploration_bonus": eb} if eb else {}),
            **({"episodic_bonus": epb} if epb else {}),
            **({"bonus_decay": decay} if decay else {}),
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
