"""MemoryS13 via the built-in curriculum (VERDICT r4 item 5).

Direct S13 training is DEAD FLAT at the 0.5 guess ceiling (r5: 48M
ent=0.001 run — all 20 curve vigintiles at 0.496; 64 envs @32M: 0.501;
the S7 recipe does not transfer). Diagnosis: upstream MemoryEnv spawns
the agent at a RANDOM x along the hallway, so most episodes never show
the cue; the cue→choice association can only bootstrap from the rare
near-cue starts, and at S13's hallway length the walk-back behavior
those starts must generalize to is never rewarded before the policy
collapses onto fork-guessing.

MemoryS13Random (upstream registration, random hallway length 4..11)
contains its own curriculum: short-hallway episodes teach the
association AND the walk-back at low cost. This driver trains stage 1
on S13Random, then resumes the FULL TrainState on S13 proper via the
CLI's cross-env `--resume-checkpoint` (shapes match: both 13×13; the
restored in-flight episodes drain within max_steps and autoreset onto
genuine S13 layouts). Prints one learning_check JSON line per stage.

    python benchmarks/s13_curriculum.py [stage1_steps] [stage2_steps]
    python benchmarks/s13_curriculum.py --extend CKPT EXTRA_STEPS

The second form resumes an existing stage checkpoint on S13 proper for
EXTRA_STEPS more (budget extension without rerunning earlier stages).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def _report(tag, run_name, steps, out, t0):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    ea = EventAccumulator(f"runs/{run_name}", size_guidance={"scalars": 0})
    ea.Reload()
    ret = [e.value for e in ea.Scalars("charts/episodic_return")]
    k = min(200, max(len(ret) // 2, 1))
    print(json.dumps({
        "metric": "learning_check", "env_id": tag, "steps": steps,
        "recurrent": True, "curriculum": True,
        "sps": round(out["sps"], 1), "wall_s": round(time.time() - t0, 1),
        "episodes": len(ret),
        "first_mean": round(sum(ret[:k]) / max(len(ret[:k]), 1), 3),
        "last_mean": round(sum(ret[-k:]) / max(len(ret[-k:]), 1), 3),
        "max_return": round(max(ret, default=0.0), 3),
    }), flush=True)


def _extend(ckpt: str, extra: int) -> None:
    """Resume `ckpt` on S13 proper for `extra` more steps, save a new final."""
    import pickle

    from clip_ppo_tpu.cli import ppo_minigrid

    with open(ckpt, "rb") as f:
        resumed_step = int(pickle.load(f)["global_step"])
    stamp = int(time.time())
    run = f"s13ext_{stamp}"
    t0 = time.time()
    out = ppo_minigrid.train(
        ppo_minigrid.Args(
            env_id="MiniGrid-MemoryS13-v0", seed=0,
            total_timesteps=resumed_step + extra, capture_video=False,
            recurrent=True, ent_coef=0.001,
            save_model=True, save_freq=10**12, model_path="checkpoints",
            resume_checkpoint=ckpt,
        ),
        run_name=run,
    )
    _report(f"MiniGrid-MemoryS13-v0[extend@{resumed_step}]", run, extra, out, t0)


def main() -> None:
    from clip_ppo_tpu.cli import ppo_minigrid

    if len(sys.argv) > 1 and sys.argv[1] == "--extend":
        _extend(sys.argv[2], int(sys.argv[3]))
        return

    s1 = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    s2 = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    stamp = int(time.time())
    run1 = f"s13curr1_{stamp}"
    t0 = time.time()
    out1 = ppo_minigrid.train(
        ppo_minigrid.Args(
            env_id="MiniGrid-MemoryS13Random-v0", seed=0,
            total_timesteps=s1, capture_video=False,
            recurrent=True, ent_coef=0.001,
            save_model=True, save_freq=10**12, model_path="checkpoints",
        ),
        run_name=run1,
    )
    _report("MiniGrid-MemoryS13Random-v0[stage1]", run1, s1, out1, t0)

    run2 = f"s13curr2_{stamp}"
    t0 = time.time()
    out2 = ppo_minigrid.train(
        ppo_minigrid.Args(
            env_id="MiniGrid-MemoryS13-v0", seed=0,
            total_timesteps=s1 + s2, capture_video=False,
            recurrent=True, ent_coef=0.001,
            save_model=True, save_freq=10**12, model_path="checkpoints",
            resume_checkpoint=f"checkpoints/{run1}_final.ckpt",
        ),
        run_name=run2,
    )
    _report("MiniGrid-MemoryS13-v0[stage2]", run2, s2, out2, t0)


if __name__ == "__main__":
    main()
