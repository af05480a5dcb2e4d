"""BASELINE.md benchmark-config matrix, reproducible from one command.

The driver's BASELINE.json names five benchmark configs; each maps here to
a short real training run through the public CLIs, reporting env
steps/sec and the recent-episode mean return as one JSON line (same
contract as the root ``bench.py``, which runs config 1 at full length).

    python benchmarks/run_config.py --config 1   # PPO MiniGrid-Empty-16x16
    python benchmarks/run_config.py --config 2   # CLIP-PPO MiniGrid λ=1e-5 text
    python benchmarks/run_config.py --config 3   # CLIP-PPO DoorKey-6x6 + MODERATE
    python benchmarks/run_config.py --config 4   # CLIP-PPO Atari Breakout (image)
    python benchmarks/run_config.py --config 5   # ViT-L/14 + SEVERE eval sweep
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from dataclasses import dataclass

sys.path.insert(0, ".")

from clip_ppo_tpu.utils import flags  # noqa: E402


@dataclass
class BenchConfigArgs:
    config: int = 1
    """which BASELINE.json benchmark config to run (1-5)"""
    total_timesteps: int = 0
    """override steps (0 → config default)"""
    seed: int = 0
    """seed"""


def _emit(metric: str, value: float, unit: str, extra: dict | None = None) -> None:
    line = {"metric": metric, "value": round(value, 2), "unit": unit}
    if extra:
        line.update(extra)
    print(json.dumps(line))


def config_1(args):  # vanilla PPO, MiniGrid-Empty-16x16, 8 envs
    from clip_ppo_tpu.cli import ppo_minigrid

    a = ppo_minigrid.Args(
        env_id="MiniGrid-Empty-16x16-v0", seed=args.seed,
        total_timesteps=args.total_timesteps or 250_000,
        capture_video=False, save_model=False,
    )
    out = ppo_minigrid.train(a, run_name=f"bench_cfg1_{int(time.time())}")
    ret = out["recent_returns"]
    _emit("cfg1_ppo_minigrid_sps", out["sps"], "steps/s",
          {"mean_recent_return": round(float(sum(ret) / max(len(ret), 1)), 3)})


def config_2(args):  # CLIP-PPO ViT-B/32 MiniGrid λ=1e-5 (text)
    from clip_ppo_tpu.cli import clip_ppo_minigrid as m

    a = m.Args(
        env_id="MiniGrid-Empty-16x16-v0", seed=args.seed,
        total_timesteps=args.total_timesteps or 100_000,
        capture_video=False, save_model=False, verbose=False,
        clip_config=m.MiniGridClipPPOConfig(clip_lambda=1e-5, clip_modality="text"),
    )
    out = m.train(a, run_name=f"bench_cfg2_{int(time.time())}")
    ret = out["recent_returns"]
    _emit("cfg2_clip_ppo_minigrid_sps", out["sps"], "steps/s",
          {"mean_recent_return": round(float(sum(ret) / max(len(ret), 1)), 3)})


def config_3(args):  # CLIP-PPO + MODERATE disturbances, DoorKey-6x6
    from clip_ppo_tpu.cli import clip_ppo_minigrid as m

    a = m.Args(
        env_id="MiniGrid-DoorKey-6x6-v0", seed=args.seed,
        total_timesteps=args.total_timesteps or 100_000,
        capture_video=False, save_model=False, verbose=False,
        clip_config=m.MiniGridClipPPOConfig(
            clip_lambda=1e-5, clip_modality="text",
            apply_disturbances=True, disturbance_severity="MODERATE",
        ),
    )
    out = m.train(a, run_name=f"bench_cfg3_{int(time.time())}")
    ret = out["recent_returns"]
    _emit("cfg3_clip_ppo_doorkey_moderate_sps", out["sps"], "steps/s",
          {"mean_recent_return": round(float(sum(ret) / max(len(ret), 1)), 3)})


def config_4(args):  # Atari CLIP-PPO Breakout, image modality, frame stack
    from clip_ppo_tpu.cli import clip_ppo_atari as m

    a = m.Args(
        env_id="ALE/Breakout-v5", seed=args.seed,
        total_timesteps=args.total_timesteps or 100_000,
        capture_video=False, save_model=False, verbose=False,
        clip_config=m.AtariClipPPOConfig(clip_lambda=1e-5, clip_modality="image"),
    )
    out = m.train(a, run_name=f"bench_cfg4_{int(time.time())}")
    ret = out["recent_returns"]
    _emit("cfg4_clip_ppo_atari_sps", out["sps"], "steps/s",
          {"mean_recent_return": round(float(sum(ret) / max(len(ret), 1)), 3)})


def config_5(args):  # ViT-L/14 encoder under SEVERE disturbances (eval sweep)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_ppo_tpu.models import clip_utils
    from clip_ppo_tpu.ops import DisturbanceSeverity, resolve_params
    from clip_ppo_tpu.ops.disturbances import disturb

    params, cfg = clip_utils.load_clip_model("ViT-L/14")
    sev = resolve_params(DisturbanceSeverity.SEVERE)
    b = 256

    @jax.jit
    def sweep(p, frames, key):
        # params as an argument — closures would bake 1.6 GB of ViT-L/14
        # weights into the compiled program as constants.
        x = frames.astype(jnp.float32) / 255.0
        xd = disturb(x, key, sev, "batched")
        clean = clip_utils.encode_images(p, cfg, frames)
        dirty = clip_utils.encode_images(
            p, cfg, (jnp.clip(xd, 0, 1) * 255).astype(jnp.uint8)
        )
        cos = jnp.sum(clean * dirty, axis=-1)
        return cos.mean()

    frames = jax.random.randint(
        jax.random.PRNGKey(args.seed), (b, 84, 84, 3), 0, 255, jnp.uint8
    )
    cos = float(sweep(params, frames, jax.random.PRNGKey(1)))  # compile+run
    t0 = time.perf_counter()
    cos = float(sweep(params, frames, jax.random.PRNGKey(2)))
    dt = time.perf_counter() - t0
    _emit("cfg5_vitl14_severe_eval_fps", 2 * b / dt, "frames/s",
          {"mean_clean_dirty_cosine": round(cos, 4)})


def main() -> None:
    args = flags.parse(BenchConfigArgs)
    {1: config_1, 2: config_2, 3: config_3, 4: config_4, 5: config_5}[args.config](args)


if __name__ == "__main__":
    main()
