"""One-command pretrained-weights robustness experiment.

The reference's semantic claim — CLIP alignment improves robustness to
visual disturbances (`/root/reference/CLAUDE.md:465-479`, DoorKey-6x6
HARD, CLIP-PPO λ=1e-5) — can only be tested with *real* CLIP weights.
None ship in this zero-egress image, so this script is the readiness
drill: the moment OpenAI's ``ViT-B-32.pt`` exists under
``$CLIP_PPO_CHECKPOINT_DIR`` (or ``~/.cache/clip``), one command runs the
DoorKey robustness pair (clean + disturbed CLIP-PPO) with pretrained
towers and reports the robustness index:

    python -m clip_ppo_tpu.cli.run_pretrained_robustness

Flags mirror the reference experiment design (`run_experiments.py:82-208`
per-severity pairs; the MiniGrid flagship claim uses DoorKey-6x6, text
modality, λ=1e-5, HARD). ``--synthesize-checkpoint`` writes a random-
weight archive in OpenAI's exact format first — a full dress rehearsal of
the loader path when no real weights are available.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from clip_ppo_tpu.utils import flags


@dataclass
class Args:
    env_id: str = "MiniGrid-DoorKey-6x6-v0"
    """environment for the robustness pair"""
    seed: int = 0
    """seed shared by both runs"""
    total_timesteps: int = 1500000
    """timesteps per run (the reference claim used 1.5M on DoorKey)"""
    clip_model: str = "ViT-B/32"
    """CLIP variant; its checkpoint must be discoverable"""
    clip_lambda: float = 0.00001
    """CLIP alignment coefficient (reference claim value)"""
    clip_modality: str = "text"
    """alignment modality (reference MiniGrid default)"""
    disturbance_severity: str = "HARD"
    """severity of the disturbed run"""
    num_envs: int = 8
    """parallel environments"""
    num_steps: int = 128
    """rollout steps per iteration"""
    run_prefix: str = "pretrained"
    """prefix for the two run names"""
    tp: int = 1
    """tensor-parallel degree for the CLIP encode (image modality; the
    ViT-L/14 sweep load, SURVEY §2c) — passed through to the training
    runs"""
    num_devices: int = 1
    """device count for the (dp, tp) mesh (0 = all available)"""
    synthesize_checkpoint: bool = False
    """write a random-weight OpenAI-format archive first (loader drill
    when no real checkpoint exists)"""
    checkpoint_dir: str = ""
    """where to synthesize (defaults to $CLIP_PPO_CHECKPOINT_DIR)"""


def main(args: Args | None = None) -> dict:
    args = args or flags.parse(Args)

    from clip_ppo_tpu.models.clip.loader import find_checkpoint

    if args.synthesize_checkpoint:
        from clip_ppo_tpu.models.clip.synth_checkpoint import (
            write_fake_openai_checkpoint,
        )

        ckpt_dir = args.checkpoint_dir or os.environ.get(
            "CLIP_PPO_CHECKPOINT_DIR", ""
        )
        if not ckpt_dir:
            raise SystemExit(
                "--synthesize-checkpoint needs --checkpoint-dir or "
                "$CLIP_PPO_CHECKPOINT_DIR"
            )
        os.makedirs(ckpt_dir, exist_ok=True)
        fname = args.clip_model.replace("/", "-") + ".pt"
        path = write_fake_openai_checkpoint(
            os.path.join(ckpt_dir, fname), args.clip_model, seed=args.seed
        )
        os.environ["CLIP_PPO_CHECKPOINT_DIR"] = ckpt_dir
        print(f"Synthesized OpenAI-format checkpoint: {path}")

    ckpt = find_checkpoint(args.clip_model)
    if ckpt is None:
        raise SystemExit(
            f"No {args.clip_model} checkpoint found. Place OpenAI's "
            f"{args.clip_model.replace('/', '-')}.pt under "
            "$CLIP_PPO_CHECKPOINT_DIR or ~/.cache/clip, or pass "
            "--synthesize-checkpoint for a loader drill with random weights."
        )
    print(f"Using CLIP checkpoint: {ckpt}")

    from clip_ppo_tpu.cli import clip_ppo_minigrid as cpm

    def run(disturbed: bool) -> str:
        tag = "disturbed" if disturbed else "clean"
        run_name = (
            f"{args.run_prefix}_{args.env_id}_{tag}_s{args.seed}"
        )
        targs = cpm.Args(
            env_id=args.env_id,
            seed=args.seed,
            total_timesteps=args.total_timesteps,
            num_envs=args.num_envs,
            num_steps=args.num_steps,
            tp=args.tp,
            num_devices=args.num_devices,
            capture_video=False,
            verbose=False,
            clip_config=cpm.MiniGridClipPPOConfig(
                clip_lambda=args.clip_lambda,
                clip_model=args.clip_model,
                clip_modality=args.clip_modality,
                apply_disturbances=disturbed,
                disturbance_severity=args.disturbance_severity,
            ),
        )
        print(f"=== {tag} run: {run_name} ===")
        cpm.train(targs, run_name=run_name)
        return f"runs/{run_name}"

    clean_dir = run(disturbed=False)
    disturbed_dir = run(disturbed=True)

    from clip_ppo_tpu.metrics.calculate_metrics import (
        compute_robustness_index_over_time,
    )

    df = compute_robustness_index_over_time(clean_dir, disturbed_dir)
    result = {
        "clean_run": clean_dir,
        "disturbed_run": disturbed_dir,
        "final_ri": float(df["robustness_index"].iloc[-1]),
        "mean_ri": float(df["robustness_index"].mean()),
        "checkpoint": ckpt,
    }
    print(
        f"DoorKey robustness pair complete: final RI "
        f"{result['final_ri']:.3f}, mean RI {result['mean_ri']:.3f}"
    )
    return result


if __name__ == "__main__":
    main()
