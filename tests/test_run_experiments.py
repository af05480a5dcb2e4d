"""Orchestrator grid + flag translation (no subprocesses launched)."""

from clip_ppo_tpu.cli.run_experiments import (
    ExperimentConfig,
    _setup_main_experiments,
    build_command,
)
from clip_ppo_tpu.models.agent import AblationMode
from clip_ppo_tpu.ops.severity import DisturbanceSeverity


def test_grid_shape_matches_reference():
    """2 seeds × 3 envs × (3 PPO + 9 CLIP-PPO + 1 frozen) = 78 configs
    (`run_experiments.py:82-208`)."""
    exps = _setup_main_experiments()
    assert len(exps) == 2 * 3 * 13
    names = [e.run_name for e in exps]
    assert len(set(names)) == len(names)  # unique run names
    assert any("ALESeaquest-v5" in n for n in names)
    assert sum("PPOFROZENCLIP" in n for n in names) == 6
    lambdas = {e.clip_lambda for e in exps if "CLIPPPO" in e.run_name}
    assert lambdas == {1e-6, 1e-5, 1e-4}


def test_build_command_flag_translation():
    cfg = ExperimentConfig(
        run_name="s0_atari_X_CLIPPPO_MODERATE_image_l1e-05",
        seed=0,
        ablation_mode=AblationMode.NONE,
        clip_lambda=1e-5,
        apply_disturbances=True,
        disturbance_severity=DisturbanceSeverity.MODERATE,
        timesteps=100000,
        environment="atari",
        env_id="ALE/Breakout-v5",
    )
    cmd = build_command(cfg)
    joined = " ".join(cmd)
    assert "clip_ppo_tpu.cli.clip_ppo_atari" in joined
    assert "--clip-config.clip-lambda 1e-05" in joined
    assert "--clip-config.clip_modality image" in joined  # forced (ref :37)
    assert "--clip-config.apply-disturbances" in joined
    assert "--save-freq 250000" in joined

    cfg2 = ExperimentConfig(
        run_name="x", seed=1, ablation_mode=AblationMode.FROZEN_CLIP,
        clip_lambda=0.0, apply_disturbances=False,
        disturbance_severity=DisturbanceSeverity.NONE, timesteps=10,
        environment="minigrid", env_id="MiniGrid-Empty-16x16-v0",
    )
    cmd2 = build_command(cfg2)
    assert "clip_ppo_tpu.cli.clip_ppo_minigrid" in " ".join(cmd2)
    assert "--clip-config.apply-disturbances" not in " ".join(cmd2)


def test_parsed_by_target_cli():
    """Every generated command parses cleanly with the target CLI's Args."""
    from clip_ppo_tpu.cli.clip_ppo_atari import Args as AtariArgs
    from clip_ppo_tpu.utils import flags

    exps = [e for e in _setup_main_experiments() if e.environment == "atari"]
    cmd = build_command(exps[0])
    argv = cmd[3:]  # strip "python -m module"
    args = flags.parse(AtariArgs, argv)
    assert args.env_id == exps[0].env_id
    assert args.clip_config.clip_modality == "image"
    assert args.total_timesteps == exps[0].timesteps
