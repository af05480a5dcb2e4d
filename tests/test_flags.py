"""Tests for the tyro-compatible dataclass CLI (clip_ppo_tpu.utils.flags)."""

import dataclasses
import enum
from dataclasses import dataclass, field
from typing import Optional

import pytest

from clip_ppo_tpu.utils import flags


class Mode(enum.Enum):
    NONE = "NONE"
    FROZEN_CLIP = "FROZEN_CLIP"
    RANDOM_ENCODER = "RANDOM_ENCODER"


@dataclass
class Inner:
    clip_lambda: float = 1e-5
    clip_modality: str = "text"
    ablation_mode: Mode = Mode.NONE
    apply_disturbances: bool = False
    disturbance_severity: str = "MODERATE"


@dataclass
class Outer:
    exp_name: str = "exp"
    seed: int = 1
    capture_video: bool = True
    total_timesteps: int = 100_000
    learning_rate: float = 2.5e-4
    target_kl: Optional[float] = None
    run_name: Optional[str] = None
    clip_config: Inner = field(default_factory=Inner)


def test_defaults():
    args = flags.parse(Outer, [])
    assert args.seed == 1 and args.clip_config.clip_lambda == 1e-5


def test_reference_run_experiments_flag_style():
    # Exact flag spellings run_experiments.py emits (`run_experiments.py:37,50-59`).
    args = flags.parse(
        Outer,
        [
            "--seed", "42",
            "--run-name", "myrun",
            "--clip-config.ablation-mode", "FROZEN_CLIP",
            "--clip-config.clip-lambda", "0.0001",
            "--clip-config.disturbance-severity", "SEVERE",
            "--total-timesteps", "1000000",
            "--clip-config.clip_modality", "image",
            "--clip-config.apply-disturbances",
        ],
    )
    assert args.seed == 42
    assert args.run_name == "myrun"
    assert args.clip_config.ablation_mode == Mode.FROZEN_CLIP
    assert args.clip_config.clip_lambda == 1e-4
    assert args.clip_config.disturbance_severity == "SEVERE"
    assert args.total_timesteps == 1_000_000
    assert args.clip_config.clip_modality == "image"
    assert args.clip_config.apply_disturbances is True


def test_underscore_dash_equivalence():
    a = flags.parse(Outer, ["--learning_rate", "0.001"])
    b = flags.parse(Outer, ["--learning-rate", "0.001"])
    assert a.learning_rate == b.learning_rate == 0.001


def test_bool_negation_and_explicit():
    assert flags.parse(Outer, ["--no-capture-video"]).capture_video is False
    assert flags.parse(Outer, ["--capture-video", "false"]).capture_video is False
    assert flags.parse(Outer, ["--capture-video"]).capture_video is True


def test_optional_none_and_value():
    assert flags.parse(Outer, ["--target-kl", "None"]).target_kl is None
    assert flags.parse(Outer, ["--target-kl", "0.015"]).target_kl == 0.015


def test_equals_syntax():
    args = flags.parse(Outer, ["--seed=7", "--clip-config.clip-lambda=1e-6"])
    assert args.seed == 7 and args.clip_config.clip_lambda == 1e-6


def test_unknown_flag_errors():
    with pytest.raises(SystemExit):
        flags.parse(Outer, ["--does-not-exist", "1"])


def test_nested_default_isolation():
    a = flags.parse(Outer, ["--clip-config.clip-lambda", "0.5"])
    b = flags.parse(Outer, [])
    assert a.clip_config.clip_lambda == 0.5 and b.clip_config.clip_lambda == 1e-5


def test_vars_roundtrip_for_logging():
    # Entry points log `vars(args)`; dataclasses must support asdict.
    args = flags.parse(Outer, [])
    d = dataclasses.asdict(args)
    assert d["clip_config"]["clip_modality"] == "text"
