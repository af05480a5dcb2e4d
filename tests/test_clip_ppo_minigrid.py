"""End-to-end smoke tests for the CLIP-PPO MiniGrid entry point.

Uses a tiny CLIP tower (monkeypatched loader) so the full text / image /
random / frozen paths run in seconds on the CPU test mesh while exercising
the real code: rollout, disturbances, description generation, tokenizer,
batched text encode, gated cosine loss with λ warmup, checkpoint/resume.
"""

import glob
import os
import pickle

import numpy as np
import pytest

import jax

from clip_ppo_tpu.models import clip_utils
from clip_ppo_tpu.models.agent import AblationMode
from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.model import init_clip_params

TINY_CLIP = CLIPConfig(
    embed_dim=512,
    image_size=224,
    patch_size=56,
    vision_width=64,
    vision_layers=1,
    vision_heads=2,
    context_length=77,
    vocab_size=49408,
    text_width=64,
    text_heads=2,
    text_layers=1,
)


@pytest.fixture
def tiny_clip_loader(monkeypatch):
    params = init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)

    def fake_load(name="ViT-B/32", *a, **k):
        return params, TINY_CLIP

    monkeypatch.setattr(clip_utils, "load_clip_model", fake_load)
    return params


def _args(tmp_path, **overrides):
    from clip_ppo_tpu.cli.clip_ppo_minigrid import Args, MiniGridClipPPOConfig

    clip_overrides = overrides.pop("clip", {})
    kwargs = dict(
        env_id="MiniGrid-Empty-16x16-v0",
        total_timesteps=64,
        num_envs=2,
        num_steps=16,
        num_minibatches=2,
        update_epochs=1,
        capture_video=False,
        verbose=False,
        model_path=str(tmp_path / "ckpt"),
        clip_config=MiniGridClipPPOConfig(**clip_overrides),
    )
    kwargs.update(overrides)
    return Args(**kwargs)


def _run(args, tmp_path, run_name):
    import os

    from clip_ppo_tpu.cli import clip_ppo_minigrid

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return clip_ppo_minigrid.train(args, run_name=run_name)
    finally:
        os.chdir(cwd)


def test_text_modality_runs(tmp_path, tiny_clip_loader):
    args = _args(tmp_path, clip={"clip_lambda": 1e-5, "clip_modality": "text"})
    out = _run(args, tmp_path, "t_text")
    assert out["global_step"] == 64
    # run dir with event file + checkpoints written
    assert glob.glob(str(tmp_path / "runs" / "t_text" / "events*"))
    finals = glob.glob(str(tmp_path / "ckpt" / "*_final.ckpt"))
    assert len(finals) == 1
    with open(finals[0], "rb") as f:
        ckpt = pickle.load(f)
    assert ckpt["training_complete"] is True
    assert ckpt["args"]["clip_config"]["clip_lambda"] == 1e-5


def test_image_modality_fused(tmp_path, tiny_clip_loader):
    args = _args(tmp_path, clip={"clip_lambda": 1e-5, "clip_modality": "image"})
    out = _run(args, tmp_path, "t_img")
    assert out["global_step"] == 64


def test_random_encoder_ablation(tmp_path, tiny_clip_loader):
    args = _args(
        tmp_path,
        clip={
            "clip_lambda": 1e-5,
            "clip_modality": "text",
            "ablation_mode": AblationMode.RANDOM_ENCODER,
        },
    )
    out = _run(args, tmp_path, "t_rand")
    assert out["global_step"] == 64


def test_frozen_clip_ablation(tmp_path, tiny_clip_loader):
    args = _args(
        tmp_path,
        clip={"clip_lambda": 0.0, "ablation_mode": AblationMode.FROZEN_CLIP},
    )
    out = _run(args, tmp_path, "t_frozen")
    assert out["global_step"] == 64


def test_disturbances_and_severity_tag(tmp_path, tiny_clip_loader):
    args = _args(
        tmp_path,
        clip={
            "clip_lambda": 1e-5,
            "clip_modality": "text",
            "apply_disturbances": True,
            "disturbance_severity": "HARD",
        },
    )
    _run(args, tmp_path, "t_dist")
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "runs" / "t_dist"))
    acc.Reload()
    tags = acc.Tags()
    text_tags = tags.get("tensors", []) + tags.get("text", [])
    assert any("config/disturbance_severity" in t for t in text_tags)


def test_resume(tmp_path, tiny_clip_loader):
    args = _args(
        tmp_path,
        total_timesteps=64,
        save_freq=32,
        clip={"clip_lambda": 1e-5, "clip_modality": "text"},
    )
    _run(args, tmp_path, "t_resume_a")
    latest = glob.glob(str(tmp_path / "ckpt" / "*latest.ckpt"))
    assert latest
    args2 = _args(
        tmp_path,
        total_timesteps=64,
        save_freq=32,
        resume_checkpoint=latest[0],
        clip={"clip_lambda": 1e-5, "clip_modality": "text"},
    )
    out = _run(args2, tmp_path, "t_resume_b")
    # resumed from iteration 1 of 2 → only iteration 2 runs
    assert out["global_step"] == 64


def test_describe_rollout_format():
    from clip_ppo_tpu.envs import JaxVectorEnv
    from clip_ppo_tpu.envs.minigrid import core

    env = JaxVectorEnv("MiniGrid-Empty-16x16-v0", 2)
    state, _ = env.reset_fn(jax.random.PRNGKey(0))
    descs = core.describe_rollout(
        np.asarray(state.env.grid),
        np.asarray(state.env.agent_pos)[None],
        np.asarray(state.env.agent_dir)[None],
    )
    assert len(descs) == 2
    # Exact reference format (`clip_ppo_minigrid.py:164-211`): first three
    # x-major objects on a bordered grid are the (0,0..2) border walls.
    assert descs[0] == (
        "agent at (1,1) facing right, objects: wall at (0,0), "
        "wall at (0,1), wall at (0,2)"
    )


def test_text_modality_on_new_family(tmp_path, tiny_clip_loader):
    """Text-modality CLIP-PPO on a round-3 family (MemoryS7): the
    symbolic descriptions, the table constancy guard, and the training
    loop are family-generic — pinned end-to-end through the CLI.
    (MemoryS7 keeps the precomputed table small: 7·7·4 descriptions.)"""
    args = _args(tmp_path, env_id="MiniGrid-MemoryS7-v0",
                 clip={"clip_lambda": 1e-5, "clip_modality": "text"})
    out = _run(args, tmp_path, "t_text_memory")
    assert out["global_step"] == 64
    assert glob.glob(str(tmp_path / "runs" / "t_text_memory" / "events*"))
