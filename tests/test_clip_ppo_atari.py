"""End-to-end smoke tests for the CLIP-PPO Atari entry point (tiny CLIP)."""

import glob
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
    monkeypatch.setattr(
        clip_utils, "load_clip_model", lambda *a, **k: (params, TINY_CLIP)
    )
    return params


def _args(tmp_path, **overrides):
    from clip_ppo_tpu.cli.clip_ppo_atari import Args, AtariClipPPOConfig

    clip_overrides = overrides.pop("clip", {})
    kwargs = dict(
        env_id="ALE/Breakout-v5",
        total_timesteps=32,
        num_envs=2,
        num_steps=8,
        num_minibatches=2,
        update_epochs=1,
        capture_video=False,
        verbose=False,
        model_path=str(tmp_path / "ckpt"),
        clip_config=AtariClipPPOConfig(**clip_overrides),
    )
    kwargs.update(overrides)
    return Args(**kwargs)


def _run(args, tmp_path, run_name, monkeypatch):
    from clip_ppo_tpu.cli import clip_ppo_atari

    monkeypatch.chdir(tmp_path)
    return clip_ppo_atari.train(args, run_name=run_name)


def test_image_modality_projected(tmp_path, monkeypatch, tiny_clip_loader):
    args = _args(tmp_path, clip={"clip_lambda": 1e-5, "clip_modality": "image"})
    out = _run(args, tmp_path, "a_img", monkeypatch)
    assert out["global_step"] == 32
    finals = glob.glob(str(tmp_path / "ckpt" / "*_final.ckpt"))
    assert len(finals) == 1
    with open(finals[0], "rb") as f:
        ckpt = pickle.load(f)
    # temporal_projection round-trips inside agent_state
    # (reference extra_models payload, `clip_ppo_atari.py:546,784`).
    assert "temporal_projection" in ckpt["agent_state"]
    assert ckpt["agent_state"]["temporal_projection"]["w"].shape == (2048, 512)


def test_image_projection_learns(tmp_path, monkeypatch, tiny_clip_loader):
    """The CLIP gradient must reach temporal_projection and ONLY it
    (`clip_ppo_atari.py:726-733`): with λ>0 its weights change; the check
    that latents are stop-gradient'd lives in the loss-topology test of
    test_ppo — here we confirm the projection actually trains."""
    from clip_ppo_tpu.cli import clip_ppo_atari

    args = _args(
        tmp_path,
        clip={"clip_lambda": 10.0, "clip_modality": "image"},  # huge λ → visible
    )
    monkeypatch.chdir(tmp_path)
    out = clip_ppo_atari.train(args, run_name="a_learn")
    finals = glob.glob(str(tmp_path / "ckpt" / "*_final.ckpt"))
    with open(finals[0], "rb") as f:
        ckpt = pickle.load(f)
    w = ckpt["agent_state"]["temporal_projection"]["w"]
    import jax.numpy as jnp
    import numpy as np

    from clip_ppo_tpu.models import init_agent_params

    init = init_agent_params(
        jax.random.PRNGKey(args.seed), 4, in_channels=4,
        with_temporal_projection=True,
    )
    assert not np.allclose(np.asarray(init["temporal_projection"]["w"]), w)


def test_text_modality(tmp_path, monkeypatch, tiny_clip_loader):
    args = _args(
        tmp_path,
        env_id="ALE/Pong-v5",
        clip={"clip_lambda": 1e-5, "clip_modality": "text"},
    )
    out = _run(args, tmp_path, "a_txt", monkeypatch)
    assert out["global_step"] == 32


def test_random_encoder_image(tmp_path, monkeypatch, tiny_clip_loader):
    args = _args(
        tmp_path,
        clip={
            "clip_lambda": 1e-5,
            "clip_modality": "image",
            "ablation_mode": AblationMode.RANDOM_ENCODER,
        },
    )
    out = _run(args, tmp_path, "a_rand", monkeypatch)
    assert out["global_step"] == 32


def test_frozen_clip_stack(tmp_path, monkeypatch, tiny_clip_loader):
    args = _args(
        tmp_path,
        clip={"clip_lambda": 0.0, "ablation_mode": AblationMode.FROZEN_CLIP},
    )
    out = _run(args, tmp_path, "a_frozen", monkeypatch)
    assert out["global_step"] == 32


def test_disturbances_stack_frames(tmp_path, monkeypatch, tiny_clip_loader):
    args = _args(
        tmp_path,
        clip={
            "clip_lambda": 1e-5,
            "clip_modality": "image",
            "apply_disturbances": True,
            "disturbance_severity": "SEVERE",
        },
    )
    out = _run(args, tmp_path, "a_dist", monkeypatch)
    assert out["global_step"] == 32
