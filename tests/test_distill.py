"""Structured frozen-tower distillation (FROZEN_CLIP learnability)."""

import numpy as np

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import distill
from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.model import init_clip_params

# embed_dim 512: the FROZEN_CLIP feature width must match the agent's
# 512-wide actor/critic heads (`clip_ppo_minigrid.py:219-227`).
TINY = CLIPConfig(
    embed_dim=512, image_size=224, patch_size=56, vision_width=64,
    vision_layers=1, vision_heads=2, context_length=8, vocab_size=64,
    text_width=32, text_heads=1, text_layers=1,
)


def test_pca_teacher_separates_states():
    """PCA features are linear in the image → different agent positions
    give different features (the information a random frozen ViT loses)."""
    env = JaxVectorEnv("MiniGrid-Empty-8x8-v0", 2)
    obs = distill.collect_random_observations(env, jax.random.PRNGKey(0), 32)
    teacher, stats = distill.pixel_pca_teacher(obs, 32)
    feats = np.asarray(teacher(obs))
    assert feats.shape == (64, 32)
    # whitened: per-component variance ≈ 1 for the leading components
    v = feats.var(axis=0)
    assert 0.5 < float(v[0]) < 2.0
    # distinct observations map to distinct features
    d = np.linalg.norm(feats[0] - feats[-1])
    assert np.isfinite(d)


def test_distillation_reduces_mse_and_moves_features():
    env = JaxVectorEnv("MiniGrid-Empty-8x8-v0", 2)
    obs = distill.collect_random_observations(env, jax.random.PRNGKey(1), 32)
    params = init_clip_params(jax.random.PRNGKey(0), TINY)

    teacher, _ = distill.pixel_pca_teacher(obs, TINY.embed_dim)
    targets = teacher(obs)

    from clip_ppo_tpu.models.clip import model as clip_model_mod
    from clip_ppo_tpu.ops.resize import preprocess_for_clip

    def student_mse(p):
        x = preprocess_for_clip(obs.astype(jnp.float32) / 255.0, TINY.image_size)
        feats = clip_model_mod.encode_image(p, TINY, x, jnp.bfloat16)
        return float(jnp.mean((feats - targets) ** 2))

    before = student_mse(params)
    distilled = distill.distill_visual_tower(
        jax.random.PRNGKey(2), params, TINY, obs, steps=150, batch_size=32,
    )
    after = student_mse(distilled)
    assert after < before * 0.5, (before, after)
    # text tower untouched (stays frozen-random, never distilled)
    assert np.allclose(
        np.asarray(params["text"]["token_embedding"]),
        np.asarray(distilled["text"]["token_embedding"]),
    )


def test_cli_flag_runs_frozen_clip_with_structured_init(tmp_path, monkeypatch):
    from clip_ppo_tpu.cli import clip_ppo_minigrid as cpm
    from clip_ppo_tpu.models import clip_utils
    from clip_ppo_tpu.models.agent import AblationMode

    tiny_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    monkeypatch.setattr(
        clip_utils, "load_clip_model", lambda *a, **k: (tiny_params, TINY)
    )
    monkeypatch.chdir(tmp_path)
    args = cpm.Args(
        env_id="MiniGrid-Empty-5x5-v0",
        total_timesteps=32, num_envs=2, num_steps=8,
        num_minibatches=2, update_epochs=1,
        capture_video=False, verbose=False, save_model=False,
        clip_config=cpm.MiniGridClipPPOConfig(
            ablation_mode=AblationMode.FROZEN_CLIP,
            structured_frozen_init=True,
        ),
    )
    out = cpm.train(args, run_name="frozen_structured")
    assert out["global_step"] == 32


def test_cli_flag_distills_for_image_modality(tmp_path, monkeypatch):
    """structured_frozen_init also distills the tower when the CLIP loss
    itself is active (image modality) — so the alignment target is
    non-degenerate without pretrained weights — not only for the
    FROZEN_CLIP trunk ablation."""
    from clip_ppo_tpu.cli import clip_ppo_minigrid as cpm
    from clip_ppo_tpu.models import clip_utils, distill

    tiny_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    monkeypatch.setattr(
        clip_utils, "load_clip_model", lambda *a, **k: (tiny_params, TINY)
    )
    calls = []
    real = distill.distill_visual_tower

    def spy(*a, **k):
        calls.append(k.get("steps"))
        return real(*a, **k)

    monkeypatch.setattr(distill, "distill_visual_tower", spy)
    monkeypatch.chdir(tmp_path)
    args = cpm.Args(
        env_id="MiniGrid-Empty-5x5-v0",
        total_timesteps=32, num_envs=2, num_steps=8,
        num_minibatches=2, update_epochs=1,
        capture_video=False, verbose=False, save_model=False,
        clip_config=cpm.MiniGridClipPPOConfig(
            clip_lambda=1e-5, clip_modality="image",
            structured_frozen_init=True,
        ),
    )
    out = cpm.train(args, run_name="image_structured")
    assert out["global_step"] == 32
    assert calls, "distill_visual_tower was not invoked for image modality"
