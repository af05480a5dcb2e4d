"""Pretrained-weights readiness drill (VERDICT r1 item 5): the
one-command robustness-pair script, end-to-end with a synthesized
full-size OpenAI-format ViT-B/32 archive standing in for real weights."""

import os

import pytest

torch = pytest.importorskip("torch")


def test_drill_refuses_without_checkpoint(tmp_path, monkeypatch):
    from clip_ppo_tpu.cli.run_pretrained_robustness import Args, main

    monkeypatch.setenv("CLIP_PPO_CHECKPOINT_DIR", str(tmp_path / "empty"))
    monkeypatch.setenv("HOME", str(tmp_path))
    with pytest.raises(SystemExit):
        main(Args(total_timesteps=32, num_envs=2, num_steps=8))


def test_drill_end_to_end_with_synthesized_weights(tmp_path, monkeypatch):
    """--synthesize-checkpoint → full-size loader path → DoorKey pair →
    robustness index. Exactly what will run with real weights."""
    from clip_ppo_tpu.cli.run_pretrained_robustness import Args, main

    monkeypatch.chdir(tmp_path)
    # Empty-5x5 truncates at 100 per-env steps, so 13 iterations of 8
    # steps × 2 envs guarantee finished episodes in both runs' TB logs
    # (the RI needs episodic returns).
    result = main(Args(
        env_id="MiniGrid-Empty-5x5-v0",
        total_timesteps=224, num_envs=2, num_steps=8,
        synthesize_checkpoint=True,
        checkpoint_dir=str(tmp_path / "ckpts"),
        run_prefix="drill",
    ))
    assert os.path.exists(result["checkpoint"])
    assert os.path.isdir(result["clean_run"])
    assert os.path.isdir(result["disturbed_run"])
    # RI is computable from the pair's TB logs (value itself is noise at
    # 32 steps — presence and finiteness are the contract here)
    import numpy as np

    assert np.isfinite(result["final_ri"]) and np.isfinite(result["mean_ri"])
