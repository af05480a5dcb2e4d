"""Cross-env checkpoint resume (the curriculum mechanism,
benchmarks/s13_curriculum.py): a full-TrainState checkpoint saved on one
env id resumes on a DIFFERENT env id with matching state shapes —
MemoryS13Random → MemoryS13 (both 13×13, same action/obs spaces). The
restored in-flight episodes carry the old env's layouts until they
drain; autoreset then generates the new env's layouts (the trainer's
params are the single source of reset truth)."""

import shutil

import numpy as np

import jax

from clip_ppo_tpu.cli import ppo_minigrid


def test_cross_env_resume_continues_training(tmp_path):
    args1 = ppo_minigrid.Args(
        env_id="MiniGrid-MemoryS13Random-v0", seed=0,
        total_timesteps=512, num_envs=4, num_steps=32,
        num_minibatches=2, update_epochs=1, capture_video=False,
        recurrent=True, ent_coef=0.001,
        save_model=True, save_freq=10**12, model_path=str(tmp_path),
    )
    out1 = ppo_minigrid.train(args1, run_name="t_curr_stage1")
    assert out1["global_step"] == 512
    ckpt = tmp_path / "t_curr_stage1_final.ckpt"
    assert ckpt.exists()

    args2 = ppo_minigrid.Args(
        env_id="MiniGrid-MemoryS13-v0", seed=0,
        total_timesteps=1024, num_envs=4, num_steps=32,
        num_minibatches=2, update_epochs=1, capture_video=False,
        recurrent=True, ent_coef=0.001, save_model=False,
        resume_checkpoint=str(ckpt),
    )
    out2 = ppo_minigrid.train(args2, run_name="t_curr_stage2")
    # resumed at iteration 5, ran 4 more to num_iterations=8
    assert out2["global_step"] == 1024
    for run in ("t_curr_stage1", "t_curr_stage2"):
        shutil.rmtree(f"runs/{run}", ignore_errors=True)


def test_cross_env_resume_restores_params(tmp_path):
    """The stage-2 starting params equal the stage-1 final checkpoint's
    (the whole point of the curriculum)."""
    import pickle

    args1 = ppo_minigrid.Args(
        env_id="MiniGrid-MemoryS13Random-v0", seed=1,
        total_timesteps=256, num_envs=4, num_steps=32,
        num_minibatches=2, update_epochs=1, capture_video=False,
        recurrent=True, save_model=True, save_freq=10**12,
        model_path=str(tmp_path),
    )
    ppo_minigrid.train(args1, run_name="t_curr_p1")
    ckpt = tmp_path / "t_curr_p1_final.ckpt"
    with open(ckpt, "rb") as f:
        saved = pickle.load(f)

    # resume for ZERO additional iterations: total == stage-1 total, so
    # the loop body never runs and the final state must equal the
    # checkpoint's exactly
    args2 = ppo_minigrid.Args(
        env_id="MiniGrid-MemoryS13-v0", seed=1,
        total_timesteps=256, num_envs=4, num_steps=32,
        num_minibatches=2, update_epochs=1, capture_video=False,
        recurrent=True, save_model=True, save_freq=10**12,
        model_path=str(tmp_path), resume_checkpoint=str(ckpt),
    )
    ppo_minigrid.train(args2, run_name="t_curr_p2")
    with open(tmp_path / "t_curr_p2_final.ckpt", "rb") as f:
        resaved = pickle.load(f)
    a = jax.tree_util.tree_leaves(saved["agent_state"])
    b = jax.tree_util.tree_leaves(resaved["agent_state"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for run in ("t_curr_p1", "t_curr_p2"):
        shutil.rmtree(f"runs/{run}", ignore_errors=True)
