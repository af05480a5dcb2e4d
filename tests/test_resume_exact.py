"""Bit-identical checkpoint resume for the extended TrainState.

VERDICT r3 §5.4 regression: the r3 TrainState grew two leaves — the
SimHash visit-count table (``--exploration-bonus``) and the LSTM carry
(``--recurrent``) — that the checkpoint payload ignored, so a resumed run
silently reset exploration counts / dropped mid-episode memory.

``ppo_minigrid`` checkpoints now carry EVERY TrainState leaf (counts,
LSTM carry, and the env/loop state: vec_state, obs, next_done, PRNG key)
through the reference's own ``extra_models`` extension mechanism
(`shared/checkpoint_utils.py:21-29`), and ``--resume-checkpoint``
restores them. These tests interrupt a run at its midpoint checkpoint,
resume it, and assert the final checkpoint payload is bit-identical to
the uninterrupted run's — parameters, optimizer state, counts table,
LSTM carry, env state, and global_step.
"""

import glob
import pickle
import shutil

import numpy as np
import pytest

import jax

from clip_ppo_tpu.cli import ppo_minigrid

# 4 iterations of 4 envs x 16 steps; midpoint checkpoint after iteration 2
# ((3-1)*64 % 128 == 0 at the dispatched frontier).
BATCH = 64
STEPS = 4 * BATCH
SAVE_FREQ = 2 * BATCH


def _args(tmp_path, **kw):
    return ppo_minigrid.Args(
        env_id="MiniGrid-Empty-5x5-v0", seed=3, num_envs=4, num_steps=16,
        total_timesteps=STEPS, save_freq=SAVE_FREQ, capture_video=False,
        save_model=True, model_path=str(tmp_path), **kw,
    )


def _tree_equal(a, b, path=""):
    # The payload holds registered-dataclass pytrees (VecState/EnvState)
    # with numpy leaves — flatten both and compare leaf-by-leaf.
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"{path}: treedef {ta} != {tb}"
    for i, (x, y) in enumerate(zip(la, lb)):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=f"{path}[leaf {i}]"
        )


@pytest.mark.parametrize(
    "variant",
    [
        dict(exploration_bonus=0.02),
        dict(recurrent=True, lstm_hidden=32),
        dict(exploration_bonus=0.02, recurrent=True, lstm_hidden=32),
    ],
    ids=["eb", "recurrent", "eb+recurrent"],
)
def test_resume_is_bit_identical(tmp_path, variant):
    try:
        ppo_minigrid.train(_args(tmp_path, **variant), run_name="resume_full")
        mid = str(tmp_path / f"resume_full_step_{SAVE_FREQ}.ckpt")
        ppo_minigrid.train(
            _args(tmp_path, resume_checkpoint=mid, **variant),
            run_name="resume_half",
        )
        with open(tmp_path / "resume_full_final.ckpt", "rb") as f:
            full = pickle.load(f)
        with open(tmp_path / "resume_half_final.ckpt", "rb") as f:
            resumed = pickle.load(f)

        assert full["global_step"] == resumed["global_step"] == STEPS
        assert full["iteration"] == resumed["iteration"]
        _tree_equal(full["agent_state"], resumed["agent_state"], "agent")
        _tree_equal(full["optimizer_state"], resumed["optimizer_state"], "opt")
        _tree_equal(full["loop_state"], resumed["loop_state"], "loop")
        if variant.get("exploration_bonus"):
            assert "counts_state" in full
            # half the run's transitions are already counted at the midpoint;
            # a silent reset (the r3 bug) would halve the total again
            assert int(np.sum(resumed["counts_state"])) == STEPS
            _tree_equal(full["counts_state"], resumed["counts_state"], "counts")
        if variant.get("recurrent"):
            assert "lstm_carry_state" in full
            _tree_equal(
                full["lstm_carry_state"], resumed["lstm_carry_state"], "carry"
            )
    finally:
        for d in glob.glob("runs/resume_full") + glob.glob("runs/resume_half"):
            shutil.rmtree(d, ignore_errors=True)


def test_resume_without_extras_falls_back(tmp_path):
    """A checkpoint missing the new payload keys (older format, or written
    by a CLI that doesn't store loop state) still resumes — params/opt only,
    reference semantics (`checkpoint_utils.py:49-80`)."""
    ppo_minigrid.train(_args(tmp_path), run_name="resume_old")
    try:
        mid = tmp_path / f"resume_old_step_{SAVE_FREQ}.ckpt"
        with open(mid, "rb") as f:
            ck = pickle.load(f)
        for k in list(ck):
            if k.endswith("_state") and k not in ("agent_state", "optimizer_state"):
                del ck[k]
        with open(mid, "wb") as f:
            pickle.dump(ck, f)
        out = ppo_minigrid.train(
            _args(tmp_path, resume_checkpoint=str(mid)), run_name="resume_old2"
        )
        assert out["global_step"] == STEPS
    finally:
        for d in glob.glob("runs/resume_old*"):
            shutil.rmtree(d, ignore_errors=True)
