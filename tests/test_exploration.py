"""Count-based exploration bonus (SimHash buckets) — beyond-reference
(`train/exploration.py`; the reference has no intrinsic motivation and
its sparse-reward families are honest negatives, docs/PERFORMANCE.md).

Pins: bucket determinism and discrimination, count accumulation across
iterations, the 1/sqrt(N) decay, reward shaping reaching GAE while the
logged episode returns stay extrinsic-only, and end-to-end CLI training
with the gated charts/intrinsic_reward tag.
"""

import glob
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.train import PPOConfig, Trainer
from clip_ppo_tpu.train import exploration as ex


def test_hash_is_deterministic_and_discriminates():
    proj = ex.make_projection(jax.random.PRNGKey(0), 147, 18)
    obs = jax.random.randint(
        jax.random.PRNGKey(1), (64, 7, 7, 3), 0, 11, jnp.uint8
    )
    idx1 = ex.hash_obs(proj, obs)
    idx2 = ex.hash_obs(proj, obs)
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
    assert idx1.dtype == jnp.int32
    assert int(idx1.min()) >= 0 and int(idx1.max()) < (1 << 18)
    # random distinct views should land in (mostly) distinct buckets
    assert len(np.unique(np.asarray(idx1))) > 55

    # identical observations share a bucket
    same = jnp.tile(obs[:1], (4, 1, 1, 1))
    assert len(np.unique(np.asarray(ex.hash_obs(proj, same)))) == 1


def test_hash_handles_leading_batch_axes():
    proj = ex.make_projection(jax.random.PRNGKey(0), 147, 12)
    obs = jax.random.randint(
        jax.random.PRNGKey(1), (5, 4, 7, 7, 3), 0, 11, jnp.uint8
    )
    idx = ex.hash_obs(proj, obs)
    assert idx.shape == (5, 4)
    flat = ex.hash_obs(proj, obs.reshape(20, 7, 7, 3))
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), np.asarray(flat))


def test_count_bonus_decays_with_visits():
    counts = ex.init_counts(10)
    # one novel bucket visited 1x, another 4x, in one rollout
    idx = jnp.asarray([3, 7, 7, 7, 7], jnp.int32)
    counts, r = ex.count_bonus(counts, idx, beta=1.0)
    assert int(counts[3]) == 1 and int(counts[7]) == 4
    np.testing.assert_allclose(float(r[0]), 1.0)          # 1/sqrt(1)
    np.testing.assert_allclose(np.asarray(r[1:]), 0.5)    # 1/sqrt(4)
    # revisits next rollout pay less
    counts, r2 = ex.count_bonus(counts, jnp.asarray([3], jnp.int32), 1.0)
    np.testing.assert_allclose(float(r2[0]), 1.0 / np.sqrt(2.0))


def test_trainer_threads_counts_and_shapes_rewards():
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=4, exploration_bonus=0.05)
    from clip_ppo_tpu.models.agent import init_agent_params

    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    state = tr.init_state(params, 0)
    assert state.counts is not None
    state, scalars, ep = tr.run_iteration(state, 1)
    # every visited bucket counted exactly once per step
    assert int(jnp.sum(state.counts)) == cfg.num_steps * cfg.num_envs
    assert float(scalars["intrinsic_reward"]) > 0.0
    # counts persist and keep growing across iterations (the 1/sqrt(N)
    # decay itself is pinned deterministically in
    # test_count_bonus_decays_with_visits — the mean bonus across
    # iterations is NOT monotone, new buckets are discovered)
    state, scalars2, _ = tr.run_iteration(state, 2)
    assert int(jnp.sum(state.counts)) == 2 * cfg.num_steps * cfg.num_envs
    assert float(scalars2["intrinsic_reward"]) > 0.0
    # episode stats report the raw env return (sparse; bounded by 1),
    # not the shaped reward — Empty's extrinsic return can never exceed 1
    rets = np.asarray(ep["episode_return"])[np.asarray(ep["done_mask"])]
    assert rets.size == 0 or float(rets.max()) <= 1.0


def test_vanilla_trainer_has_no_counts():
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=2)
    from clip_ppo_tpu.models.agent import init_agent_params

    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    state = tr.init_state(params, 0)
    assert state.counts is None
    state, scalars, _ = tr.run_iteration(state, 1)
    assert float(scalars["intrinsic_reward"]) == 0.0


def test_split_path_packs_intrinsic_scalar():
    """Regression: the split (text-modality) halves must emit the fixed
    SCALAR_KEYS set — _pack_logs asserted on a missing intrinsic_reward
    for ANY split-path run after the bonus landed (bonus on or off)."""
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=1)
    from clip_ppo_tpu.models.agent import init_agent_params

    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)

    # bonus OFF (the reported failure) — fetch_logs exercises _pack_logs
    tr = Trainer(cfg, env, num_iterations=2)
    state = tr.init_state(params, 0)
    state, data, ep, _desc = tr.run_rollout_half(state)
    state, scalars = tr.run_update_half(state, data, 1, None)
    scalars_np, _ = tr.fetch_logs(scalars, ep)
    assert scalars_np["intrinsic_reward"] == 0.0

    # bonus ON — shaping and counts thread through the split halves too
    # (fresh params: the first trainer's donated dispatch consumed them)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    tr = Trainer(cfg, env, num_iterations=2, exploration_bonus=0.05)
    state = tr.init_state(params, 0)
    state, data, ep, _desc = tr.run_rollout_half(state)
    state, scalars = tr.run_update_half(state, data, 1, None)
    scalars_np, _ = tr.fetch_logs(scalars, ep)
    assert scalars_np["intrinsic_reward"] > 0.0
    assert int(jnp.sum(state.counts)) == cfg.num_steps * cfg.num_envs


def test_cli_exploration_trains_and_logs_tag(tmp_path):
    from clip_ppo_tpu.cli import ppo_minigrid

    out = ppo_minigrid.train(
        ppo_minigrid.Args(
            env_id="MiniGrid-Empty-5x5-v0", seed=5, total_timesteps=2048,
            num_steps=32, capture_video=False, exploration_bonus=0.02,
            model_path=str(tmp_path), save_freq=10**9,
        ),
        run_name="test_exploration_cli",
    )
    assert out["global_step"] == 2048
    from tensorboard.backend.event_processing import event_accumulator

    d = glob.glob("runs/test_exploration_cli")[0]
    ea = event_accumulator.EventAccumulator(d)
    ea.Reload()
    tags = ea.Tags()["scalars"]
    assert "charts/intrinsic_reward" in tags
    vals = [s.value for s in ea.Scalars("charts/intrinsic_reward")]
    assert vals[0] > 0.0
    shutil.rmtree("runs/test_exploration_cli", ignore_errors=True)
