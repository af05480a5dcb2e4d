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


# -- episodic novelty (r5: --episodic-bonus, NGU-style first visit) ----------


def test_episodic_bonus_first_visit_and_reset_semantics():
    """Hand-built trace: bonus only on the first visit of a bucket within
    an episode; a done ENTERING a step clears that env's memory so the
    same bucket pays again in the next episode."""
    mem = ex.init_episodic_mem(2, 6)
    idx = jnp.asarray([
        [5, 9],
        [5, 9],   # repeat: no bonus
        [5, 9],   # env 0 resets this step -> 5 pays again; env 1 repeats
        [7, 9],   # new bucket for env 0; env 1 resets -> 9 pays again
    ], jnp.int32)
    dones = jnp.asarray([
        [0.0, 0.0],
        [0.0, 0.0],
        [1.0, 0.0],
        [0.0, 1.0],
    ], jnp.float32)
    mem2, r = ex.episodic_bonus(mem, idx, dones, beta=0.5)
    np.testing.assert_allclose(np.asarray(r), 0.5 * np.asarray([
        [1, 1],
        [0, 0],
        [1, 0],
        [1, 1],
    ], np.float32))
    # memory persists across rollout boundaries: same buckets, no dones
    _, r2 = ex.episodic_bonus(mem2, idx[:2], dones[:2] * 0, beta=0.5)
    np.testing.assert_allclose(np.asarray(r2), np.zeros((2, 2)))


def test_episodic_trainer_threads_memory_and_composes_with_global():
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2,
                    update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=3, exploration_bonus=0.01,
                 episodic_bonus=0.05)
    from clip_ppo_tpu.models import init_agent_params

    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    st = tr.init_state(params, 0)
    assert st.counts is not None and st.episodic_mem is not None
    assert st.episodic_mem.shape == (4, (1 << 18) >> 5)
    st, scalars, ep = tr.run_iteration(st, 1)
    logs, _ = tr.fetch_logs(scalars, ep)
    # first iteration: every step is globally AND episodically novel-ish;
    # the combined mean must exceed the global term alone could give
    assert logs["intrinsic_reward"] > 0.0
    assert np.asarray(st.episodic_mem).any(), "bits were set"


def test_episodic_only_no_global_table():
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2,
                    update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=2, episodic_bonus=0.05)
    from clip_ppo_tpu.models import init_agent_params

    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    st = tr.init_state(params, 0)
    assert st.counts is None and st.episodic_mem is not None
    st, scalars, ep = tr.run_iteration(st, 1)
    logs, _ = tr.fetch_logs(scalars, ep)
    assert logs["intrinsic_reward"] > 0.0


def test_episodic_dp2_mem_shards_with_envs():
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.parallel.mesh import make_mesh

    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2,
                    update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=2, episodic_bonus=0.05,
                 mesh=make_mesh(num_devices=2))
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    st = tr.init_state(params, 0)
    st, scalars, ep = tr.run_iteration(st, 1)
    logs, _ = tr.fetch_logs(scalars, ep)
    assert np.isfinite(logs["policy_loss"])
    assert logs["intrinsic_reward"] > 0.0


def test_bonus_decay_scales_and_reaches_zero():
    """--bonus-decay anneals the PAID intrinsic reward linearly with
    training progress while the count table keeps accumulating visits.

    Exact pin: from identical initial states the rollout is identical,
    so the decayed trainer's intrinsic mean at progress p must equal
    (1 - p) x the undecayed trainer's."""
    from clip_ppo_tpu.models.agent import init_agent_params

    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=1)
    tr_flat = Trainer(cfg, env, num_iterations=2, exploration_bonus=0.05)
    tr_dec = Trainer(cfg, env, num_iterations=2, exploration_bonus=0.05,
                     bonus_decay=1.0)
    # distinct param buffers per trainer: run_iteration donates its input
    # state, which would delete arrays shared by the other state
    s_flat = tr_flat.init_state(
        init_agent_params(jax.random.PRNGKey(0), env.num_actions), 0)
    s_dec = tr_dec.init_state(
        init_agent_params(jax.random.PRNGKey(0), env.num_actions), 0)

    # iteration 2 of 2: progress = (2-1)/2 = 0.5 -> factor 0.5
    _, sc_flat, _ = tr_flat.run_iteration(s_flat, 2)
    s_dec2, sc_dec, _ = tr_dec.run_iteration(s_dec, 2)
    flat = float(sc_flat["intrinsic_reward"])
    assert flat > 0.0
    np.testing.assert_allclose(
        float(sc_dec["intrinsic_reward"]), 0.5 * flat, rtol=1e-5)

    # past the anneal window the factor clips to 0 — no intrinsic paid,
    # but visits still land in the table
    before = int(jnp.sum(s_dec2.counts))
    s_dec3, sc_zero, _ = tr_dec.run_iteration(s_dec2, 3)
    assert float(sc_zero["intrinsic_reward"]) == 0.0
    assert int(jnp.sum(s_dec3.counts)) == before + cfg.num_steps * cfg.num_envs
