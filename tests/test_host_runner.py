"""HostTrainer: PPO over host-API envs (the ALE adapter's training path).

Driven with the pure-JAX envs' host API standing in for the emulator —
same reset/step/infos contract as ALEVectorEnv.
"""

import numpy as np

import jax

from clip_ppo_tpu.envs import AtariVectorEnv, JaxVectorEnv
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import HostTrainer, PPOConfig


def test_host_trainer_minigrid():
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    cfg = PPOConfig(num_envs=2, num_steps=16, num_minibatches=2, update_epochs=1)
    tr = HostTrainer(cfg, env, num_iterations=3)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    st = tr.init_state(params, seed=0)
    p0 = np.asarray(st.params["actor"]["w"]).copy()
    total_eps = 0
    for it in range(1, 4):
        st, scalars, episodes = tr.run_iteration(st, it)
        total_eps += len(episodes)
        for tag in ("policy_loss", "value_loss", "entropy", "approx_kl"):
            assert np.isfinite(float(scalars[tag]))
    assert not np.allclose(p0, np.asarray(st.params["actor"]["w"]))
    # 5x5 Empty truncates at 100 steps, so with 2 envs × 48 steps some
    # episodes can finish; episode tuples are (return, length) floats/ints.
    for r, l in [e for e in [episodes[-1]] if episodes]:
        assert isinstance(r, float) and isinstance(l, int)


def test_host_trainer_atari_host_api():
    env = AtariVectorEnv("ALE/Pong-v5", 2)
    cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1)
    tr = HostTrainer(cfg, env, num_iterations=2)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=4)
    st = tr.init_state(params, seed=0)
    st, scalars, _ = tr.run_iteration(st, 1)
    assert np.isfinite(float(scalars["policy_loss"]))
    assert st.obs.shape == (2, 84, 84, 4)


def test_host_matches_device_trainer_losses():
    """With identical params/obs streams the two trainers compute the same
    update math; a weak but useful coupling check: one iteration on each
    from the same init produces finite, same-magnitude losses."""
    from clip_ppo_tpu.train import Trainer

    env1 = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    env2 = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    cfg = PPOConfig(num_envs=2, num_steps=16, num_minibatches=2, update_epochs=1)
    params = init_agent_params(jax.random.PRNGKey(0), env1.num_actions)

    dev = Trainer(cfg, env1, num_iterations=2)
    dst = dev.init_state(jax.tree_util.tree_map(lambda x: x.copy(), params), seed=0)
    dst, dsc, _ = dev.run_iteration(dst, 1)

    host = HostTrainer(cfg, env2, num_iterations=2)
    hst = host.init_state(jax.tree_util.tree_map(lambda x: x.copy(), params), seed=0)
    hst, hsc, _ = host.run_iteration(hst, 1)

    assert abs(float(dsc["learning_rate"]) - float(hsc["learning_rate"])) < 1e-9
    for tag in ("policy_loss", "value_loss", "entropy"):
        assert np.isfinite(float(hsc[tag])) and np.isfinite(float(dsc[tag]))
