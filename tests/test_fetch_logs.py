"""Trainer.fetch_logs: packed fetch returns numpy dicts matching device data."""

import numpy as np

import jax

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import PPOConfig, Trainer


def _setup(capture):
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=3, capture_env0=capture)
    return tr, tr.init_state(params, seed=0)


def test_fetch_matches_direct_device_get():
    tr, st = _setup(capture=False)
    st, sc, ep = tr.run_iteration(st, 1)
    direct_sc, direct_ep = jax.device_get((sc, ep))
    packed_sc, packed_ep = tr.fetch_logs(sc, ep)
    assert set(packed_sc) == set(direct_sc)
    for k in direct_sc:
        np.testing.assert_allclose(
            packed_sc[k], np.asarray(direct_sc[k], np.float32), rtol=1e-6
        )
    np.testing.assert_array_equal(
        packed_ep["done_mask"], np.asarray(direct_ep["done_mask"])
    )
    np.testing.assert_allclose(
        packed_ep["episode_return"], np.asarray(direct_ep["episode_return"]),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        packed_ep["episode_length"], np.asarray(direct_ep["episode_length"])
    )
    assert packed_ep["done_mask"].dtype == bool
    assert packed_ep["episode_length"].dtype == np.int32


def test_fetch_includes_video_when_captured():
    tr, st = _setup(capture=True)
    st, sc, ep = tr.run_iteration(st, 1)
    _, packed_ep = tr.fetch_logs(sc, ep)
    assert packed_ep["env0_frames"].shape[0] == 8  # num_steps
    assert packed_ep["env0_frames"].shape[-1] == 3  # RGB render
    assert packed_ep["env0_dones"].dtype == bool
