"""gymnasium.Env adapter over the pure-JAX envs."""

import numpy as np
import pytest

from clip_ppo_tpu.envs.gym_adapter import make_env


@pytest.mark.parametrize("env_id,obs_shape", [
    ("MiniGrid-Empty-5x5-v0", (84, 84, 3)),
    ("ALE/Pong-v5", (84, 84, 4)),
])
def test_gym_api_roundtrip(env_id, obs_shape):
    env = make_env(env_id, seed=0)
    obs, info = env.reset()
    assert obs.shape == obs_shape and obs.dtype == np.uint8
    for _ in range(5):
        obs, reward, term, trunc, infos = env.step(env.action_space.sample())
        assert obs.shape == obs_shape
        assert isinstance(reward, float)
        assert isinstance(term, bool) and isinstance(trunc, bool)
    frame = env.render()
    assert frame.ndim == 3 and frame.shape[-1] == 3
    env.close()


def test_gym_checker():
    gym_utils = pytest.importorskip("gymnasium.utils.env_checker")
    env = make_env("MiniGrid-Empty-5x5-v0")
    # skip_render_check: render() needs live state, which the checker's
    # fresh instances don't guarantee between calls.
    gym_utils.check_env(env, skip_render_check=True)


def test_episode_info_on_done():
    env = make_env("MiniGrid-Empty-5x5-v0", seed=1)
    env.reset()
    # Forced truncation by running out max_steps with NOOP-ish turns.
    done_info = None
    for _ in range(200):
        _, _, term, trunc, infos = env.step(0)
        if term or trunc:
            done_info = infos
            break
    assert done_info is not None and "episode" in done_info
    assert "r" in done_info["episode"] and "l" in done_info["episode"]
