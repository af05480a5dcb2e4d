"""gymnasium.Env adapter over the pure-JAX environments.

Users of the reference interact with envs through the gymnasium API
(`gym.make(...)` + wrappers, `ppo_minigrid.py:106-119`). The pure-JAX envs
are batched and functional; this adapter exposes a single instance as a
standard ``gymnasium.Env`` — reset/step with numpy observations, proper
``render()`` frames — so external tooling (evaluation scripts, wrappers,
recorders) written against gymnasium keeps working. Each host step pays a
device round-trip, so this surface is for interaction/inspection, not
training (training uses the batched functional API inside `lax.scan`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from clip_ppo_tpu.envs import make_vector_env


def make_env(env_id: str, seed: int = 0, **kwargs):
    """A single gymnasium.Env over the matching pure-JAX backend."""
    import gymnasium as gym

    # autoreset off: step() must return the TRUE terminal observation with
    # terminated=True (gymnasium contract); reset() starts the next episode.
    vec = make_vector_env(env_id, num_envs=1, autoreset=False, **kwargs)

    class JaxGymEnv(gym.Env):
        metadata = {"render_modes": ["rgb_array"], "render_fps": 30}

        def __init__(self):
            self.observation_space = vec.single_observation_space
            self.action_space = vec.single_action_space
            self._seed = seed
            self._state = None

        def reset(self, *, seed: Optional[int] = None, options=None):
            super().reset(seed=seed)  # seeds self.np_random (gym contract)
            if seed is not None:
                self._seed = seed
            state, obs = vec.reset_fn(jax.random.PRNGKey(self._seed))
            self._seed += 1  # fresh episode stream on the next reset
            self._state = state
            return np.asarray(obs[0]), {}

        def step(self, action):
            import jax.numpy as jnp

            state, obs, reward, term, trunc, info = vec.step_fn(
                self._state, jnp.asarray([action])
            )
            self._state = state
            infos = {}
            if bool(np.asarray(info["done_mask"])[0]):
                infos["episode"] = {
                    "r": float(np.asarray(info["episode_return"])[0]),
                    "l": int(np.asarray(info["episode_length"])[0]),
                }
            return (
                np.asarray(obs[0]),
                float(np.asarray(reward)[0]),
                bool(np.asarray(term)[0]),
                bool(np.asarray(trunc)[0]),
                infos,
            )

        def render(self):
            assert self._state is not None, "call reset() first"
            return np.asarray(vec.render_env0(self._state))

        def close(self):
            vec.close()

    return JaxGymEnv()
