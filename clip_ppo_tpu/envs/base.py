"""Shared host-facing API for the pure-JAX vector envs.

Both env families (MiniGrid, Atari) expose the same two surfaces: the
functional ``reset_fn``/``step_fn`` used inside jitted training loops, and
a numpy host API with gymnasium-style vectorized infos
(`clip_ppo_minigrid.py:419-434` format) for reference-script parity. The
host plumbing is identical, so it lives here once.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


class HostVectorEnvMixin:
    """numpy reset/step/close over a functional reset_fn/step_fn pair.

    Concrete classes provide ``reset_fn(key) -> (state, obs)`` and
    ``step_fn(state, actions) -> (state, obs, reward, term, trunc, info)``
    where ``info`` carries done_mask / episode_return / episode_length.
    """

    _host_state: Any = None

    def reset(self, seed: int = 0):
        state, obs = self.reset_fn(jax.random.PRNGKey(seed))
        self._host_state = state
        return np.asarray(obs), {}

    def step(self, actions: np.ndarray):
        assert self._host_state is not None, "call reset() first"
        import jax.numpy as jnp

        state, obs, reward, terminated, truncated, info = self.step_fn(
            self._host_state, jnp.asarray(actions)
        )
        self._host_state = state
        done_mask = np.asarray(info["done_mask"])
        infos: dict = {}
        if done_mask.any():
            # RecordEpisodeStatistics vectorized format: `_r` mask + values.
            infos["episode"] = {
                "_r": done_mask,
                "r": np.asarray(info["episode_return"]),
                "l": np.asarray(info["episode_length"]),
            }
        return (
            np.asarray(obs),
            np.asarray(reward),
            np.asarray(terminated),
            np.asarray(truncated),
            infos,
        )

    def close(self):
        self._host_state = None
