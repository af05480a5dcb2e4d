"""Batched on-device Atari vector env: frame stack, episodic life, stats.

The counterpart of `clip_ppo_tpu.envs.vector.JaxVectorEnv` for the
pure-JAX Atari games, folding the reference's wrapper-stack behavior
(`clip_ppo_atari.py:149-168`) into batched array ops:

* 4-frame grayscale stack kept in the vector state (`FrameStackObservation`),
  NHWC ``[N, 84, 84, 4]`` uint8 — frame t is channel 3, oldest is 0;
* reward clipping to sign() for training (`ClipRewardEnv`), raw scores
  accumulated separately;
* EpisodicLife semantics: ``terminated`` is surfaced on life loss so GAE
  bootstraps correctly, but the game resets only at true game over;
* episode statistics mirror `RecordEpisodeStatistics` *below* the wrapper
  stack: raw (unclipped) return per true game episode, length counted in
  inner steps (4 per agent step, matching MaxAndSkip's inner loop).

Random starts: the reference's NoopResetEnv executes up to 30 noops on
reset; here each env's reset key randomizes the serve (ball x/direction,
Breakout) or serve direction (Pong), which is the same decorrelation
mechanism expressed natively.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.envs.atari import core
from clip_ppo_tpu.envs.base import HostVectorEnvMixin


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AtariVecState:
    env: Any                    # vmapped game state, leading axis = num_envs
    frames: jax.Array           # [N, 84, 84, 4] uint8 stack
    episode_return: jax.Array   # [N] f32 raw-score return (whole game)
    episode_length: jax.Array   # [N] i32 inner steps (4 per agent step)


class AtariVectorEnv(HostVectorEnvMixin):
    """Vectorized pure-JAX Atari (Breakout | Pong), JaxVectorEnv-compatible."""

    def __init__(self, env_id: str, num_envs: int, clip_rewards: bool = True,
                 autoreset: bool = True):
        self.env_id = env_id
        self.num_envs = num_envs
        # autoreset=False keeps the game-over state (gym adapter contract).
        self.autoreset = autoreset
        self.params = core.parse_atari_id(env_id)
        self.num_actions = self.params.num_actions
        self.clip_rewards = clip_rewards
        self.obs_size = core.OBS_SIZE
        self._jit_reset = jax.jit(self._reset_impl)
        self._jit_step = jax.jit(self._step_impl)
        self._host_state: AtariVecState | None = None

    @property
    def single_action_space(self):
        import gymnasium

        return gymnasium.spaces.Discrete(self.num_actions)

    @property
    def single_observation_space(self):
        import gymnasium

        return gymnasium.spaces.Box(
            0, 255, (core.OBS_SIZE, core.OBS_SIZE, 4), dtype=np.uint8
        )

    # -- functional API ------------------------------------------------------

    def _reset_impl(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs)
        env = jax.vmap(lambda k: core.reset(self.params, k))(keys)
        frame = jax.vmap(lambda s: core.render(self.params, s))(env)
        frames = jnp.repeat(frame[..., None], 4, axis=-1)  # FrameStack reset
        state = AtariVecState(
            env=env,
            frames=frames,
            episode_return=jnp.zeros(self.num_envs, jnp.float32),
            episode_length=jnp.zeros(self.num_envs, jnp.int32),
        )
        return state, frames

    def reset_fn(self, key: jax.Array):
        return self._jit_reset(key)

    def _step_impl(self, state: AtariVecState, actions: jax.Array):
        env, raw_reward, episodic_done, game_over = jax.vmap(
            lambda s, a: core.step(self.params, s, a)
        )(state.env, actions)

        ep_return = state.episode_return + raw_reward
        ep_length = state.episode_length + core.SUBSTEPS

        if self.autoreset:
            # True reset only at game over (EpisodicLife).
            reset_keys = jax.vmap(lambda k: jax.random.split(k)[0])(env.rng)
            fresh = jax.vmap(lambda k: core.reset(self.params, k))(reset_keys)

            def pick(a, b):
                d = game_over.reshape(game_over.shape + (1,) * (a.ndim - 1))
                return jnp.where(d, a, b)

            env = jax.tree_util.tree_map(pick, fresh, env)

        frame = jax.vmap(lambda s: core.render(self.params, s))(env)
        frames = jnp.concatenate([state.frames[..., 1:], frame[..., None]], axis=-1)
        if self.autoreset:
            # Fresh games restart the stack from their first frame.
            frames = jnp.where(
                game_over.reshape(-1, 1, 1, 1),
                jnp.repeat(frame[..., None], 4, axis=-1),
                frames,
            )

        reward = jnp.sign(raw_reward) if self.clip_rewards else raw_reward
        terminated = episodic_done
        truncated = jnp.zeros_like(terminated)

        new_state = AtariVecState(
            env=env,
            frames=frames,
            episode_return=jnp.where(game_over, 0.0, ep_return),
            episode_length=jnp.where(game_over, 0, ep_length),
        )
        info = {
            "done_mask": game_over,
            "episode_return": jnp.where(game_over, ep_return, 0.0),
            "episode_length": jnp.where(game_over, ep_length, 0),
        }
        return new_state, frames, reward, terminated, truncated, info

    def step_fn(self, state: AtariVecState, actions: jax.Array):
        return self._jit_step(state, actions)

    # host API (reset/step/close) comes from HostVectorEnvMixin

    def render_env0(self, state: AtariVecState) -> jax.Array:
        """RGB render of env 0 for video capture: the newest stacked frame
        broadcast to RGB ([84, 84, 3] uint8)."""
        frame = state.frames[0, :, :, -1:]
        return jnp.broadcast_to(frame, frame.shape[:2] + (3,))

    def rollout_desc(self, state: AtariVecState) -> dict:
        """Atari descriptions are generated once per iteration from the
        current state (`clip_ppo_atari.py:648` cycles the live envs), so
        the rollout records no per-step snapshot."""
        return {}

    # -- text descriptions ----------------------------------------------------

    def describe(self, state: AtariVecState | None = None) -> list[str]:
        st = state if state is not None else self._host_state
        assert st is not None
        return core.describe_states(self.params, st.env, self.num_envs)
