"""Batched on-device vector environments with same-step autoreset.

The reference steps eight Python envs sequentially on the host
(`gym.vector.SyncVectorEnv`, `ppo_minigrid.py:198-200`) and pays a
host↔device transfer every step. Here the whole batch is a pytree of
arrays and ``reset``/``step`` are jitted batched functions, so the rollout
can run inside ``lax.scan`` on the accelerator with zero per-step host
traffic.

Autoreset is *same-step* (the post-done observation is the next episode's
first observation, and the final return/length are surfaced through the
info arrays), matching the on-policy semantics CleanRL-style PPO assumes.
Episode statistics mirror RecordEpisodeStatistics: infos carry ``_r``
masks and ``r``/``l`` values in the vectorized format the CLIP scripts
consume (`clip_ppo_minigrid.py:419-434`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.envs.base import HostVectorEnvMixin
from clip_ppo_tpu.envs.minigrid import core as minigrid_core


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VecState:
    """Batched env state plus episode-statistics accumulators."""

    env: Any              # vmapped EnvState pytree, leading axis = num_envs
    episode_return: jax.Array  # [N] float32 running return
    episode_length: jax.Array  # [N] int32 running length


def _select(done: jax.Array, a, b):
    """tree-wise ``where(done, a, b)`` with per-leaf broadcasting."""
    def pick(x, y):
        d = done.reshape(done.shape + (1,) * (x.ndim - 1))
        return jnp.where(d, x, y)
    return jax.tree_util.tree_map(pick, a, b)


class JaxVectorEnv(HostVectorEnvMixin):
    """Vectorized pure-JAX environment (MiniGrid family).

    Exposes two APIs:

    * a **functional** one (``reset_fn`` / ``step_fn`` / ``observe_fn``)
      returning pytrees, for use inside jitted training loops;
    * a **host** one (``reset`` / ``step`` with numpy in/out and
      gymnasium-style infos) for API parity with the reference scripts.
    """

    def __init__(self, env_id: str, num_envs: int, obs_size: int = 84,
                 autoreset: bool = True):
        self.env_id = env_id
        self.num_envs = num_envs
        # autoreset=False keeps the terminal state in place (the gym
        # adapter needs the true final observation; gymnasium contract).
        self.autoreset = autoreset
        self.params = minigrid_core.parse_env_id(env_id)
        if obs_size % minigrid_core.VIEW_SIZE != 0:
            raise ValueError("obs_size must be a multiple of the 7-cell view")
        self.obs_size = obs_size
        self._upscale = obs_size // minigrid_core.VIEW_SIZE
        # Dynamic-Obstacles restricts the action space to
        # left/right/forward (upstream dynamicobstacles.py); the others
        # use the full 7-action set.
        self.num_actions = self.params.num_actions
        self._jit_reset = jax.jit(self._reset_impl)
        self._jit_step = jax.jit(self._step_impl, static_argnames=("small_obs",))
        self._host_state: VecState | None = None

    # -- gymnasium-compatible space descriptions ----------------------------

    @property
    def single_action_space(self):
        import gymnasium

        return gymnasium.spaces.Discrete(self.num_actions)

    @property
    def single_observation_space(self):
        import gymnasium

        return gymnasium.spaces.Box(
            0, 255, (self.obs_size, self.obs_size, 3), dtype=np.uint8
        )

    # -- functional API ------------------------------------------------------

    def observe_fn(self, state: VecState) -> jax.Array:
        """[N, obs, obs, 3] uint8 observations (nearest 12× upscale of the
        7×7 symbolic view — exactly gymnasium ResizeObservation INTER_AREA
        at integer zoom, `ppo_minigrid.py:114`)."""
        from clip_ppo_tpu.ops.resize import upscale_nearest

        return upscale_nearest(self.observe_view_fn(state), self._upscale)

    def observe_view_fn(self, state: VecState) -> jax.Array:
        """[N, 7, 7, 3] uint8 raw symbolic views — the pre-upscale form of
        :meth:`observe_fn` (observations are EXACT ×upscale tile
        replications of this; the Trainer's view fast path consumes it
        directly and reproduces the 84×84 CNN numerics)."""
        return jax.vmap(minigrid_core.observe, in_axes=(None, 0))(
            self.params, state.env
        )

    @property
    def supports_view_obs(self) -> bool:
        """True when obs are exact integer nearest-upscales of the view."""
        return self.obs_size % minigrid_core.VIEW_SIZE == 0

    @property
    def view_upscale(self) -> int:
        return self._upscale

    def _reset_impl(self, key: jax.Array) -> tuple[VecState, jax.Array]:
        keys = jax.random.split(key, self.num_envs)
        env = jax.vmap(minigrid_core.reset, in_axes=(None, 0))(self.params, keys)
        state = VecState(
            env=env,
            episode_return=jnp.zeros(self.num_envs, jnp.float32),
            episode_length=jnp.zeros(self.num_envs, jnp.int32),
        )
        return state, self.observe_fn(state)

    def reset_fn(self, key: jax.Array) -> tuple[VecState, jax.Array]:
        return self._jit_reset(key)

    def _step_impl(self, state: VecState, actions: jax.Array,
                   small_obs: bool = False):
        env, reward, terminated, truncated = jax.vmap(
            minigrid_core.step, in_axes=(None, 0, 0)
        )(self.params, state.env, actions)
        done = terminated | truncated

        ep_return = state.episode_return + reward
        ep_length = state.episode_length + 1

        if self.autoreset:
            # Same-step autoreset: finished envs restart immediately; their
            # rng chain advances because reset() stores a fresh subkey.
            # The batch-scalar lax.cond skips the whole reset computation
            # on steps where no episode ended — generation is the
            # dominant per-step cost for the rejection-sampled RoomGrid
            # families (e.g. BabyAI-GoTo: 18 distractors + connect_all +
            # flood fill per attempt), and most steps reset nobody.
            def _with_resets(env):
                reset_keys = jax.vmap(
                    lambda k: jax.random.split(k)[0])(env.rng)
                fresh = jax.vmap(minigrid_core.reset, in_axes=(None, 0))(
                    self.params, reset_keys
                )
                return _select(done, fresh, env)

            env = jax.lax.cond(
                jnp.any(done), _with_resets, lambda env: env, env)

        new_state = VecState(
            env=env,
            episode_return=jnp.where(done, 0.0, ep_return),
            episode_length=jnp.where(done, 0, ep_length),
        )
        info = {
            "done_mask": done,
            "episode_return": jnp.where(done, ep_return, 0.0),
            "episode_length": jnp.where(done, ep_length, 0),
        }
        obs = (self.observe_view_fn(new_state) if small_obs
               else self.observe_fn(new_state))
        return new_state, obs, reward, terminated, truncated, info

    def step_fn(self, state: VecState, actions: jax.Array):
        return self._jit_step(state, actions)

    # host API (reset/step/close) comes from HostVectorEnvMixin

    def render_env0(self, state: VecState) -> jax.Array:
        """RGB render of env 0 for video capture ([H, W, 3] uint8)."""
        env0 = jax.tree_util.tree_map(lambda x: x[0], state.env)
        return minigrid_core.render_rgb(self.params, env0)

    # -- mission conditioning (beyond-reference, models/mission.py) ----------

    @property
    def mission_dim(self) -> int:
        """Width of the per-env structured instruction vector."""
        return 8 + 4 * 12 + 4 * 2

    def mission_fn(self, state: VecState) -> jax.Array:
        """[N, mission_dim] int32 structured instruction for the current
        state: the mission target, the composite-instruction slots, and
        the per-slot verifier latches (see EnvState docs in
        envs/minigrid/core.py and the honesty note in models/mission.py).
        All-device, per-step cheap (pure gathers/reshapes)."""
        n = self.num_envs
        return jnp.concatenate(
            [
                state.env.target.astype(jnp.int32),
                state.env.instr.reshape(n, -1).astype(jnp.int32),
                state.env.instr_state.reshape(n, -1).astype(jnp.int32),
            ],
            axis=-1,
        )

    def rollout_desc(self, state: VecState) -> dict:
        """Small per-step state snapshot the rollout scan records for
        host-side text descriptions (MiniGrid descriptions are per-step,
        `clip_ppo_minigrid.py:393-403`)."""
        return {
            "agent_pos": state.env.agent_pos,
            "agent_dir": state.env.agent_dir,
        }

    # -- symbolic descriptions (host) ----------------------------------------

    def describe(self, state: VecState | None = None) -> list[str]:
        """Text descriptions of the current (or given) batched state."""
        st = state if state is not None else self._host_state
        assert st is not None
        return minigrid_core.describe_states(
            np.asarray(st.env.grid),
            np.asarray(st.env.agent_pos),
            np.asarray(st.env.agent_dir),
        )
