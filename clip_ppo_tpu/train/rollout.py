"""On-device rollout collection as a single `lax.scan`.

The reference's rollout loop is host Python with a device sync every step
(`ppo_minigrid.py:242-273`). Here the env *is* device arrays
(clip_ppo_tpu.envs), so the whole ``num_steps`` rollout — optional
disturbance of the observation, policy sampling, env transition, episode
bookkeeping — compiles into one scan that never leaves the accelerator.

Disturbances are applied to the observation at the start of each step
(before storing/acting), matching the CLIP scripts' placement
(`clip_ppo_minigrid.py:381-388`); the vanilla script's post-step placement
is the same transform one step earlier and is served by the same code path
with ``per_image`` semantics.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.ops import DisturbanceParams
from clip_ppo_tpu.ops.disturbances import disturb_auto


class RolloutBatch(NamedTuple):
    """Per-step storage, leading axes [num_steps, num_envs]."""

    obs: jax.Array        # uint8 [T, N, H, W, C]
    actions: jax.Array    # int32 [T, N]
    logprobs: jax.Array   # f32 [T, N]
    rewards: jax.Array    # f32 [T, N]
    dones: jax.Array      # f32 [T, N] (done flag entering the step)
    values: jax.Array     # f32 [T, N]
    # episode bookkeeping (for host logging)
    done_mask: jax.Array        # bool [T, N]
    episode_return: jax.Array   # f32 [T, N] (value where done_mask)
    episode_length: jax.Array   # i32 [T, N]
    # per-step state snapshot for host-side text descriptions
    # (env-defined dict, e.g. MiniGrid agent_pos/agent_dir; may be empty)
    desc: dict
    # env-0 RGB render per step for video capture (None when disabled —
    # None is an empty pytree node, so the scan carries no extra data)
    video: Any


def collect_rollout(
    params: dict,
    env,                      # JaxVectorEnv (its pure _step_impl is used)
    vec_state,
    obs: jax.Array,
    next_done: jax.Array,
    key: jax.Array,
    num_steps: int,
    disturbance: Optional[DisturbanceParams] = None,
    disturbance_semantics: str = "batched",
    features_fn: agent_mod.FeatureFn = agent_mod.cnn_features,
    capture_video: bool = False,
    frozen=None,
):
    """Scan ``num_steps`` env steps. Returns (vec_state, obs, next_done,
    key, RolloutBatch)."""

    def one_step(carry, _):
        vec_state, obs, next_done, key = carry
        key, k_act, k_dist = jax.random.split(key, 3)

        if disturbance is not None:
            x = obs.astype(jnp.float32) / 255.0
            x = disturb_auto(x, k_dist, disturbance, disturbance_semantics)
            obs = (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        action, logprob, _, value = agent_mod.get_action_and_value(
            params, obs, k_act, features_fn, frozen
        )
        new_vec_state, new_obs, reward, term, trunc, info = env._step_impl(
            vec_state, action
        )
        out = RolloutBatch(
            obs=obs,
            actions=action.astype(jnp.int32),
            logprobs=logprob,
            rewards=reward.astype(jnp.float32),
            dones=next_done.astype(jnp.float32),
            values=value,
            done_mask=info["done_mask"],
            episode_return=info["episode_return"],
            episode_length=info["episode_length"],
            desc=env.rollout_desc(vec_state),
            video=env.render_env0(vec_state) if capture_video else None,
        )
        new_done = (term | trunc).astype(jnp.float32)
        return (new_vec_state, new_obs, new_done, key), out

    (vec_state, obs, next_done, key), batch = jax.lax.scan(
        one_step, (vec_state, obs, next_done, key), None, length=num_steps
    )
    return vec_state, obs, next_done, key, batch
