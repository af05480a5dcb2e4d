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

    # uint8 [T, N, H, W, C]; with mission conditioning a PAIR
    # (obs, mission[T, N, M] int32) — downstream code treats it as an
    # opaque pytree (models/mission.py).
    obs: Any
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
    collect_desc: bool = True,
    small_obs: bool = False,
    mission_fn=None,
):
    """Scan ``num_steps`` env steps. Returns (vec_state, obs, next_done,
    key, RolloutBatch).

    ``mission_fn``: optional ``fn(vec_state) -> [N, M] int32`` structured
    instruction (models/mission.py). When given, the policy consumes and
    the batch stores ``(obs, mission)`` pairs; ``features_fn`` must be
    the matching mission-aware trunk. The carried ``obs`` stays plain —
    the mission is recomputed from the env state wherever needed (it is
    a cheap gather, and the env state is the single source of truth
    across autoresets).

    ``small_obs``: the view fast path — ``obs`` (carry AND storage) are
    the raw [N, 7, 7, 3] MiniGrid views instead of their ×12 upscale;
    ``features_fn`` must be the matching view-consuming trunk
    (`agent.make_view_features`). Requires ``disturbance is None`` (a
    disturbed 84×84 image is no longer a tile replication).

    The categorical sampling noise for ALL steps is drawn as one
    [T, N, A] Gumbel batch before the scan (Gumbel-max is exactly what
    `jax.random.categorical` computes), so the per-step loop carries no
    RNG kernels unless disturbances need per-step keys. ``collect_desc``
    skips the per-step description snapshot for runs that never embed
    text (it is dead weight in the latency-bound vanilla-PPO rollout).
    """
    assert not (small_obs and disturbance is not None), (
        "the view fast path cannot apply image-space disturbances"
    )
    key, k_gumbel = jax.random.split(key)
    gumbels = jax.random.gumbel(
        k_gumbel, (num_steps, obs.shape[0], env.num_actions), jnp.float32
    )

    def one_step(carry, gumbel_t):
        vec_state, obs, next_done, key = carry
        if disturbance is not None:
            key, k_dist = jax.random.split(key)
            x = obs.astype(jnp.float32) / 255.0
            x = disturb_auto(x, k_dist, disturbance, disturbance_semantics)
            obs = (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        pol_obs = (obs, mission_fn(vec_state)) if mission_fn else obs
        action, logprob, value = agent_mod.get_action_and_value_gumbel(
            params, pol_obs, gumbel_t, features_fn, frozen
        )
        step_kwargs = {"small_obs": True} if small_obs else {}
        new_vec_state, new_obs, reward, term, trunc, info = env._step_impl(
            vec_state, action, **step_kwargs
        )
        # The eight per-step [N] records ride ONE [N, 8] stacked output
        # (all exactly f32-representable) — one dynamic-update-slice per
        # step into the [T, N, 8] store instead of eight; unpacked into
        # RolloutBatch fields after the scan.
        packed = jnp.stack(
            [
                action.astype(jnp.float32),
                logprob,
                reward.astype(jnp.float32),
                next_done.astype(jnp.float32),
                value,
                info["done_mask"].astype(jnp.float32),
                info["episode_return"].astype(jnp.float32),
                info["episode_length"].astype(jnp.float32),
            ],
            axis=-1,
        )
        aux = (
            env.rollout_desc(vec_state) if collect_desc else {},
            env.render_env0(vec_state) if capture_video else None,
        )
        new_done = (term | trunc).astype(jnp.float32)
        return (new_vec_state, new_obs, new_done, key), (pol_obs, packed, aux)

    (vec_state, obs, next_done, key), (obs_t, packed, (desc, video)) = (
        jax.lax.scan(one_step, (vec_state, obs, next_done, key), gumbels)
    )
    return vec_state, obs, next_done, key, _unpack(obs_t, packed, desc, video)


def _unpack(obs_t, packed, desc, video) -> RolloutBatch:
    return RolloutBatch(
        obs=obs_t,
        actions=packed[..., 0].astype(jnp.int32),
        logprobs=packed[..., 1],
        rewards=packed[..., 2],
        dones=packed[..., 3],
        values=packed[..., 4],
        done_mask=packed[..., 5].astype(bool),
        episode_return=packed[..., 6],
        episode_length=packed[..., 7].astype(jnp.int32),
        desc=desc,
        video=video,
    )


def collect_rollout_recurrent(
    params: dict,
    env,
    vec_state,
    obs: jax.Array,
    next_done: jax.Array,
    lstm_state: tuple[jax.Array, jax.Array],
    key: jax.Array,
    num_steps: int,
    disturbance: Optional[DisturbanceParams] = None,
    disturbance_semantics: str = "batched",
    features_fn: agent_mod.FeatureFn = agent_mod.cnn_features,
    capture_video: bool = False,
    frozen=None,
    small_obs: bool = False,
    mission_fn=None,
):
    """Recurrent variant of :func:`collect_rollout`: the scan carry also
    holds the per-env LSTM (h, c), reset where ``next_done`` marks an
    episode boundary entering the step (CleanRL ``ppo_atari_lstm``
    semantics). ``features_fn`` is the BASE trunk (CNN or the view fast
    path; mission-FiLM-wrapped when ``mission_fn`` is given — the FiLM
    modulates the trunk features BEFORE the cell, so the memory can carry
    mission-relative state). Returns the final ``lstm_state`` as an extra
    carry — the caller must keep the iteration's INITIAL state for the
    update's sequence replay."""
    assert not (small_obs and disturbance is not None), (
        "the view fast path cannot apply image-space disturbances"
    )
    from clip_ppo_tpu.models import recurrent as rec

    key, k_gumbel = jax.random.split(key)
    gumbels = jax.random.gumbel(
        k_gumbel, (num_steps, obs.shape[0], env.num_actions), jnp.float32
    )

    def one_step(carry, gumbel_t):
        vec_state, obs, next_done, lstm_state, key = carry
        if disturbance is not None:
            key, k_dist = jax.random.split(key)
            x = obs.astype(jnp.float32) / 255.0
            x = disturb_auto(x, k_dist, disturbance, disturbance_semantics)
            obs = (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        pol_obs = (obs, mission_fn(vec_state)) if mission_fn else obs
        feats = features_fn(params, pol_obs, frozen)
        h, lstm_state = rec.masked_lstm_step(
            params["lstm"], feats, lstm_state, next_done
        )
        action, logprob, value = agent_mod.action_value_from_hidden(
            params, rec.latent(feats, h), gumbel_t
        )
        step_kwargs = {"small_obs": True} if small_obs else {}
        new_vec_state, new_obs, reward, term, trunc, info = env._step_impl(
            vec_state, action, **step_kwargs
        )
        packed = jnp.stack(
            [
                action.astype(jnp.float32),
                logprob,
                reward.astype(jnp.float32),
                next_done.astype(jnp.float32),
                value,
                info["done_mask"].astype(jnp.float32),
                info["episode_return"].astype(jnp.float32),
                info["episode_length"].astype(jnp.float32),
            ],
            axis=-1,
        )
        aux = ({}, env.render_env0(vec_state) if capture_video else None)
        new_done = (term | trunc).astype(jnp.float32)
        return (
            (new_vec_state, new_obs, new_done, lstm_state, key),
            (pol_obs, packed, aux),
        )

    (vec_state, obs, next_done, lstm_state, key), (
        obs_t, packed, (desc, video)
    ) = jax.lax.scan(
        one_step, (vec_state, obs, next_done, lstm_state, key), gumbels
    )
    return (vec_state, obs, next_done, lstm_state, key,
            _unpack(obs_t, packed, desc, video))
