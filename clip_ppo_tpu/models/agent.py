"""Actor-critic agent: functional policy/value heads over a feature trunk.

Mirrors the reference `Agent` API surface — ``get_action_and_value``,
``get_value``, ``get_latent_representation`` (`ppo_minigrid.py:151-162`,
`clip_ppo_minigrid.py:269-271`) — as pure functions over a params pytree.
Categorical sampling/entropy are computed from logits exactly as
torch.distributions.Categorical does.

Feature trunks are pluggable (Nature-CNN here; frozen-CLIP-visual in
`clip_ppo_tpu.models.clip`), selected by ablation mode like the reference
(`clip_ppo_minigrid.py:214-271`).
"""

from __future__ import annotations

from enum import Enum
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.models import nature_cnn as cnn


class AblationMode(Enum):
    """Ablation study modes (reference `clip_ppo_utils.py:13-18`)."""

    NONE = "NONE"
    FROZEN_CLIP = "FROZEN_CLIP"
    RANDOM_ENCODER = "RANDOM_ENCODER"


def init_agent_params(
    key: jax.Array,
    num_actions: int,
    in_channels: int = 3,
    hidden: int = 512,
    with_temporal_projection: bool = False,
    mission_dim: int = 0,
) -> dict:
    """Initialize agent parameters.

    ``with_temporal_projection`` adds the 4·512→512 linear the Atari
    CLIP-PPO agent uses for frame-stacked CLIP features
    (`clip_ppo_atari.py:183-187`). ``mission_dim > 0`` adds the FiLM
    mission-conditioning head (models/mission.py, zero-initialized so
    the conditioned agent starts identical to the unconditioned one).
    """
    k_tr, k_actor, k_critic, k_tp = jax.random.split(key, 4)
    params = {
        "trunk": cnn.init_nature_cnn(k_tr, in_channels, hidden),
        "actor": cnn.init_dense(k_actor, hidden, num_actions, scale=0.01),
        "critic": cnn.init_dense(k_critic, hidden, 1, scale=1.0),
    }
    if with_temporal_projection:
        params["temporal_projection"] = cnn.init_dense(
            k_tp, 4 * hidden, hidden, scale=np.sqrt(2)
        )
    if mission_dim > 0:
        from clip_ppo_tpu.models import mission as mission_mod

        params["mission"] = mission_mod.init_mission_params(
            jax.random.fold_in(key, 7), mission_dim, hidden=hidden
        )
    return params


# Feature trunks are either ``fn(params, obs)`` or, when they consume
# non-optimized weights (frozen CLIP towers), ``fn(params, obs, frozen)``.
# The frozen pytree is threaded explicitly (TrainState.frozen) rather than
# captured in a closure: closed-over arrays become compile-time constants
# and bloat the executable (SURVEY §7; observed HTTP 413 on tunneled TPUs).
FeatureFn = Callable[..., jax.Array]


def _features(features_fn: FeatureFn, params: dict, obs: jax.Array, frozen):
    return features_fn(params, obs, frozen)


def cnn_features(params: dict, obs: jax.Array, frozen=None, dtype=None) -> jax.Array:
    """uint8 [B,H,W,C] observations → [B, hidden] features (x/255 inside).
    ``frozen`` is accepted (and ignored) for FeatureFn-contract uniformity."""
    del frozen
    x = obs.astype(jnp.float32) / 255.0
    return cnn.nature_cnn(params["trunk"], x, dtype)


def make_view_features(upscale: int) -> FeatureFn:
    """FeatureFn over raw [B, 7, 7, 3] uint8 MiniGrid views: numerically
    ≡ `cnn_features` on the ×``upscale`` nearest-upscaled 84×84 obs (see
    nature_cnn.nature_cnn_view), with the same trunk parameters — the
    Trainer's view fast path swaps this in when observations are exact
    tile upscales (no disturbances, no image-CLIP consumer)."""

    def view_features(params: dict, view: jax.Array, frozen=None,
                      dtype=None) -> jax.Array:
        del frozen
        # Raw integer codes go straight into the per-step contraction
        # (exact in bf16); the /255 is folded into the hoisted weight
        # pre-sum — see nature_cnn_view's precision note.
        x = view.astype(jnp.float32)
        return cnn.nature_cnn_view(params["trunk"], x, upscale, dtype,
                                   v_scale=1.0 / 255.0)

    return view_features


def heads(params: dict, hidden: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Actor logits + critic value as ONE [hidden, A+1] matmul.

    The weights stay separate pytree leaves (reference init scales differ,
    `ppo_minigrid.py:122-125`); the concat is loop-invariant so XLA hoists
    it out of the rollout scan — at the latency-bound 8-env bench config
    the second tiny matmul dispatch per step was pure overhead. Each
    output column's dot accumulates independently, so logits/value match
    the two-matmul formulation."""
    w = jnp.concatenate([params["actor"]["w"], params["critic"]["w"]], axis=1)
    b = jnp.concatenate([params["actor"]["b"], params["critic"]["b"]])
    out = hidden @ w + b
    return out[..., :-1], out[..., -1]


def logprob_entropy(logits: jax.Array, action: jax.Array) -> tuple[jax.Array, jax.Array]:
    logp_all = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logp_all, action[..., None].astype(jnp.int32), axis=-1)[..., 0]
    p = jnp.exp(logp_all)
    entropy = -jnp.sum(p * logp_all, axis=-1)
    return logp, entropy


def get_action_and_value(
    params: dict,
    obs: jax.Array,
    key: jax.Array,
    features_fn: FeatureFn = cnn_features,
    frozen=None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample an action; returns (action, logprob, entropy, value)."""
    hidden = _features(features_fn, params, obs, frozen)
    logits, value = heads(params, hidden)
    action = jax.random.categorical(key, logits)
    logp, entropy = logprob_entropy(logits, action)
    return action, logp, entropy, value


def get_action_and_value_gumbel(
    params: dict,
    obs: jax.Array,
    gumbel: jax.Array,
    features_fn: FeatureFn = cnn_features,
    frozen=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Like :func:`get_action_and_value` but with the sampling noise
    supplied as a precomputed Gumbel draw ([..., num_actions]).

    ``argmax(logits + gumbel)`` is exactly the Gumbel-max sampling
    `jax.random.categorical` performs; drawing the whole rollout's noise
    as ONE [T, N, A] batch outside the step scan removes the per-step
    RNG kernels from the latency-bound rollout loop. Returns
    (action, logprob, value) — entropy is never consumed during rollouts.
    """
    hidden = _features(features_fn, params, obs, frozen)
    logits, value = heads(params, hidden)
    action = jnp.argmax(logits + gumbel, axis=-1)
    logp, _ = logprob_entropy(logits, action)
    return action, logp, value


def action_value_from_hidden(
    params: dict, hidden: jax.Array, gumbel: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Gumbel-max action + logprob + value from a precomputed latent —
    the recurrent rollout computes its latent through the LSTM cell, so
    the feature trunk is not re-run here."""
    logits, value = heads(params, hidden)
    action = jnp.argmax(logits + gumbel, axis=-1)
    logp, _ = logprob_entropy(logits, action)
    return action, logp, value


def evaluate_actions(
    params: dict,
    obs: jax.Array,
    action: jax.Array,
    features_fn: FeatureFn = cnn_features,
    frozen=None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (logprob, entropy, value, hidden) for given actions."""
    hidden = _features(features_fn, params, obs, frozen)
    logits, value = heads(params, hidden)
    logp, entropy = logprob_entropy(logits, action)
    return logp, entropy, value, hidden


def get_value(
    params: dict, obs: jax.Array, features_fn: FeatureFn = cnn_features,
    frozen=None,
) -> jax.Array:
    hidden = _features(features_fn, params, obs, frozen)
    return cnn.dense(params["critic"], hidden)[..., 0]


def get_latent_representation(
    params: dict, obs: jax.Array, features_fn: FeatureFn = cnn_features,
    frozen=None,
) -> jax.Array:
    """Detached latent for CLIP alignment (`clip_ppo_minigrid.py:269-271`):
    gradients never flow into the trunk through the CLIP loss."""
    return jax.lax.stop_gradient(_features(features_fn, params, obs, frozen))
