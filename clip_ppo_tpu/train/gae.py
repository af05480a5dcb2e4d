"""Generalized Advantage Estimation as a reverse `lax.scan`.

Replaces the reference's Python loop over 128 steps
(`ppo_minigrid.py:275-288`) with a compiled scan; identical recurrence:

    delta_t = r_t + gamma * V_{t+1} * nonterminal_{t+1} - V_t
    A_t     = delta_t + gamma * lambda * nonterminal_{t+1} * A_{t+1}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jax.Array,     # [T, N]
    values: jax.Array,      # [T, N]
    dones: jax.Array,       # [T, N]  done flag *entering* step t
    next_value: jax.Array,  # [N]
    next_done: jax.Array,   # [N]
    gamma: float,
    gae_lambda: float,
) -> tuple[jax.Array, jax.Array]:
    """Returns (advantages [T, N], returns [T, N])."""
    t_steps = rewards.shape[0]
    next_nonterminal = jnp.concatenate(
        [1.0 - dones[1:].astype(jnp.float32),
         (1.0 - next_done.astype(jnp.float32))[None]], axis=0
    )
    next_values = jnp.concatenate([values[1:], next_value[None]], axis=0)
    deltas = rewards + gamma * next_values * next_nonterminal - values

    def backward(lastgaelam, xs):
        delta, nonterm = xs
        adv = delta + gamma * gae_lambda * nonterm * lastgaelam
        return adv, adv

    _, advantages = jax.lax.scan(
        backward,
        jnp.zeros_like(next_value, dtype=jnp.float32),
        (deltas, next_nonterminal),
        reverse=True,
    )
    return advantages, advantages + values
