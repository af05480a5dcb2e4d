"""LSTM policy trunk for recurrent PPO — a capability the reference lacks.

The reference's agents are all feed-forward CNNs (`ppo_minigrid.py:128-162`),
which provably cannot solve the MiniGrid Memory family: the cue leaves the
7×7 egocentric view while the agent walks the hallway, so a memoryless
policy is capped at the ~50% guess rate (measured in docs/PERFORMANCE.md).
``--recurrent`` inserts an LSTM between the feature trunk and the
actor/critic heads, CleanRL-``ppo_atari_lstm``-style: hidden state carried
across env steps on device, reset where an episode ended, and the update
replays each minibatch's sequences from the iteration's initial state.

TPU shape: the convolutional trunk runs over the whole [T·B] batch as one
batched matmul program (MXU work); only the tiny [B, H]×[H, 4H] cell
recurrence is sequential, inside the same `lax.scan` that already drives
the rollout — so recurrence costs one extra small matmul per step, not a
new host boundary.

The heads read ``concat(trunk_features, lstm_hidden)`` rather than the
LSTM output alone (CleanRL feeds only the LSTM). Measured reason: the
cell's tanh-bounded 128-dim hidden is ~30× smaller in aggregate
magnitude than the 512-dim ReLU trunk features, so with Adam's
per-parameter steps an LSTM-only head moves the policy ~30× slower per
update (approx_kl ~1e-5 vs ~1e-3 feed-forward at lr 2.5e-4 — it sat at
the uniform policy for the whole reference budget). The skip keeps
reactive learning at feed-forward speed while the recurrent path carries
what left the 7×7 view; gradients still reach the cell through the
concat (BPTT pinned in tests/test_recurrent.py).

Gate math matches ``torch.nn.LSTMCell`` exactly (i, f, g, o gate order;
pinned against the torch oracle in tests/test_recurrent.py); init matches
CleanRL's (orthogonal gain-1 weights, zero biases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.models import nature_cnn as cnn


def init_lstm(key: jax.Array, input_dim: int, hidden_dim: int) -> dict:
    """Orthogonal(1.0) input/recurrent weights, zero bias (CleanRL's
    ``ppo_atari_lstm`` init). Weights are stored input-major ([in, 4H])
    for ``x @ w``; the single ``b`` is torch's ``b_ih + b_hh`` (both zero
    at init, and only their sum enters the cell)."""
    k_ih, k_hh = jax.random.split(key)
    return {
        "w_ih": cnn._orthogonal(k_ih, (input_dim, 4 * hidden_dim), 1.0),
        "w_hh": cnn._orthogonal(k_hh, (hidden_dim, 4 * hidden_dim), 1.0),
        "b": jnp.zeros((4 * hidden_dim,), jnp.float32),
    }


def lstm_step(
    p: dict, x: jax.Array, hc: tuple[jax.Array, jax.Array]
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """One LSTM cell step: x [B, in], hc ([B, H], [B, H]) → (h', (h', c')).

    torch gate order i, f, g, o; sigmoid on i/f/o, tanh on g;
    c' = f⊙c + i⊙g, h' = o⊙tanh(c')."""
    h, c = hc
    gates = x @ p["w_ih"] + h @ p["w_hh"] + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return h2, (h2, c2)


def masked_lstm_step(
    p: dict, x: jax.Array, hc: tuple[jax.Array, jax.Array], done: jax.Array
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """LSTM step with the hidden state zeroed where ``done`` (f32 [B])
    marks an episode boundary entering this step (CleanRL resets h AND c
    with ``(1 - done)`` before the cell)."""
    mask = (1.0 - done)[:, None]
    h, c = hc
    return lstm_step(p, x, (h * mask, c * mask))


def latent(feats: jax.Array, h: jax.Array) -> jax.Array:
    """Heads input: trunk features ⊕ LSTM hidden (see module docstring
    for the measured conditioning rationale)."""
    return jnp.concatenate([feats, h], axis=-1)


def init_zero_state(num_envs: int, hidden_dim: int) -> tuple[jax.Array, jax.Array]:
    # h and c must be DISTINCT buffers: they ride a donated TrainState,
    # and donating one buffer twice is an XLA error.
    return (jnp.zeros((num_envs, hidden_dim), jnp.float32),
            jnp.zeros((num_envs, hidden_dim), jnp.float32))


def init_agent_params_recurrent(
    key: jax.Array,
    num_actions: int,
    in_channels: int = 3,
    hidden: int = 512,
    lstm_hidden: int = 128,
    mission_dim: int = 0,
) -> dict:
    """Nature-CNN trunk → LSTM(hidden → lstm_hidden); heads read
    ``concat(trunk_features, lstm_hidden)`` (module docstring). Head init
    scales as the reference's `layer_init`: 0.01 actor, 1.0 critic
    (`ppo_minigrid.py:122-125`). ``mission_dim > 0`` adds the FiLM
    mission head (models/mission.py) modulating the trunk features
    BEFORE the cell — zero-initialized, so the conditioned agent starts
    identical to the unconditioned one."""
    k_tr, k_lstm, k_actor, k_critic = jax.random.split(key, 4)
    head_in = hidden + lstm_hidden
    params = {
        "trunk": cnn.init_nature_cnn(k_tr, in_channels, hidden),
        "lstm": init_lstm(k_lstm, hidden, lstm_hidden),
        "actor": cnn.init_dense(k_actor, head_in, num_actions, scale=0.01),
        "critic": cnn.init_dense(k_critic, head_in, 1, scale=1.0),
    }
    if mission_dim > 0:
        from clip_ppo_tpu.models import mission as mission_mod

        params["mission"] = mission_mod.init_mission_params(
            jax.random.fold_in(key, 7), mission_dim, hidden=hidden
        )
    return params


def unroll(
    p_lstm: dict,
    x: jax.Array,
    dones: jax.Array,
    hc0: tuple[jax.Array, jax.Array],
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Replay the cell over a [T, B, in] feature sequence with per-step
    episode-boundary resets (``dones`` f32 [T, B] is the done flag
    ENTERING each step, the rollout's stored convention). Returns
    (latents [T, B, H], final (h, c)). Used by the recurrent PPO update
    to recompute latents from the iteration's initial state."""

    def step(hc, inp):
        x_t, done_t = inp
        latent, hc = masked_lstm_step(p_lstm, x_t, hc, done_t)
        return hc, latent

    hc, latents = jax.lax.scan(step, hc0, (x, dones))
    return latents, hc
