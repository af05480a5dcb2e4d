"""Clipped-PPO update: losses, optimizer, and the jitted epoch/minibatch scans.

Reproduces the reference update math exactly (`ppo_minigrid.py:298-350`):
ratio clipping, advantage normalization per minibatch, clipped value loss,
entropy bonus, approx-KL diagnostics, global-norm gradient clipping,
Adam(eps=1e-5), per-iteration linear LR anneal, and optional target-KL
early stopping at epoch granularity — but expressed as `lax.scan`s so the
whole 4-epoch × 4-minibatch update is one XLA program (SURVEY §7 "hard
part 5": stateful control flow under jit).

The CLIP alignment loss (`clip_ppo_minigrid.py:533-559`) is folded in with
its exact gradient topology: latents are stop-gradient'd, so with
precomputed (text) embeddings the loss is a pure monitor, while with
projected (image) embeddings gradients flow only into
``temporal_projection`` (`clip_ppo_atari.py:726-733`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.models import nature_cnn as cnn

# Every 4th minibatch (`clip_ppo_utils.py:24`) — single source of truth in
# models/clip_utils; re-exported here for the update scans.
from clip_ppo_tpu.models.clip_utils import CLIP_LOSS_FREQUENCY  # noqa: E402


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Static hyperparameters of the PPO update (hashable; jit-static)."""

    learning_rate: float = 2.5e-4
    num_envs: int = 8
    num_steps: int = 128
    anneal_lr: bool = True
    gamma: float = 0.99
    gae_lambda: float = 0.95
    num_minibatches: int = 4
    update_epochs: int = 4
    norm_adv: bool = True
    clip_coef: float = 0.1
    clip_vloss: bool = True
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    target_kl: Optional[float] = None
    # CLIP alignment ("none" | "precomputed" | "projected")
    clip_mode: str = "none"

    @property
    def batch_size(self) -> int:
        return self.num_envs * self.num_steps

    @property
    def minibatch_size(self) -> int:
        return self.batch_size // self.num_minibatches


class UpdateMetrics(NamedTuple):
    pg_loss: jax.Array
    v_loss: jax.Array
    entropy: jax.Array
    old_approx_kl: jax.Array
    approx_kl: jax.Array
    clipfrac: jax.Array
    clip_loss: jax.Array
    grad_norm: jax.Array
    # first minibatch of the first epoch — for the reference's verbose
    # debug print (`clip_ppo_minigrid.py:546-552`).
    first_pg_loss: jax.Array
    first_v_loss: jax.Array
    first_entropy: jax.Array
    first_clip_loss: jax.Array


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    """Adam(eps=1e-5) with global-norm clipping; LR injected per update so
    the per-iteration anneal (`ppo_minigrid.py:237-240`) stays exact.

    (A raveled-flat-vector Adam was tried for the latency-bound 8-env
    bench config and REVERTED: the per-minibatch unravel slices cost more
    than the per-leaf elementwise ops they replaced — update time
    5.76 → 6.20 ms measured on v5e.)"""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate, eps=1e-5
        ),
    )


def anneal_lr(cfg: PPOConfig, iteration: jax.Array, num_iterations: int) -> jax.Array:
    """lr = (1 - (it-1)/N) * lr0, held constant within an iteration."""
    frac = 1.0 - (iteration.astype(jnp.float32) - 1.0) / num_iterations
    return frac * cfg.learning_rate


def set_learning_rate(opt_state, lr: jax.Array):
    """Inject the annealed LR into the optax inject_hyperparams state."""
    clip_state, inject_state = opt_state
    hyperparams = dict(inject_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return (clip_state, inject_state._replace(hyperparams=hyperparams))


def ppo_loss(
    params: dict,
    mb: dict,
    cfg: PPOConfig,
    features_fn: agent_mod.FeatureFn,
    clip_embeddings: Optional[jax.Array],
    clip_lambda_eff: jax.Array,
    use_clip_this_mb: jax.Array,
    frozen=None,
):
    """Full minibatch loss; returns (loss, UpdateMetrics-ish aux dict)."""
    newlogprob, entropy, newvalue, hidden = agent_mod.evaluate_actions(
        params, mb["obs"], mb["actions"], features_fn, frozen
    )
    return _ppo_from_eval(
        params, mb, cfg, newlogprob, entropy, newvalue, hidden,
        clip_embeddings, clip_lambda_eff, use_clip_this_mb,
    )


def _ppo_from_eval(
    params, mb, cfg, newlogprob, entropy, newvalue, hidden,
    clip_embeddings, clip_lambda_eff, use_clip_this_mb,
):
    """The clipped-PPO math given the recomputed policy outputs — shared
    by the feed-forward loss above and the recurrent sequence-replay loss
    below (same reference math, `ppo_minigrid.py:298-350`)."""
    logratio = newlogprob - mb["logprobs"]
    ratio = jnp.exp(logratio)

    old_approx_kl = jnp.mean(-logratio)
    approx_kl = jnp.mean((ratio - 1.0) - logratio)
    clipfrac = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_coef).astype(jnp.float32))

    adv = mb["advantages"]
    if cfg.norm_adv:
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    pg_loss1 = -adv * ratio
    pg_loss2 = -adv * jnp.clip(ratio, 1.0 - cfg.clip_coef, 1.0 + cfg.clip_coef)
    pg_loss = jnp.maximum(pg_loss1, pg_loss2).mean()

    if cfg.clip_vloss:
        v_unclipped = (newvalue - mb["returns"]) ** 2
        v_clipped_pred = mb["values"] + jnp.clip(
            newvalue - mb["values"], -cfg.clip_coef, cfg.clip_coef
        )
        v_clipped = (v_clipped_pred - mb["returns"]) ** 2
        v_loss = 0.5 * jnp.maximum(v_unclipped, v_clipped).mean()
    else:
        v_loss = 0.5 * ((newvalue - mb["returns"]) ** 2).mean()

    entropy_loss = entropy.mean()
    loss = pg_loss - cfg.ent_coef * entropy_loss + cfg.vf_coef * v_loss

    clip_loss = jnp.float32(0.0)
    if cfg.clip_mode != "none":
        from clip_ppo_tpu.models.clip_utils import compute_cosine_embedding_loss

        def _clip_term():
            # z is the agent latent, detached (`clip_ppo_minigrid.py:269-271`);
            # the reference recomputes the forward pass for it — the value
            # is identical to `hidden`, so we reuse it under stop_gradient.
            z = jax.lax.stop_gradient(hidden)
            if cfg.clip_mode == "projected":
                # image modality: 4·512 concat embeddings through the
                # trainable temporal projection — the only path gradients
                # flow through.
                c = cnn.dense(params["temporal_projection"], clip_embeddings)
            else:
                c = clip_embeddings
            return compute_cosine_embedding_loss(z, c)

        # Gated to every CLIP_LOSS_FREQUENCY-th minibatch; lax.cond skips
        # the cosine+projection entirely on the other 3/4 of minibatches
        # (the reference's `minibatch_counter % CLIP_LOSS_FREQUENCY` guard).
        clip_loss = jax.lax.cond(
            use_clip_this_mb, _clip_term, lambda: jnp.float32(0.0)
        )
        loss = loss + clip_lambda_eff * clip_loss

    aux = {
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": entropy_loss,
        "old_approx_kl": old_approx_kl,
        "approx_kl": approx_kl,
        "clipfrac": clipfrac,
        "clip_loss": clip_loss,
    }
    return loss, aux


def update_epochs(
    params: dict,
    opt_state,
    batch: dict,
    key: jax.Array,
    cfg: PPOConfig,
    optimizer: optax.GradientTransformation,
    features_fn: agent_mod.FeatureFn = agent_mod.cnn_features,
    clip_embeddings: Optional[jax.Array] = None,
    clip_lambda_eff: jax.Array | float = 0.0,
    frozen=None,
    axis_name: Optional[str] = None,
) -> tuple[dict, Any, UpdateMetrics]:
    """Run ``update_epochs × num_minibatches`` PPO steps as nested scans.

    ``batch`` holds flattened [batch_size, ...] arrays: obs, actions,
    logprobs, advantages, returns, values. Metrics mirror what the
    reference logs: losses from the *last* minibatch, clipfrac averaged
    over all minibatches (`ppo_minigrid.py:357-366`).

    With ``axis_name`` set (data-parallel under ``shard_map``), ``batch``
    is the device-local shard and ``cfg`` describes the local sizes;
    gradients and metrics are ``pmean``'d across the axis each minibatch,
    so every device applies identical parameter updates and the
    params/opt_state stay replicated. Advantage normalization uses local
    minibatch statistics (standard DP-PPO practice; the estimator stays
    unbiased and dp=1 reduces to the reference exactly).
    """
    clip_lambda_eff = jnp.asarray(clip_lambda_eff, jnp.float32)
    grad_fn = jax.value_and_grad(ppo_loss, has_aux=True)

    def minibatch_step(carry, mb_data):
        params, opt_state, mb_counter, stop = carry
        mb, = (mb_data,)
        use_clip = (mb_counter % CLIP_LOSS_FREQUENCY) == 0
        (loss, aux), grads = grad_fn(
            params, mb, cfg, features_fn, clip_embeddings_mb(mb),
            clip_lambda_eff, use_clip, frozen,
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axis_name), aux
            )
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if cfg.target_kl is None:
            # No early-stop configured (the CleanRL default): ``stop`` is
            # statically False, so skip the ~2·|params|+|opt_state|
            # masking selects — at the latency-bound 8-env bench config
            # they are pure per-minibatch kernel-launch overhead.
            params_out, opt_out = new_params, new_opt_state
        else:
            # target-KL early stop: once triggered, later steps are identity.
            params_out = jax.tree_util.tree_map(
                lambda new, old: jnp.where(stop, old, new), new_params, params
            )
            opt_out = jax.tree_util.tree_map(
                lambda new, old: jnp.where(stop, old, new), new_opt_state,
                opt_state,
            )
        aux["grad_norm"] = grad_norm
        return (params_out, opt_out, mb_counter + 1, stop), aux

    def clip_embeddings_mb(mb):
        return mb.get("clip_embeddings")

    def epoch_step(carry, epoch_key):
        params, opt_state, mb_counter, stop = carry
        perm = jax.random.permutation(epoch_key, cfg.batch_size)
        # tree_map'd so pytree batch entries (the mission-conditioned
        # (obs, mission) pair) shuffle/split leaf-wise in lockstep.
        shuf = jax.tree_util.tree_map(lambda v: v[perm], batch)
        mbs = jax.tree_util.tree_map(
            lambda v: v.reshape(
                (cfg.num_minibatches, cfg.minibatch_size) + v.shape[1:]
            ),
            shuf,
        )
        (params, opt_state, mb_counter, stop), aux = jax.lax.scan(
            minibatch_step, (params, opt_state, mb_counter, stop), mbs
        )
        if cfg.target_kl is not None:
            # Reference checks the last minibatch's approx_kl per epoch
            # (`ppo_minigrid.py:349-350`).
            stop = stop | (aux["approx_kl"][-1] > cfg.target_kl)
        return (params, opt_state, mb_counter, stop), aux

    if clip_embeddings is not None:
        batch = dict(batch, clip_embeddings=clip_embeddings)

    epoch_keys = jax.random.split(key, cfg.update_epochs)
    init = (params, opt_state, jnp.int32(0), jnp.bool_(False))
    (params, opt_state, _, _), aux = jax.lax.scan(epoch_step, init, epoch_keys)

    # aux leaves have shape [update_epochs, num_minibatches].
    last = lambda a: a[-1, -1]
    metrics = UpdateMetrics(
        pg_loss=last(aux["pg_loss"]),
        v_loss=last(aux["v_loss"]),
        entropy=last(aux["entropy"]),
        old_approx_kl=last(aux["old_approx_kl"]),
        approx_kl=last(aux["approx_kl"]),
        clipfrac=jnp.mean(aux["clipfrac"]),
        clip_loss=last(aux["clip_loss"]),
        grad_norm=last(aux["grad_norm"]),
        first_pg_loss=aux["pg_loss"][0, 0],
        first_v_loss=aux["v_loss"][0, 0],
        first_entropy=aux["entropy"][0, 0],
        first_clip_loss=aux["clip_loss"][0, 0],
    )
    return params, opt_state, metrics


def recurrent_loss(
    params: dict,
    mb: dict,
    cfg: PPOConfig,
    features_fn: agent_mod.FeatureFn,
    frozen=None,
):
    """Minibatch loss for the recurrent (LSTM) agent.

    ``mb`` holds [T, n, ...] SEQUENCES for a slice of n envs — obs,
    actions, logprobs, advantages, returns, values, dones — plus the
    iteration-initial cell state h0/c0 [n, H]. The base trunk runs over
    the whole [T·n] batch as one program (MXU work); only the cell
    recurrence replays sequentially, with the same done-reset the rollout
    applied, so the recomputed latents match the rollout's exactly at
    unchanged parameters (pinned in tests/test_recurrent.py).
    """
    from clip_ppo_tpu.models import recurrent as rec

    t, n = mb["actions"].shape
    # obs is an opaque pytree: a plain [T, n, ...] array, or the
    # (obs, mission) pair under --mission-conditioning
    obs2d = jax.tree_util.tree_map(
        lambda v: v.reshape((t * n,) + v.shape[2:]), mb["obs"]
    )
    feats = features_fn(params, obs2d, frozen).reshape(t, n, -1)
    hs, _ = rec.unroll(
        params["lstm"], feats, mb["dones"], (mb["h0"], mb["c0"])
    )
    latents = rec.latent(feats, hs)
    logits, newvalue = agent_mod.heads(params, latents)
    newlogprob, entropy = agent_mod.logprob_entropy(logits, mb["actions"])
    return _ppo_from_eval(
        params, mb, cfg, newlogprob, entropy, newvalue, latents,
        None, jnp.float32(0.0), jnp.bool_(False),
    )


def update_epochs_recurrent(
    params: dict,
    opt_state,
    batch: dict,
    initial_lstm_state: tuple[jax.Array, jax.Array],
    key: jax.Array,
    cfg: PPOConfig,
    optimizer: optax.GradientTransformation,
    features_fn: agent_mod.FeatureFn = agent_mod.cnn_features,
    axis_name: Optional[str] = None,
) -> tuple[dict, Any, UpdateMetrics]:
    """PPO epochs for the recurrent agent: minibatches are ENV slices
    (CleanRL ``ppo_atari_lstm``) so each minibatch replays its envs'
    whole [T] sequences from the iteration's initial LSTM state —
    time-contiguity is what makes the recurrent logprob recompute valid.
    ``batch`` stays in rollout layout ([T, N, ...]) and must include
    ``dones``; num_envs must divide by num_minibatches.

    With ``axis_name`` set (data-parallel under ``shard_map``), ``batch``
    / ``initial_lstm_state`` are the device-local env shards and ``cfg``
    the local sizes; gradients and metrics are ``pmean``'d per minibatch
    like :func:`update_epochs`, so parameters stay replicated."""
    assert cfg.num_envs % cfg.num_minibatches == 0, (
        f"recurrent PPO minibatches over envs: num_envs={cfg.num_envs} "
        f"not divisible by num_minibatches={cfg.num_minibatches}"
    )
    epm = cfg.num_envs // cfg.num_minibatches
    h0, c0 = initial_lstm_state
    grad_fn = jax.value_and_grad(recurrent_loss, has_aux=True)

    def minibatch_step(carry, mb):
        params, opt_state, stop = carry
        (loss, aux), grads = grad_fn(params, mb, cfg, features_fn)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axis_name), aux
            )
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if cfg.target_kl is None:
            params_out, opt_out = new_params, new_opt_state
        else:
            params_out = jax.tree_util.tree_map(
                lambda new, old: jnp.where(stop, old, new), new_params, params
            )
            opt_out = jax.tree_util.tree_map(
                lambda new, old: jnp.where(stop, old, new), new_opt_state,
                opt_state,
            )
        aux["grad_norm"] = grad_norm
        return (params_out, opt_out, stop), aux

    def epoch_step(carry, epoch_key):
        params, opt_state, stop = carry
        perm = jax.random.permutation(epoch_key, cfg.num_envs)

        def env_slice(v):  # [T, N, ...] → [mb, T, epm, ...] (leaf-wise:
            # obs may be the mission-conditioned (obs, mission) pair)
            return (v[:, perm]
                    .reshape((v.shape[0], cfg.num_minibatches, epm)
                             + v.shape[2:])
                    .swapaxes(0, 1))

        mbs = {k: jax.tree_util.tree_map(env_slice, v)
               for k, v in batch.items()}
        mbs["h0"] = h0[perm].reshape(cfg.num_minibatches, epm, -1)
        mbs["c0"] = c0[perm].reshape(cfg.num_minibatches, epm, -1)
        (params, opt_state, stop), aux = jax.lax.scan(
            minibatch_step, (params, opt_state, stop), mbs
        )
        if cfg.target_kl is not None:
            stop = stop | (aux["approx_kl"][-1] > cfg.target_kl)
        return (params, opt_state, stop), aux

    epoch_keys = jax.random.split(key, cfg.update_epochs)
    init = (params, opt_state, jnp.bool_(False))
    (params, opt_state, _), aux = jax.lax.scan(epoch_step, init, epoch_keys)

    last = lambda a: a[-1, -1]
    metrics = UpdateMetrics(
        pg_loss=last(aux["pg_loss"]),
        v_loss=last(aux["v_loss"]),
        entropy=last(aux["entropy"]),
        old_approx_kl=last(aux["old_approx_kl"]),
        approx_kl=last(aux["approx_kl"]),
        clipfrac=jnp.mean(aux["clipfrac"]),
        clip_loss=last(aux["clip_loss"]),
        grad_norm=last(aux["grad_norm"]),
        first_pg_loss=aux["pg_loss"][0, 0],
        first_v_loss=aux["v_loss"][0, 0],
        first_entropy=aux["entropy"][0, 0],
        first_clip_loss=aux["clip_loss"][0, 0],
    )
    return params, opt_state, metrics


def explained_variance(values: jax.Array, returns: jax.Array) -> jax.Array:
    """1 - Var[y - pred]/Var[y], NaN when Var[y]==0 (`ppo_minigrid.py:352-354`)."""
    var_y = jnp.var(returns)
    ev = 1.0 - jnp.var(returns - values) / var_y
    return jnp.where(var_y == 0, jnp.nan, ev)
