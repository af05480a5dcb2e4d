"""HostTrainer: PPO over host-stepped environments (the ALE path).

The primary trainer (`clip_ppo_tpu.train.runner.Trainer`) requires
device-resident pure-JAX envs — the whole iteration is one XLA program.
Environments whose dynamics run on the host (the real ALE emulator via
`envs/atari/ale_adapter.ALEVectorEnv`, or any gymnasium-API vector env)
need the reference's loop shape instead: host rollout with a jitted
policy step, then the jitted GAE + minibatch update
(`ppo_atari.py:154-337`). This trainer provides that path with the same
update math (`clip_ppo_tpu.train.ppo`), so training on the emulator is a
constructor swap, not a rewrite.

Host↔device traffic per rollout is two bulk transfers (the stacked
observation batch up, the action/logprob/value streams back per step),
plus one jitted update — the per-step cost is one policy-step dispatch,
which is the same boundary the reference pays.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.train import gae as gae_mod
from clip_ppo_tpu.train import ppo as ppo_mod


@dataclasses.dataclass
class HostTrainState:
    params: dict
    opt_state: Any
    obs: np.ndarray          # current observations (host)
    next_done: np.ndarray    # [N] float32 (host)
    key: jax.Array


class HostTrainer:
    """PPO for host-API vector envs (``reset(seed)`` / ``step(actions)``
    with gymnasium-style vectorized infos)."""

    def __init__(
        self,
        cfg: ppo_mod.PPOConfig,
        env,
        num_iterations: int,
        features_fn: agent_mod.FeatureFn = agent_mod.cnn_features,
        frozen_params: Any = None,
    ):
        self.cfg = cfg
        self.env = env
        self.num_iterations = num_iterations
        self.features_fn = features_fn
        self.frozen_params = frozen_params
        self.optimizer = ppo_mod.make_optimizer(cfg)
        self._jit_policy = jax.jit(self._policy_step)
        self._jit_update = jax.jit(self._update)

    # -- jitted pieces ---------------------------------------------------------

    def _policy_step(self, params, obs, key, frozen):
        key, k_act = jax.random.split(key)
        action, logprob, _, value = agent_mod.get_action_and_value(
            params, obs, k_act, self.features_fn, frozen
        )
        return action, logprob, value, key

    def _update(self, params, opt_state, batch, last_obs, last_done,
                iteration, key, frozen):
        next_value = agent_mod.get_value(
            params, last_obs, self.features_fn, frozen
        )
        advantages, returns = gae_mod.compute_gae(
            batch["rewards"], batch["values"], batch["dones"],
            next_value, last_done, self.cfg.gamma, self.cfg.gae_lambda,
        )
        bs = self.cfg.batch_size
        flat = {
            "obs": batch["obs"].reshape((bs,) + batch["obs"].shape[2:]),
            "actions": batch["actions"].reshape(bs),
            "logprobs": batch["logprobs"].reshape(bs),
            "advantages": advantages.reshape(bs),
            "returns": returns.reshape(bs),
            "values": batch["values"].reshape(bs),
        }
        lr = (
            ppo_mod.anneal_lr(self.cfg, iteration, self.num_iterations)
            if self.cfg.anneal_lr
            else jnp.float32(self.cfg.learning_rate)
        )
        opt_state = ppo_mod.set_learning_rate(opt_state, lr)
        params, opt_state, metrics = ppo_mod.update_epochs(
            params, opt_state, flat, key, self.cfg, self.optimizer,
            self.features_fn, None, 0.0, frozen=frozen,
        )
        scalars = {
            "learning_rate": lr,
            "value_loss": metrics.v_loss,
            "policy_loss": metrics.pg_loss,
            "entropy": metrics.entropy,
            "old_approx_kl": metrics.old_approx_kl,
            "approx_kl": metrics.approx_kl,
            "clipfrac": metrics.clipfrac,
            "explained_variance": ppo_mod.explained_variance(
                flat["values"], flat["returns"]
            ),
            "clip_loss": metrics.clip_loss,
        }
        return params, opt_state, scalars

    # -- host loop --------------------------------------------------------------

    def init_state(self, params: dict, seed: int) -> HostTrainState:
        obs, _ = self.env.reset(seed=seed)
        return HostTrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            obs=np.asarray(obs),
            next_done=np.zeros(self.cfg.num_envs, np.float32),
            key=jax.random.PRNGKey(seed),
        )

    def run_iteration(self, state: HostTrainState, iteration: int):
        """Host rollout (reference loop shape) + jitted update.

        Returns (state, scalars_numpy, episodes) where ``episodes`` is a
        list of (return, length) for episodes finished this iteration.
        """
        cfg = self.cfg
        T, N = cfg.num_steps, cfg.num_envs
        obs_buf = np.empty((T, N) + state.obs.shape[1:], state.obs.dtype)
        act_buf = np.empty((T, N), np.int32)
        logp_buf = np.empty((T, N), np.float32)
        rew_buf = np.empty((T, N), np.float32)
        done_buf = np.empty((T, N), np.float32)
        val_buf = np.empty((T, N), np.float32)
        episodes: list[tuple[float, int]] = []

        obs, next_done, key = state.obs, state.next_done, state.key
        for t in range(T):
            obs_buf[t] = obs
            done_buf[t] = next_done
            action, logprob, value, key = self._jit_policy(
                state.params, jnp.asarray(obs), key, self.frozen_params
            )
            action = np.asarray(action)
            act_buf[t] = action
            logp_buf[t] = np.asarray(logprob)
            val_buf[t] = np.asarray(value)
            obs, reward, term, trunc, infos = self.env.step(action)
            obs = np.asarray(obs)
            rew_buf[t] = np.asarray(reward)
            next_done = (np.asarray(term) | np.asarray(trunc)).astype(np.float32)
            if "episode" in infos:
                mask = np.asarray(infos["episode"]["_r"])
                for i in np.nonzero(mask)[0]:
                    episodes.append(
                        (float(infos["episode"]["r"][i]),
                         int(infos["episode"]["l"][i]))
                    )

        batch = {
            "obs": jnp.asarray(obs_buf),
            "actions": jnp.asarray(act_buf),
            "logprobs": jnp.asarray(logp_buf),
            "rewards": jnp.asarray(rew_buf),
            "dones": jnp.asarray(done_buf),
            "values": jnp.asarray(val_buf),
        }
        key, k_update = jax.random.split(key)
        params, opt_state, scalars = self._jit_update(
            state.params, state.opt_state, batch,
            jnp.asarray(obs), jnp.asarray(next_done),
            jnp.int32(iteration), k_update, self.frozen_params,
        )
        scalars = jax.device_get(scalars)
        new_state = HostTrainState(
            params=params, opt_state=opt_state,
            obs=obs, next_done=next_done, key=key,
        )
        return new_state, scalars, episodes
