"""HostTrainer: PPO + CLIP-PPO over host-stepped environments (the ALE path).

The primary trainer (`clip_ppo_tpu.train.runner.Trainer`) requires
device-resident pure-JAX envs — the whole iteration is one XLA program.
Environments whose dynamics run on the host (the real ALE emulator via
`envs/atari/ale_adapter.ALEVectorEnv`, or any gymnasium-API vector env)
need the reference's loop shape instead: host rollout with a jitted
policy step, then the jitted GAE + minibatch update
(`ppo_atari.py:154-337`). This trainer provides that path with the same
update math (`clip_ppo_tpu.train.ppo`), so training on the emulator is a
constructor swap, not a rewrite.

Full reference parity on this path (`clip_ppo_atari.py:568-584, 642-670,
718-733`):

* per-step disturbances are applied ON DEVICE inside the jitted policy
  step, to the observation before it is stored or acted on — the CLIP
  scripts' placement (`clip_ppo_atari.py:568-584`); the bootstrap value
  uses the raw post-rollout observation like the reference's ``next_obs``;
* CLIP alignment with both gradient topologies: ``precomputed`` (text —
  pure monitor) and ``projected`` (image — gradient reaches only
  ``temporal_projection``), sharing `clip_ppo_tpu.train.ppo.update_epochs`
  with the device trainer, λ warmup included;
* the image-modality multi-frame CLIP encode runs inside the jitted
  update on the uploaded rollout batch (one batched ViT pass,
  `process_multiframe_clip_embeddings`, `clip_ppo_atari.py:272-299`).

Host↔device traffic per rollout is the per-step policy dispatch (the same
boundary the reference pays, `ppo_atari.py:248-255`) plus one bulk upload
of the stacked batch for the update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.ops import DisturbanceParams
from clip_ppo_tpu.ops.disturbances import disturb_uint8
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
    """PPO / CLIP-PPO for host-API vector envs (``reset(seed)`` /
    ``step(actions)`` with gymnasium-style vectorized infos).

    Args:
        cfg: PPO hyperparameters; ``cfg.clip_mode`` selects the CLIP
            gradient topology exactly as in the device trainer.
        env: host-API vector env (e.g. ``ALEVectorEnv``).
        num_iterations: total iterations (LR anneal + λ warmup horizon).
        disturbance: optional ``DisturbanceParams`` applied on device each
            step, before storing/acting (`clip_ppo_atari.py:568-584`).
        disturbance_semantics: ``"stack_frames"`` for Atari 4-stacks.
        embed_images_fn: optional ``(obs_uint8, frozen) -> [B, D]`` CLIP
            image-embedding fn run inside the jitted update (image
            modality); when set, per-iteration embeddings need not be
            passed to :meth:`run_iteration`.
        clip_lambda: target λ for the alignment loss (linear warmup over
            the first ``clip_warmup_fraction``, `clip_ppo_utils.py:26-46`).
        frame_fn: optional host callback returning an RGB frame of env 0,
            called once per rollout step (video capture on the emulator).
    """

    def __init__(
        self,
        cfg: ppo_mod.PPOConfig,
        env,
        num_iterations: int,
        features_fn: agent_mod.FeatureFn = agent_mod.cnn_features,
        frozen_params: Any = None,
        disturbance: Optional[DisturbanceParams] = None,
        disturbance_semantics: str = "stack_frames",
        embed_images_fn: Optional[Callable] = None,
        clip_lambda: float = 0.0,
        clip_warmup_fraction: float = 0.2,
        frame_fn: Optional[Callable[[], np.ndarray]] = None,
    ):
        self.cfg = cfg
        self.env = env
        self.num_iterations = num_iterations
        self.features_fn = features_fn
        self.frozen_params = frozen_params
        self.disturbance = disturbance
        self.disturbance_semantics = disturbance_semantics
        self.embed_images_fn = embed_images_fn
        self.clip_lambda = clip_lambda
        self.clip_warmup_fraction = clip_warmup_fraction
        self.frame_fn = frame_fn
        self.optimizer = ppo_mod.make_optimizer(cfg)
        self._jit_policy = jax.jit(self._policy_step)
        self._jit_update = jax.jit(self._update)

    # -- jitted pieces ---------------------------------------------------------

    def _policy_step(self, params, obs, key, frozen):
        """Disturb (optionally) + act. Returns the observation the agent
        actually saw so the host stores the disturbed version, matching the
        reference's in-place overwrite of ``next_obs``
        (`clip_ppo_atari.py:568-584`)."""
        key, k_act, k_dist = jax.random.split(key, 3)
        if self.disturbance is not None:
            obs = disturb_uint8(
                obs, k_dist, self.disturbance, self.disturbance_semantics
            )
        action, logprob, _, value = agent_mod.get_action_and_value(
            params, obs, k_act, self.features_fn, frozen
        )
        return obs, action, logprob, value, key

    def clip_lambda_eff(self, iteration) -> jax.Array:
        """λ with linear warmup; ``iteration`` is 1-indexed
        (`clip_ppo_utils.py:26-46`)."""
        from clip_ppo_tpu.models import clip_utils

        return clip_utils.get_clip_lambda_with_warmup(
            self.clip_lambda,
            jnp.asarray(iteration) - 1,
            self.num_iterations,
            self.clip_warmup_fraction,
        )

    def _update(self, params, opt_state, batch, last_obs, last_done,
                iteration, key, frozen, clip_embeddings):
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
        if self.embed_images_fn is not None:
            # image modality: one batched multi-frame CLIP pass over the
            # uploaded rollout batch (`clip_ppo_atari.py:642-670`).
            clip_embeddings = self.embed_images_fn(flat["obs"], frozen)
        lr = (
            ppo_mod.anneal_lr(self.cfg, iteration, self.num_iterations)
            if self.cfg.anneal_lr
            else jnp.float32(self.cfg.learning_rate)
        )
        opt_state = ppo_mod.set_learning_rate(opt_state, lr)
        params, opt_state, metrics = ppo_mod.update_epochs(
            params, opt_state, flat, key, self.cfg, self.optimizer,
            self.features_fn, clip_embeddings,
            self.clip_lambda_eff(iteration), frozen=frozen,
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
            "first_pg_loss": metrics.first_pg_loss,
            "first_v_loss": metrics.first_v_loss,
            "first_entropy": metrics.first_entropy,
            "first_clip_loss": metrics.first_clip_loss,
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

    def run_iteration(self, state: HostTrainState, iteration: int,
                      clip_embeddings=None):
        """Host rollout (reference loop shape) + jitted update.

        ``clip_embeddings``: optional [batch_size, D] precomputed
        embeddings (text modality). The reference generates Atari
        descriptions from the CURRENT game state once per iteration after
        the rollout (`clip_ppo_atari.py:648`) — callers needing that exact
        timing use :meth:`run_rollout` / :meth:`run_update` separately and
        encode in between (see the Atari CLIs' ale backend).

        Returns ``(state, scalars_numpy, episodes, extras)`` where
        ``episodes`` is a list of (return, length, rollout_step) tuples
        and ``extras`` holds env-0 video frames when ``frame_fn`` is set.
        """
        state, batch, episodes, extras = self.run_rollout(state)
        state, scalars = self.run_update(state, batch, iteration, clip_embeddings)
        return state, scalars, episodes, extras

    def run_rollout(self, state: HostTrainState):
        """Collect one rollout. Returns (state, batch, episodes, extras);
        ``batch`` is the device-ready stacked rollout."""
        cfg = self.cfg
        T, N = cfg.num_steps, cfg.num_envs
        obs_buf = np.empty((T, N) + state.obs.shape[1:], state.obs.dtype)
        act_buf = np.empty((T, N), np.int32)
        logp_buf = np.empty((T, N), np.float32)
        rew_buf = np.empty((T, N), np.float32)
        done_buf = np.empty((T, N), np.float32)
        val_buf = np.empty((T, N), np.float32)
        episodes: list[tuple[float, int]] = []
        frames: list[np.ndarray] = []
        frame_dones: list[bool] = []

        obs, next_done, key = state.obs, state.next_done, state.key
        for t in range(T):
            done_buf[t] = next_done
            seen_obs, action, logprob, value, key = self._jit_policy(
                state.params, jnp.asarray(obs), key, self.frozen_params
            )
            # the agent's (possibly disturbed) view is what gets stored
            obs_buf[t] = np.asarray(seen_obs)
            action = np.asarray(action)
            act_buf[t] = action
            logp_buf[t] = np.asarray(logprob)
            val_buf[t] = np.asarray(value)
            obs, reward, term, trunc, infos = self.env.step(action)
            obs = np.asarray(obs)
            rew_buf[t] = np.asarray(reward)
            done = (np.asarray(term) | np.asarray(trunc))
            next_done = done.astype(np.float32)
            if self.frame_fn is not None:
                frames.append(self.frame_fn())
                frame_dones.append(bool(done[0]))
            if "episode" in infos:
                mask = np.asarray(infos["episode"]["_r"])
                for i in np.nonzero(mask)[0]:
                    episodes.append(
                        (float(infos["episode"]["r"][i]),
                         int(infos["episode"]["l"][i]),
                         t)
                    )

        batch = {
            "obs": jnp.asarray(obs_buf),
            "actions": jnp.asarray(act_buf),
            "logprobs": jnp.asarray(logp_buf),
            "rewards": jnp.asarray(rew_buf),
            "dones": jnp.asarray(done_buf),
            "values": jnp.asarray(val_buf),
            # bootstrap inputs: the RAW post-rollout observation, like the
            # reference's ``next_obs`` after the loop (disturbance is
            # applied at the top of the next step, not here).
            "last_obs": jnp.asarray(obs),
            "last_done": jnp.asarray(next_done),
        }
        extras = {}
        if self.frame_fn is not None:
            extras["env0_frames"] = np.stack(frames)
            extras["env0_dones"] = np.asarray(frame_dones, bool)
        new_state = HostTrainState(
            params=state.params, opt_state=state.opt_state,
            obs=obs, next_done=next_done, key=key,
        )
        return new_state, batch, episodes, extras

    def run_update(self, state: HostTrainState, batch: dict, iteration: int,
                   clip_embeddings=None):
        """Jitted GAE + minibatch update over an uploaded rollout batch."""
        key, k_update = jax.random.split(state.key)
        params, opt_state, scalars = self._jit_update(
            state.params, state.opt_state, batch,
            batch["last_obs"], batch["last_done"],
            jnp.int32(iteration), k_update, self.frozen_params,
            clip_embeddings,
        )
        scalars = jax.device_get(scalars)
        new_state = dataclasses.replace(
            state, params=params, opt_state=opt_state, key=key
        )
        return new_state, scalars
