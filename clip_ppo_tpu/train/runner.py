"""Training runner: one jitted program per PPO iteration.

The reference iteration is host-driven (rollout loop, GAE loop, 16
minibatch steps — `ppo_minigrid.py:235-350`). Here it is a single jitted
function: rollout scan → GAE scan → update scans, with only the logging
scalars and episode statistics returned to the host. The image modality
is fully in-graph (the CLIP image encoder is device compute); the text
modality is fully in-graph too when a description-embedding table is
precomputed (``embed_desc_fn`` — MiniGrid descriptions are enumerable),
and otherwise runs as two jitted halves around the host-side
description/tokenization step (SURVEY §7 hard part 6).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.ops import DisturbanceParams
from clip_ppo_tpu.train import gae as gae_mod
from clip_ppo_tpu.train import ppo as ppo_mod
from clip_ppo_tpu.train import rollout as rollout_mod

# The fixed, sorted set of per-iteration log scalars produced by _update.
# A module-level constant (not a trace-time side effect) so
# fetch_logs_chunk works without a prior run in the same Trainer.
SCALAR_KEYS = (
    "approx_kl", "clip_loss", "clipfrac", "entropy", "explained_variance",
    "first_clip_loss", "first_entropy", "first_pg_loss", "first_v_loss",
    "intrinsic_reward", "learning_rate", "old_approx_kl", "policy_loss",
    "value_loss",
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: Any
    vec_state: Any
    obs: jax.Array
    next_done: jax.Array
    key: jax.Array
    # (h, c) per env for the recurrent agent; None for feed-forward.
    lstm_state: Any = None
    # SimHash visit-count table for the exploration bonus; None when off.
    counts: Any = None
    # Per-env episodic first-visit bitset (--episodic-bonus); None when off.
    episodic_mem: Any = None


class Trainer:
    """Owns the jitted train-iteration; host code only logs and checkpoints.

    Args:
        cfg: PPO hyperparameters (static).
        env: JaxVectorEnv.
        num_iterations: total iterations (static, for LR anneal).
        disturbance: optional DisturbanceParams applied on-device each step.
        features_fn: agent feature trunk.
        embed_images_fn: optional in-graph CLIP image-embedding function
            ``(b_obs_uint8 [B,H,W,C]) -> [B, D]`` for image modality
            (concat-per-frame for Atari happens inside it).
        embed_desc_fn: optional in-graph text-embedding function
            ``(rollout_desc, frozen) -> [B, D]`` over the per-step state
            snapshots (e.g. a precomputed MiniGrid description table,
            `clip_utils.make_text_table_embed_fn`) — makes the text
            modality fully fused, no host tokenization in the loop.
        embed_random_fn: optional in-graph RANDOM_ENCODER embedding
            function ``(key) -> [B, D]`` (normalized Gaussians per
            iteration) — fuses the random ablation as well.
        clip_lambda: target λ for the alignment loss (warmup applied here,
            `clip_ppo_utils.py:26-46`).
        clip_warmup_fraction: fraction of iterations for linear λ warmup.
        mesh: optional ``jax.sharding.Mesh`` with a ``dp`` axis. When given,
            environments and the PPO batch are sharded across ``dp`` while
            parameters/optimizer state are replicated; GSPMD inserts the
            gradient all-reduces over ICI (SURVEY §2c DP plan — the
            reference is single-device, `ppo_minigrid.py:195`).
    """

    def __init__(
        self,
        cfg: ppo_mod.PPOConfig,
        env,
        num_iterations: int,
        disturbance: Optional[DisturbanceParams] = None,
        disturbance_semantics: str = "batched",
        features_fn: agent_mod.FeatureFn = agent_mod.cnn_features,
        embed_images_fn: Optional[Callable] = None,
        embed_desc_fn: Optional[Callable] = None,
        embed_random_fn: Optional[Callable] = None,
        clip_lambda: float = 0.0,
        clip_warmup_fraction: float = 0.2,
        capture_env0: bool = False,
        frozen_params: Any = None,
        mesh: Any = None,
        recurrent: bool = False,
        exploration_bonus: float = 0.0,
        exploration_bits: int = 18,
        episodic_bonus: float = 0.0,
        bonus_decay: float = 0.0,
        mission_conditioning: bool = False,
    ):
        self.cfg = cfg
        self.env = env
        self.num_iterations = num_iterations
        self.mesh = mesh
        self.recurrent = recurrent
        # Mission conditioning (models/mission.py): the policy consumes
        # (obs, mission) pairs, with the structured instruction gathered
        # from the env state each step (beyond-reference: the reference
        # drops the mission via ImgObsWrapper, `ppo_minigrid.py:110`).
        self.mission_conditioning = mission_conditioning
        if mission_conditioning:
            assert hasattr(env, "mission_fn"), (
                "--mission-conditioning needs an env exposing mission_fn "
                "(the pure-JAX MiniGrid/BabyAI families)"
            )
            assert embed_images_fn is None, (
                "--mission-conditioning composes with the text modality "
                "(embed_desc_fn), not the image modality: embed_images_fn "
                "consumes raw image batches"
            )
        # Count-based exploration (train/exploration.py): β > 0 adds
        # β/sqrt(N(bucket)) to the env reward before GAE. The projection
        # matrix is created in init_state (it needs the obs shape).
        # episodic_bonus adds the NGU-style first-visit-this-episode term
        # over the same buckets (r5; composable — see exploration.py).
        self.exploration_bonus = float(exploration_bonus)
        self.exploration_bits = exploration_bits
        self.episodic_bonus = float(episodic_bonus)
        # bonus_decay > 0 anneals the TOTAL intrinsic reward linearly to
        # zero over the first `bonus_decay` fraction of training (1.0 =
        # the full run): the bonus funds discovery early, then the
        # terminal reward alone shapes the final policy — for regimes
        # where a constant bonus keeps outcompeting a sparse reward
        # chain after transient solves (blocked-door ObstructedMaze
        # composites, docs/PERFORMANCE.md).
        self.bonus_decay = float(bonus_decay)
        self._expl_proj = None
        if recurrent:
            # LSTM minibatches are env slices; CLIP embedding paths pair
            # flat minibatches with precomputed embeddings and are not
            # wired through the sequence replay (the reference has no
            # recurrent agent at all — this is a beyond-parity feature).
            assert embed_images_fn is None and embed_desc_fn is None \
                and embed_random_fn is None and clip_lambda == 0.0, (
                "--recurrent supports vanilla PPO only (no CLIP modality)"
            )
            # Under a dp mesh each device minibatches its LOCAL env
            # slice (r4; the r3 restriction is lifted) — the local env
            # count must still divide into minibatches.
            local_envs = cfg.num_envs // (
                mesh.shape["dp"] if mesh is not None else 1
            )
            assert local_envs % cfg.num_minibatches == 0, (
                f"recurrent PPO minibatches over envs: per-device "
                f"num_envs={local_envs} not divisible by "
                f"num_minibatches={cfg.num_minibatches}"
            )
        self.tp = 1
        if mesh is not None:
            assert cfg.num_envs % mesh.shape["dp"] == 0, (
                f"num_envs={cfg.num_envs} not divisible by "
                f"dp={mesh.shape['dp']}"
            )
            local_batch = (cfg.num_envs // mesh.shape["dp"]) * cfg.num_steps
            assert local_batch % cfg.num_minibatches == 0, (
                f"per-device batch {local_batch} not divisible by "
                f"num_minibatches={cfg.num_minibatches}"
            )
            self.tp = int(dict(mesh.shape).get("tp", 1))
            if self.tp > 1 and features_fn is not agent_mod.cnn_features:
                raise NotImplementedError(
                    "tp>1 shards the per-iteration CLIP embedding encode "
                    "(embed_images_fn) Megatron-style; FROZEN_CLIP feature "
                    "trunks run inside the dp shard_map update and are not "
                    "tp-sharded (SURVEY §2c: TP targets the big-encoder "
                    "eval load, clip_ppo_utils.py:211-215)"
                )
            if frozen_params is not None and self.tp == 1:
                from clip_ppo_tpu.parallel.mesh import replicate_tree

                frozen_params = replicate_tree(mesh, frozen_params)
            # tp>1: frozen weights arrive already placed by the caller
            # (tensor-sharded via parallel.tp.shard_clip_params); GSPMD
            # partitions the embed encode along them.
        self.disturbance = disturbance
        self.disturbance_semantics = disturbance_semantics
        # View fast path: MiniGrid observations are EXACT ×12 nearest
        # upscales of the 7×7 symbolic view, so when nothing consumes the
        # 84×84 image itself (no disturbances, no image-modality CLIP,
        # default CNN trunk), the policy/update run on the raw views with
        # a reformulated conv1 (`nature_cnn.nature_cnn_view`) — same
        # numerics, ~14× fewer conv1 FLOPs, no per-step batch-minor
        # relayout copies (25.7 µs/step on v5e), 144× smaller obs store.
        self.view_mode = (
            disturbance is None
            and embed_images_fn is None
            and features_fn is agent_mod.cnn_features
            and getattr(env, "supports_view_obs", False)
        )
        if self.view_mode:
            features_fn = agent_mod.make_view_features(env.view_upscale)
        if mission_conditioning:
            # Wrap AFTER the view decision so missions compose with the
            # view fast path (the pair is (view, mission)).
            from clip_ppo_tpu.models import mission as mission_mod

            features_fn = mission_mod.make_mission_features(features_fn)
        self.features_fn = features_fn
        self.embed_images_fn = embed_images_fn
        self.embed_desc_fn = embed_desc_fn
        self.embed_random_fn = embed_random_fn
        self.clip_lambda = clip_lambda
        self.clip_warmup_fraction = clip_warmup_fraction
        # Surface env 0's rollout frames for video capture (RecordVideo
        # equivalent, io/video.py) — one extra D2H copy per iteration.
        self.capture_env0 = capture_env0
        # Non-optimized weights (frozen CLIP towers) used by the feature /
        # embedding fns. Passed to the jitted programs as a separate
        # NON-donated argument: closing over large weights would bake them
        # into the compiled program as constants (bloated executables; on
        # tunneled devices the compile request can exceed limits — observed
        # HTTP 413), and carrying them inside the donated TrainState would
        # invalidate the host's references to the same buffers.
        self.frozen_params = frozen_params
        # Outer-graph feature trunk: under a mesh, Pallas-bearing trunks
        # (FROZEN_CLIP's ViT encode) are run per-shard via shard_map — a
        # Pallas custom call has no GSPMD partitioning rule, so left in the
        # global graph XLA would all-gather the dp-sharded batch onto every
        # device before encoding. The raw features_fn is still used inside
        # the (already shard_map'd) update.
        self.outer_features_fn = (
            features_fn if mesh is None else self._shard_features(features_fn)
        )
        self.optimizer = ppo_mod.make_optimizer(cfg)
        self._jit_pack_logs = jax.jit(self._pack_logs)
        self._jit_iteration = jax.jit(self._iteration, donate_argnums=(0,))
        self._jit_rollout_half = jax.jit(self._rollout_half, donate_argnums=(0,))
        self._jit_update_half = jax.jit(self._update_half, donate_argnums=(0,))
        self._jit_chunks: dict[int, Callable] = {}

    def _shard_features(self, fn: agent_mod.FeatureFn) -> agent_mod.FeatureFn:
        """Wrap a feature trunk so it runs per-shard over the ``dp`` axis
        (params/frozen replicated, batch axis sharded). At dp=1 this is the
        unwrapped trunk exactly."""
        from jax.sharding import PartitionSpec as P

        def outer(params: dict, obs: jax.Array, frozen) -> jax.Array:
            return jax.shard_map(
                fn, mesh=self.mesh, in_specs=(P(), P("dp"), P()),
                out_specs=P("dp"), check_vma=False,
            )(params, obs, frozen)

        return outer

    # -- initialization ------------------------------------------------------

    def init_state(self, params: dict, seed: int) -> TrainState:
        key = jax.random.PRNGKey(seed)
        key, k_env = jax.random.split(key)
        vec_state, obs = self.env.reset_fn(k_env)
        if self.view_mode:
            obs = self.env.observe_view_fn(vec_state)
        opt_state = self.optimizer.init(params)
        lstm_state = None
        if self.recurrent:
            from clip_ppo_tpu.models import recurrent as rec

            lstm_state = rec.init_zero_state(
                self.env.num_envs, params["lstm"]["w_hh"].shape[0]
            )
        counts = None
        episodic_mem = None
        if self.exploration_bonus > 0.0 or self.episodic_bonus > 0.0:
            from clip_ppo_tpu.train import exploration

            obs_dim = int(np.prod(obs.shape[1:]))
            # Drawn from the run seed so reruns bucket identically; tiny
            # ([D, bits]), so closing over it in the jitted iteration is
            # safe (unlike model weights — see frozen_params).
            self._expl_proj = exploration.make_projection(
                jax.random.PRNGKey(seed ^ 0x5EED), obs_dim,
                self.exploration_bits,
            )
            if self.exploration_bonus > 0.0:
                counts = exploration.init_counts(self.exploration_bits)
            if self.episodic_bonus > 0.0:
                episodic_mem = exploration.init_episodic_mem(
                    self.env.num_envs, self.exploration_bits
                )
        state = TrainState(
            params=params,
            opt_state=opt_state,
            vec_state=vec_state,
            obs=obs,
            next_done=jnp.zeros(self.env.num_envs, jnp.float32),
            key=key,
            lstm_state=lstm_state,
            counts=counts,
            episodic_mem=episodic_mem,
        )
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        """Lay the carry out on the dp mesh: env state + batch axes sharded,
        params / optimizer / PRNG key replicated. Explicit input shardings
        are enough — GSPMD propagates them through the jitted iteration and
        inserts the gradient all-reduces. No-op without a mesh, so callers
        (e.g. checkpoint resume) may call it unconditionally."""
        if self.mesh is None:
            return state
        from clip_ppo_tpu.parallel.mesh import (
            batch_sharding,
            put,
            replicate_tree,
            shard_env_state,
        )

        return dataclasses.replace(
            state,
            params=replicate_tree(self.mesh, state.params),
            opt_state=replicate_tree(self.mesh, state.opt_state),
            vec_state=shard_env_state(self.mesh, state.vec_state),
            obs=put(state.obs, batch_sharding(self.mesh)),
            next_done=put(state.next_done, batch_sharding(self.mesh)),
            key=replicate_tree(self.mesh, state.key),
            # per-env LSTM carry shards with the envs (r4: recurrent+dp)
            lstm_state=(
                None if state.lstm_state is None
                else jax.tree_util.tree_map(
                    lambda h: put(h, batch_sharding(self.mesh)),
                    state.lstm_state,
                )
            ),
            # the count table is global state (all envs' visits land in
            # it); replicated, with GSPMD reducing the scatter-adds
            counts=(
                None if state.counts is None
                else replicate_tree(self.mesh, state.counts)
            ),
            # the episodic bitset is PER-ENV state — it shards with the
            # envs on dp (each device replays only its shard's visits)
            episodic_mem=(
                None if state.episodic_mem is None
                else put(state.episodic_mem, batch_sharding(self.mesh))
            ),
        )

    def clip_lambda_eff(self, iteration: jax.Array) -> jax.Array:
        """λ with linear warmup (`clip_ppo_utils.py:26-46`); iteration is
        1-indexed, the warmup schedule uses ``iteration-1``."""
        from clip_ppo_tpu.models import clip_utils

        return clip_utils.get_clip_lambda_with_warmup(
            self.clip_lambda,
            iteration - 1,
            self.num_iterations,
            self.clip_warmup_fraction,
        )

    # -- fused path (no CLIP, or in-graph image CLIP) -------------------------

    def _rollout(self, state: TrainState, frozen, collect_desc=None):
        if self.recurrent:
            (vec_state, obs, next_done, lstm_state, key, batch) = (
                rollout_mod.collect_rollout_recurrent(
                    state.params,
                    self.env,
                    state.vec_state,
                    state.obs,
                    state.next_done,
                    state.lstm_state,
                    state.key,
                    self.cfg.num_steps,
                    self.disturbance,
                    self.disturbance_semantics,
                    self.features_fn,
                    self.capture_env0,
                    frozen,
                    small_obs=self.view_mode,
                    mission_fn=(
                        self.env.mission_fn
                        if self.mission_conditioning else None
                    ),
                )
            )
            state = dataclasses.replace(
                state, vec_state=vec_state, obs=obs, next_done=next_done,
                key=key, lstm_state=lstm_state,
            )
            return state, batch
        if collect_desc is None:
            # Only the text paths consume per-step description snapshots:
            # the fused text-table path here (embed_desc_fn), and the
            # split path (host tokenization), whose _rollout_half always
            # collects. Everything else skips the per-step snapshot ops.
            collect_desc = self.embed_desc_fn is not None
        vec_state, obs, next_done, key, batch = rollout_mod.collect_rollout(
            state.params,
            self.env,
            state.vec_state,
            state.obs,
            state.next_done,
            state.key,
            self.cfg.num_steps,
            self.disturbance,
            self.disturbance_semantics,
            self.outer_features_fn,
            self.capture_env0,
            frozen,
            collect_desc=collect_desc,
            small_obs=self.view_mode,
            mission_fn=(
                self.env.mission_fn if self.mission_conditioning else None
            ),
        )
        state = dataclasses.replace(
            state, vec_state=vec_state, obs=obs, next_done=next_done, key=key
        )
        return state, batch

    def _data2d(self, state: TrainState, batch: rollout_mod.RolloutBatch,
                frozen) -> dict:
        """GAE + the update inputs in rollout layout ([T, N, ...], env axis
        dp-sharded under a mesh). Flattening to the reference's t-major
        [T·N] batch happens late — inside the shard_mapped update body for
        the mesh path — so the dp-sharded batch is consumed shard-local
        with no cross-device reshard (each device flattens its own
        [T, N/dp] block)."""
        if self.recurrent:
            # Bootstrap value through the carried cell state, with the
            # same done-reset the next rollout step would apply.
            from clip_ppo_tpu.models import nature_cnn as cnn
            from clip_ppo_tpu.models import recurrent as rec

            boot_obs = (
                (state.obs, self.env.mission_fn(state.vec_state))
                if self.mission_conditioning else state.obs
            )
            feats = self.features_fn(state.params, boot_obs, frozen)
            h, _ = rec.masked_lstm_step(
                state.params["lstm"], feats, state.lstm_state,
                state.next_done,
            )
            next_value = cnn.dense(
                state.params["critic"], rec.latent(feats, h)
            )[..., 0]
        else:
            boot_obs = (
                (state.obs, self.env.mission_fn(state.vec_state))
                if self.mission_conditioning else state.obs
            )
            next_value = agent_mod.get_value(
                state.params, boot_obs, self.outer_features_fn, frozen
            )
        advantages, returns = gae_mod.compute_gae(
            batch.rewards, batch.values, batch.dones,
            next_value, state.next_done, self.cfg.gamma, self.cfg.gae_lambda,
        )
        data = {
            "obs": batch.obs,
            "actions": batch.actions.astype(jnp.int32),
            "logprobs": batch.logprobs,
            "advantages": advantages,
            "returns": returns,
            "values": batch.values,
        }
        if self.recurrent:
            # the update's sequence replay needs the per-step boundaries
            data["dones"] = batch.dones
        return data

    @staticmethod
    def _flatten(data: dict) -> dict:
        """[T, N, ...] → t-major [T·N, ...] (the reference's b_* layout,
        `ppo_minigrid.py:291-296`). tree_map'd so pytree entries (the
        mission-conditioned (obs, mission) pair) flatten leaf-wise."""
        return jax.tree_util.tree_map(
            lambda v: v.reshape((-1,) + v.shape[2:]), data
        )

    def _update(self, state: TrainState, data: dict, iteration: jax.Array,
                clip_embeddings: Optional[jax.Array], frozen=None,
                initial_lstm_state=None):
        lr = (
            ppo_mod.anneal_lr(self.cfg, iteration, self.num_iterations)
            if self.cfg.anneal_lr
            else jnp.float32(self.cfg.learning_rate)
        )
        opt_state = ppo_mod.set_learning_rate(state.opt_state, lr)
        key, k_update = jax.random.split(state.key)
        if self.recurrent:
            # data stays in rollout layout: minibatches are env slices
            # whose [T] sequences replay from the iteration's initial
            # LSTM state (ppo.update_epochs_recurrent). Under a mesh each
            # device minibatches its local env slice with pmean'd grads
            # (same deviation as `_update_sharded`: per-device shuffles;
            # dp=1 reduces to the replicated update exactly).
            if self.mesh is None:
                params, opt_state, metrics = ppo_mod.update_epochs_recurrent(
                    state.params, opt_state, data, initial_lstm_state,
                    k_update, self.cfg, self.optimizer, self.features_fn,
                )
            else:
                params, opt_state, metrics = self._update_recurrent_sharded(
                    state.params, opt_state, data, initial_lstm_state,
                    k_update,
                )
        elif self.mesh is None:
            params, opt_state, metrics = ppo_mod.update_epochs(
                state.params, opt_state, self._flatten(data), k_update,
                self.cfg, self.optimizer,
                self.features_fn, clip_embeddings,
                self.clip_lambda_eff(iteration),
                frozen=frozen,
            )
        else:
            if clip_embeddings is not None and clip_embeddings.ndim == 2:
                # host-computed [T·N, D] t-major embeddings (split-text
                # path) → rollout layout so they pair with the dp-sharded
                # batch inside the update body.
                clip_embeddings = clip_embeddings.reshape(
                    (self.cfg.num_steps, self.cfg.num_envs, -1)
                )
            params, opt_state, metrics = self._update_sharded(
                state.params, opt_state, data, k_update, clip_embeddings,
                self.clip_lambda_eff(iteration), frozen,
            )
        state = dataclasses.replace(
            state, params=params, opt_state=opt_state, key=key
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
                data["values"], data["returns"]
            ),
            "clip_loss": metrics.clip_loss,
            # first minibatch of the first epoch, for the reference's
            # verbose debug print (`clip_ppo_minigrid.py:546-552`)
            "first_pg_loss": metrics.first_pg_loss,
            "first_v_loss": metrics.first_v_loss,
            "first_entropy": metrics.first_entropy,
            "first_clip_loss": metrics.first_clip_loss,
        }
        return state, scalars

    def _update_sharded(self, params, opt_state, data, key, clip_embeddings,
                        lam, frozen):
        """Data-parallel PPO update as one `shard_map` over the ``dp`` axis.

        Inputs arrive in rollout layout ([T, N, ...], env axis sharded on
        ``dp``) and each device flattens its OWN [T, N/dp] block t-major
        inside the body — so the update consumes the rollout's shards
        directly, with no cross-device reshard (a global t-major flatten
        of a dp-sharded [T, N] batch is an all-to-all every iteration).
        Each device then permutes and minibatches its local batch, and
        gradients are `pmean`'d per minibatch so parameter updates stay
        replicated. At dp=1 the local flatten IS the reference's global
        t-major flatten, so this reduces to the replicated update exactly.
        """
        from jax.sharding import PartitionSpec as P

        dp = self.mesh.shape["dp"]
        local_cfg = dataclasses.replace(self.cfg, num_envs=self.cfg.num_envs // dp)

        def body(params, opt_state, data, key, clip_embeddings, lam, frozen):
            if dp > 1:  # decorrelate per-device shuffles (identity at dp=1
                # so dp=1 reduces to the reference update bit-for-bit)
                key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            flat = self._flatten(data)
            emb = (
                None if clip_embeddings is None
                else clip_embeddings.reshape((-1,) + clip_embeddings.shape[2:])
            )
            return ppo_mod.update_epochs(
                params, opt_state, flat, key, local_cfg, self.optimizer,
                self.features_fn, emb, lam, frozen=frozen,
                axis_name="dp",
            )

        rep, sh = P(), P(None, "dp")
        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(rep, rep, sh, rep,
                      rep if clip_embeddings is None else sh, rep, rep),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )(params, opt_state, data, key, clip_embeddings, lam, frozen)

    def _update_recurrent_sharded(self, params, opt_state, data,
                                  initial_lstm_state, key):
        """Recurrent PPO update as one shard_map over ``dp`` (r4): the
        rollout-layout batch and the iteration-initial LSTM carry arrive
        env-sharded; each device permutes and minibatches its LOCAL env
        slice (sequences stay time-contiguous per env, so the recurrent
        replay is untouched) and gradients/metrics pmean per minibatch.
        At dp=1 this is the replicated update bit-for-bit."""
        from jax.sharding import PartitionSpec as P

        dp = self.mesh.shape["dp"]
        local_cfg = dataclasses.replace(
            self.cfg, num_envs=self.cfg.num_envs // dp
        )

        def body(params, opt_state, data, h0c0, key):
            if dp > 1:  # decorrelate per-device env shuffles
                key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            return ppo_mod.update_epochs_recurrent(
                params, opt_state, data, h0c0, key, local_cfg,
                self.optimizer, self.features_fn, axis_name="dp",
            )

        rep = P()
        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(rep, rep, P(None, "dp"), P("dp"), rep),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )(params, opt_state, data, initial_lstm_state, key)

    def _embed_sharded(self, fn: Callable, x, frozen) -> jax.Array:
        """Run a flat-batch embedding fn per-shard over rollout-layout
        inputs (leading axes [T, N], env axis on ``dp``): each device
        flattens its local [T, N/dp] block t-major, embeds it (the Pallas
        ViT encode has no GSPMD partitioning rule), and returns
        [T, N/dp, D]. At dp=1 this is exactly the global flat encode.

        tp>1: no shard_map — the encode runs in the global graph with
        the tower weights tensor-sharded (parallel.tp), attention on the
        einsum path, and GSPMD inserting the tp all-reduces; the batch
        axis still rides dp."""
        from jax.sharding import PartitionSpec as P

        if getattr(self, "tp", 1) > 1:
            leaf = jax.tree_util.tree_leaves(x)[0]
            t, n = leaf.shape[:2]
            flat = jax.tree_util.tree_map(
                lambda v: v.reshape((t * n,) + v.shape[2:]), x
            )
            emb = fn(flat, frozen)
            return jax.lax.with_sharding_constraint(
                emb.reshape(t, n, -1),
                jax.sharding.NamedSharding(self.mesh, P(None, "dp")),
            )

        def embed2d(x_local, frozen):
            leaf = jax.tree_util.tree_leaves(x_local)[0]
            t, n = leaf.shape[:2]
            flat = jax.tree_util.tree_map(
                lambda v: v.reshape((t * n,) + v.shape[2:]), x_local
            )
            emb = fn(flat, frozen)
            return emb.reshape(t, n, -1)

        return jax.shard_map(
            embed2d, mesh=self.mesh, in_specs=(P(None, "dp"), P()),
            out_specs=P(None, "dp"), check_vma=False,
        )(x, frozen)

    def _apply_exploration(
        self, state: TrainState, batch: rollout_mod.RolloutBatch,
        iteration: Optional[jax.Array] = None,
    ) -> tuple[TrainState, rollout_mod.RolloutBatch, jax.Array]:
        """Count-bonus reward shaping (train/exploration.py): one hash
        matmul + one scatter-add for the whole rollout (plus, with the
        episodic term, a [T]-scan over the per-env first-visit bitset);
        the shaped reward feeds GAE while episode stats keep reporting
        the raw env return. Identity (bonus mean 0) when off. Shared by
        the fused iteration and the split text-modality rollout half."""
        if self.exploration_bonus <= 0.0 and self.episodic_bonus <= 0.0:
            return state, batch, jnp.float32(0.0)
        from clip_ppo_tpu.train import exploration

        # Mission conditioning stores (obs, mission) pairs; counts hash
        # the IMAGE part (visit novelty, as without conditioning).
        obs = batch.obs[0] if isinstance(batch.obs, tuple) else batch.obs
        idx = exploration.hash_obs(self._expl_proj, obs)
        r_int = jnp.zeros_like(batch.rewards)
        if self.exploration_bonus > 0.0:
            counts, r_g = exploration.count_bonus(
                state.counts, idx, self.exploration_bonus
            )
            r_int = r_int + r_g
            state = dataclasses.replace(state, counts=counts)
        if self.episodic_bonus > 0.0:
            mem, r_e = exploration.episodic_bonus(
                state.episodic_mem, idx, batch.dones, self.episodic_bonus
            )
            r_int = r_int + r_e
            state = dataclasses.replace(state, episodic_mem=mem)
        if self.bonus_decay > 0.0:
            assert iteration is not None, (
                "bonus_decay needs the iteration index (fused path only)"
            )
            progress = (iteration.astype(jnp.float32) - 1.0) / jnp.float32(
                max(self.num_iterations, 1)
            )
            r_int = r_int * jnp.clip(
                1.0 - progress / jnp.float32(self.bonus_decay), 0.0, 1.0
            )
        batch = batch._replace(rewards=batch.rewards + r_int)
        return state, batch, jnp.mean(r_int)

    def _iteration(self, state: TrainState, iteration: jax.Array, frozen):
        # The iteration's INITIAL cell state — the recurrent update replays
        # each minibatch's sequences from it (the rollout advances
        # state.lstm_state past the iteration).
        initial_lstm_state = state.lstm_state
        state, batch = self._rollout(state, frozen)
        state, batch, intrinsic_mean = self._apply_exploration(
            state, batch, iteration
        )
        data = self._data2d(state, batch, frozen)
        clip_embeddings = None
        if self.embed_images_fn is not None:
            if self.mesh is not None:
                clip_embeddings = self._embed_sharded(
                    self.embed_images_fn, batch.obs, frozen
                )
            else:
                b_obs = data["obs"].reshape((-1,) + data["obs"].shape[2:])
                clip_embeddings = self.embed_images_fn(b_obs, frozen)
        elif self.embed_desc_fn is not None:
            if self.mesh is not None:
                # embed_desc_fn already consumes [T, N] state snapshots and
                # flattens t-major internally, so per-shard it produces the
                # local [T·N/dp, D] block directly.
                from jax.sharding import PartitionSpec as P

                def desc2d(desc_local, frozen):
                    t = jax.tree_util.tree_leaves(desc_local)[0].shape[0]
                    emb = self.embed_desc_fn(desc_local, frozen)
                    return emb.reshape((t, -1, emb.shape[-1]))

                clip_embeddings = jax.shard_map(
                    desc2d, mesh=self.mesh, in_specs=(P(None, "dp"), P()),
                    out_specs=P(None, "dp"), check_vma=False,
                )(batch.desc, frozen)
            else:
                clip_embeddings = self.embed_desc_fn(batch.desc, frozen)
        elif self.embed_random_fn is not None:
            # RANDOM_ENCODER ablation in-graph: fresh normalized Gaussian
            # embeddings per iteration from the carried PRNG chain
            # (`clip_ppo_utils.py:126-129`; the stream differs from the
            # reference's torch RNG, as any reimplementation's must).
            key, k_emb = jax.random.split(state.key)
            state = dataclasses.replace(state, key=key)
            clip_embeddings = self.embed_random_fn(k_emb)
            if self.mesh is not None:
                clip_embeddings = clip_embeddings.reshape(
                    (self.cfg.num_steps, self.cfg.num_envs, -1)
                )
        state, scalars = self._update(
            state, data, iteration, clip_embeddings, frozen,
            initial_lstm_state=initial_lstm_state,
        )
        # always present (SCALAR_KEYS is a fixed packing order); 0 when off
        scalars["intrinsic_reward"] = intrinsic_mean
        episode_stats = self._episode_stats(batch, data["returns"])
        return state, scalars, episode_stats

    def _episode_stats(self, batch: rollout_mod.RolloutBatch,
                       returns: jax.Array) -> dict:
        stats = {
            "done_mask": batch.done_mask,
            "episode_return": batch.episode_return,
            "episode_length": batch.episode_length,
            # GAE returns in rollout layout; the host flattens t-major to
            # the reference's ``b_returns`` for checkpoint payloads
            # (`shared/checkpoint_utils.py:21-29`).
            "returns": returns,
        }
        if self.capture_env0:
            stats["env0_frames"] = batch.video
            stats["env0_dones"] = batch.done_mask[:, 0]
        return stats

    def run_iteration(self, state: TrainState, iteration: int):
        """Fused path: the whole iteration is one device program."""
        return self._jit_iteration(state, jnp.int32(iteration), self.frozen_params)

    # -- chunked path (K iterations per host dispatch) -------------------------

    def _chunk(self, state: TrainState, start_iteration: jax.Array, frozen, *, k: int):
        """``k`` full training iterations as one `lax.scan`d device program.

        Per-iteration logs are packed on device and stacked, so the host
        pays ONE dispatch + ONE fetch round trip per ``k`` iterations
        instead of per iteration — on tunneled TPUs the round trip
        (0.05–0.5 s) dominates the 1.8 ms iteration, making this the whole
        wall-clock story (reference metric: SPS, `ppo_minigrid.py:365-366`).
        """

        def body(state, offset):
            state, scalars, episode_stats = self._iteration(
                state, start_iteration + offset, frozen
            )
            sc, ep, video, dones0 = self._pack_logs(
                scalars, episode_stats, with_returns=False
            )
            return state, (sc, ep, video, dones0, episode_stats["returns"])

        state, (sc, ep, video, dones0, rets) = jax.lax.scan(
            body, state, jnp.arange(k, dtype=jnp.int32)
        )
        # Checkpoint payloads only ever need the LAST iteration's batch
        # returns (`shared/checkpoint_utils.py:21-29`); shipping them per
        # iteration would grow the packed fetch ~33%.
        return state, (sc, ep, video, dones0, rets[-1])

    def run_iterations(self, state: TrainState, start_iteration: int, k: int):
        """Run iterations ``start_iteration .. start_iteration+k-1`` in one
        dispatch. Returns (state, packed_logs) — unpack the logs with
        :meth:`fetch_logs_chunk`. Compiles once per distinct ``k``."""
        fn = self._jit_chunks.get(k)
        if fn is None:
            fn = jax.jit(functools.partial(self._chunk, k=k), donate_argnums=(0,))
            self._jit_chunks[k] = fn
        return fn(state, jnp.int32(start_iteration), self.frozen_params)

    @staticmethod
    def _device_get(tree):
        """``jax.device_get`` that also works on multi-process meshes:
        arrays spanning other processes' devices (DCN training) are
        all-gathered so every process sees the full logs — each process
        then decides what to write (CLIs log on process 0)."""
        leaves = [
            x for x in jax.tree_util.tree_leaves(tree)
            if isinstance(x, jax.Array)
        ]
        if any(not x.is_fully_addressable for x in leaves):
            from jax.experimental import multihost_utils

            # tiled=True: global arrays gather into their true global
            # shape (the only mode supported for non-fully-addressable
            # inputs); replicated leaves come back unchanged.
            tree = multihost_utils.process_allgather(tree, tiled=True)
        return jax.device_get(tree)

    def fetch_logs_chunk(self, packed) -> list:
        """One packed device→host fetch for a whole chunk; returns a list of
        per-iteration ``(scalars_np, stats_np)`` pairs matching
        :meth:`fetch_logs` output. ``b_returns`` is present only on the
        LAST entry (checkpoint saves happen at chunk boundaries)."""
        sc, ep, video, dones0, last_returns = self._device_get(packed)
        out = []
        for i in range(sc.shape[0]):
            scalars_np = {name: sc[i, j] for j, name in enumerate(SCALAR_KEYS)}
            stats_np = self._unpack_stats(ep[i], video, dones0, i)
            out.append((scalars_np, stats_np))
        # t-major flatten of the GAE returns = the reference's b_returns
        # [batch_size] (`ppo_minigrid.py:291-296`).
        out[-1][1]["b_returns"] = np.asarray(last_returns).reshape(-1)
        return out

    @staticmethod
    def _unpack_stats(ep, video, dones0, i: Optional[int] = None) -> dict:
        stats_np = {
            "done_mask": ep[0].astype(bool),
            "episode_return": ep[1],
            "episode_length": ep[2].astype(np.int32),
        }
        if ep.shape[0] > 3:  # single-iteration packing carries returns too
            stats_np["b_returns"] = ep[3].reshape(-1)
        if video is not None:
            v, d = (video, dones0) if i is None else (video[i], dones0[i])
            stats_np["env0_frames"] = np.asarray(v)
            stats_np["env0_dones"] = np.asarray(d).astype(bool)
        return stats_np

    # -- host log fetch --------------------------------------------------------

    def _pack_logs(self, scalars: dict, episode_stats: dict,
                   with_returns: bool = True):
        """Pack the per-iteration log pytrees into at most three arrays.

        Each device→host fetch pays a full round trip (severe on tunneled
        TPUs: ~0.1-0.5 s per LEAF observed), so the ~13 small log leaves
        are packed on device and fetched as 2-3 buffers. The chunked path
        packs with ``with_returns=False`` and ships only the final
        iteration's GAE returns (see :meth:`_chunk`).
        """
        assert set(scalars) == set(SCALAR_KEYS), sorted(scalars)
        sc = jnp.stack([scalars[k].astype(jnp.float32) for k in SCALAR_KEYS])
        rows = [
            episode_stats["done_mask"].astype(jnp.float32),
            episode_stats["episode_return"].astype(jnp.float32),
            episode_stats["episode_length"].astype(jnp.float32),
        ]
        if with_returns:
            rows.append(episode_stats["returns"].astype(jnp.float32))
        ep = jnp.stack(rows)
        video = episode_stats.get("env0_frames")
        dones0 = episode_stats.get("env0_dones")
        return sc, ep, video, dones0

    def fetch_logs(self, scalars: dict, episode_stats: dict):
        """One packed device→host fetch; returns numpy-backed dicts with
        the same keys as the inputs."""
        sc, ep, video, dones0 = self._device_get(
            self._jit_pack_logs(scalars, episode_stats)
        )
        scalars_np = {k: sc[i] for i, k in enumerate(SCALAR_KEYS)}
        return scalars_np, self._unpack_stats(ep, video, dones0)

    # -- split path (text modality: host descriptions between halves) ---------

    def _rollout_half(self, state: TrainState, frozen):
        state, batch = self._rollout(state, frozen, collect_desc=True)
        state, batch, intrinsic_mean = self._apply_exploration(state, batch)
        data = self._data2d(state, batch, frozen)
        # Ride the opaque update payload so the update half can report it
        # under the fixed SCALAR_KEYS packing order.
        data["intrinsic_reward"] = intrinsic_mean
        return state, data, self._episode_stats(batch, data["returns"]), batch.desc

    def _update_half(self, state: TrainState, data: dict, iteration: jax.Array,
                     clip_embeddings: Optional[jax.Array], frozen):
        data = dict(data)
        intrinsic_mean = data.pop("intrinsic_reward", jnp.float32(0.0))
        state, scalars = self._update(
            state, data, iteration, clip_embeddings, frozen
        )
        scalars["intrinsic_reward"] = intrinsic_mean
        return state, scalars

    def run_rollout_half(self, state: TrainState):
        """Returns (state, data, episode_stats, desc) — ``data`` is the
        opaque update payload for :meth:`run_update_half` (rollout-layout
        [T, N, ...] arrays)."""
        return self._jit_rollout_half(state, self.frozen_params)

    def run_update_half(self, state, data, iteration: int, clip_embeddings):
        return self._jit_update_half(
            state, data, jnp.int32(iteration), clip_embeddings, self.frozen_params
        )


def chunk_length(
    k: int,
    iteration: int,
    num_iterations: int,
    global_step: int,
    batch_size: int,
    save_freq: int,
    save_model: bool,
) -> int:
    """Cap a dispatch chunk so it never crosses a checkpoint boundary.

    The reference saves when ``global_step % save_freq == 0``
    (`clip_ppo_minigrid.py:589`) — which, since global_step advances by
    batch_size per iteration, only ever fires when save_freq is a multiple
    of batch_size (the divisibility quirk, SURVEY §3.1). Aligning chunk
    ends to those boundaries keeps chunked dispatch checkpoint-exact.
    """
    k = min(k, num_iterations - iteration + 1)
    if save_model and save_freq % batch_size == 0:
        per = save_freq // batch_size
        done = global_step // batch_size
        k = min(k, per - (done % per))
    return max(k, 1)


class LogPipeline:
    """Overlap the packed-log fetch of chunk *k* with chunk *k+1*'s device
    compute.

    CLIs dispatch the next chunk BEFORE draining the previous chunk's
    logs; JAX's async dispatch keeps the device busy while the host waits
    on the (multi-hundred-KB) packed transfer, so the fetch rides under
    compute instead of serializing after it — on the tunneled TPU the
    serial fetch cost ~10% of end-to-end wall-clock (the BENCH r1→r2
    delta; docs/PERFORMANCE.md "Log-fetch overlap").

    ``handle(iteration, scalars_np, stats_np)`` runs on the host once per
    iteration, in order, one chunk behind the device. Call :meth:`flush`
    before reading anything the handler produces (e.g. accumulated
    ``b_returns`` at a checkpoint save) and once after the loop.
    """

    def __init__(self, trainer: Trainer, handle: Callable[[int, dict, dict], None]):
        self.trainer = trainer
        self.handle = handle
        self._pending: Optional[tuple[int, Any]] = None

    def after_dispatch(self, iteration: int, packed) -> None:
        """Register chunk ``iteration``'s packed logs and drain the
        previous chunk's (its compute has necessarily finished by the time
        its fetch completes — the new chunk is already queued behind it)."""
        prev, self._pending = self._pending, (iteration, packed)
        if prev is not None:
            self._drain(prev)

    def flush(self) -> None:
        if self._pending is not None:
            prev, self._pending = self._pending, None
            self._drain(prev)

    def _drain(self, item: tuple[int, Any]) -> None:
        iteration, packed = item
        for off, (scalars, stats) in enumerate(
            self.trainer.fetch_logs_chunk(packed)
        ):
            self.handle(iteration + off, scalars, stats)
