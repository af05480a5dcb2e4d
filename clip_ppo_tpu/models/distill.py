"""Structured frozen-tower initialization via on-device pixel-PCA distillation.

The reference's FROZEN_CLIP ablation swaps the agent trunk for a
*pretrained* ``clip.visual`` (`clip_ppo_minigrid.py:219-227`). In this
zero-egress image no pretrained weights exist, and a randomly initialized
ViT makes frozen features that barely separate states — the ablation's
actor/critic heads can't learn (round-1 at-scale run: return 0.04).

This module makes the ablation *demonstrably trainable* without external
weights: it distills the CLIP visual tower, on device, to reproduce a
pixel-PCA teacher computed from random-policy observations. PCA features
are linear in the image, so they retain exactly the state information
that varies across observations (agent position/direction, door/key
layout); after a few hundred Adam steps the frozen ViT carries that
information to the linear heads. The tower stays frozen during PPO —
only the *initialization* is structured, mirroring how the real
experiment would use pretrained weights.

TPU notes: the teacher is one [N, D]·[D, 512] matmul; distillation is a
scanned MSE loop over minibatched 224-res encodes — all MXU work inside
one jitted program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from clip_ppo_tpu.models.clip import model as clip_model_mod
from clip_ppo_tpu.models.clip.config import CLIPConfig
from clip_ppo_tpu.ops.resize import preprocess_for_clip


def pixel_pca_teacher(
    obs_uint8: jax.Array, out_dim: int, downsample: int = 2
) -> tuple[Callable[[jax.Array], jax.Array], dict]:
    """Build a pixel-PCA feature teacher from sample observations.

    Args:
        obs_uint8: [N, H, W, C] uint8 sample observations.
        out_dim: number of principal components (the frozen feature width).
        downsample: spatial stride before flattening (keeps the SVD cheap
            without losing the low-frequency structure PCA captures).

    Returns ``(teacher_fn, stats)``: ``teacher_fn(obs_uint8) -> [B,
    out_dim]`` whitened PCA features, and the PCA statistics pytree.
    """
    x = obs_uint8[:, ::downsample, ::downsample].astype(jnp.float32) / 255.0
    n = x.shape[0]
    flat = x.reshape(n, -1)
    mean = flat.mean(axis=0)
    centered = flat - mean
    # economy SVD of [N, D]: rows of Vt are the principal directions
    _, s, vt = jnp.linalg.svd(centered, full_matrices=False)
    k = min(out_dim, vt.shape[0])
    components = vt[:k]                      # [k, D]
    scale = s[:k] / jnp.sqrt(jnp.float32(n)) # per-component std
    # pad to out_dim if fewer samples than components
    if k < out_dim:
        components = jnp.pad(components, ((0, out_dim - k), (0, 0)))
        scale = jnp.pad(scale, (0, out_dim - k), constant_values=1.0)
    stats = {"mean": mean, "components": components, "scale": scale}

    def teacher(obs: jax.Array) -> jax.Array:
        y = obs[:, ::downsample, ::downsample].astype(jnp.float32) / 255.0
        y = y.reshape(y.shape[0], -1) - stats["mean"]
        z = y @ stats["components"].T
        return z / (stats["scale"] + 1e-6)  # whitened

    return teacher, stats


def distill_visual_tower(
    key: jax.Array,
    clip_params: dict,
    cfg: CLIPConfig,
    obs_uint8: jax.Array,
    steps: int = 300,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Distill ``clip_params['visual']`` toward the pixel-PCA teacher.

    Returns a new params pytree (text tower untouched). The student sees
    observations through the SAME preprocessing the frozen-feature path
    uses (`clip_utils.get_frozen_clip_features`: /255 → 224 resize → CLIP
    norm), so PPO-time features match what was distilled.
    """
    teacher_fn, _ = pixel_pca_teacher(obs_uint8, cfg.embed_dim)
    targets = teacher_fn(obs_uint8)  # [N, embed_dim]
    n = obs_uint8.shape[0]
    batch_size = min(batch_size, n)

    optimizer = optax.adam(learning_rate)

    def student(params, obs):
        x = preprocess_for_clip(
            obs.astype(jnp.float32) / 255.0, cfg.image_size
        )
        # xla attention: distillation differentiates THROUGH the tower,
        # so take the natively differentiable path (the fused kernel's
        # custom VJP would recompute through it anyway).
        return clip_model_mod.encode_image(
            params, cfg, x, compute_dtype, attention_impl="xla"
        )

    def loss_fn(visual, obs, tgt):
        feats = student({**clip_params, "visual": visual}, obs)
        return jnp.mean((feats - tgt) ** 2)

    # observations/targets threaded as jit ARGUMENTS — closed-over arrays
    # would bake into the executable as constants (CLAUDE.md: tunneled
    # TPUs reject bloated compile requests).
    @jax.jit
    def run(visual, key, obs_all, tgt_all):
        opt_state = optimizer.init(visual)

        def step(carry, k):
            visual, opt_state = carry
            idx = jax.random.randint(k, (batch_size,), 0, n)
            loss, grads = jax.value_and_grad(loss_fn)(
                visual, obs_all[idx], tgt_all[idx]
            )
            updates, opt_state = optimizer.update(grads, opt_state)
            visual = optax.apply_updates(visual, updates)
            return (visual, opt_state), loss

        (visual, _), losses = jax.lax.scan(
            step, (visual, opt_state), jax.random.split(key, steps)
        )
        return visual, losses

    visual, losses = run(clip_params["visual"], key, obs_uint8, targets)
    print(
        f"Distilled frozen tower: MSE {float(losses[0]):.4f} → "
        f"{float(losses[-1]):.4f} over {steps} steps"
    )
    return {**clip_params, "visual": visual}


def collect_random_observations(env, key: jax.Array, num_steps: int = 64) -> jax.Array:
    """Roll a uniform-random policy in a JaxVectorEnv and return the
    stacked [num_steps·N, H, W, C] uint8 observations (one jitted scan)."""

    @jax.jit
    def rollout(key):
        k_reset, k_scan = jax.random.split(key)
        vec_state, obs = env.reset_fn(k_reset)

        def step(carry, k):
            vec_state, obs = carry
            actions = jax.random.randint(
                k, (env.num_envs,), 0, env.num_actions
            )
            vec_state, new_obs, *_ = env._step_impl(vec_state, actions)
            return (vec_state, new_obs), obs

        _, all_obs = jax.lax.scan(
            step, (vec_state, obs), jax.random.split(k_scan, num_steps)
        )
        return all_obs.reshape((-1,) + all_obs.shape[2:])

    return rollout(key)
