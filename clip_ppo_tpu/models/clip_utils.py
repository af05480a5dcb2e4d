"""CLIP-PPO shared utilities: λ warmup, alignment loss, embedding generation.

TPU-native equivalent of the reference's shared CLIP surface
(`shared/clip_ppo_utils.py:13-240`), reshaped for JAX: every function here
is either host-side configuration (pure Python, jit-static) or a pure
traced function safe inside the jitted train step. Embedding generation is
batched device compute (the per-iteration 1024-frame CLIP encode is the
dominant CLIP cost, SURVEY §3); text tokenization stays on the host and
feeds fixed-shape [B, 77] int32 arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from clip_ppo_tpu.models.agent import AblationMode
from clip_ppo_tpu.models.clip import model as clip_model_mod
from clip_ppo_tpu.models.clip.config import CLIPConfig
from clip_ppo_tpu.models.clip.loader import load_clip_model  # re-export
from clip_ppo_tpu.models.clip.tokenizer import tokenize
from clip_ppo_tpu.models import nature_cnn as cnn
from clip_ppo_tpu.ops.resize import preprocess_for_clip

CLIP_LOSS_FREQUENCY = 4  # every 4th minibatch (`clip_ppo_utils.py:24`)


def get_clip_lambda_with_warmup(
    target_lambda: float,
    current_iteration,
    total_iterations: int,
    warmup_fraction: float = 0.2,
):
    """Linear λ warmup over the first ``warmup_fraction`` of training
    (`clip_ppo_utils.py:26-46`); ``current_iteration`` is 0-indexed and may
    be a traced array (the train step applies this on device)."""
    warmup_iterations = int(total_iterations * warmup_fraction)
    if warmup_iterations <= 0:
        return jnp.float32(target_lambda)
    cur = jnp.asarray(current_iteration, jnp.float32)
    return jnp.where(
        cur < warmup_iterations,
        target_lambda * (cur / warmup_iterations),
        jnp.float32(target_lambda),
    )


def compute_cosine_embedding_loss(z: jax.Array, c: jax.Array) -> jax.Array:
    """L_CLIP = mean(1 - cos(z/||z||, c/||c||)) (`clip_ppo_utils.py:48-76`).

    Raises at trace time on a latent/embedding width mismatch, like the
    reference's runtime ValueError.
    """
    if z.shape[-1] != c.shape[-1]:
        raise ValueError(
            f"Dimension mismatch: PPO latents ({z.shape[-1]}) vs CLIP "
            f"embeddings ({c.shape[-1]}). Both should be 512-dim for "
            "ViT-B/32. Check agent architecture."
        )
    zn = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
    cn = c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + 1e-12)
    return jnp.mean(1.0 - jnp.sum(zn * cn, axis=-1))


def should_compute_clip_loss(
    ablation_mode: AblationMode, clip_lambda: float
) -> bool:
    """λ > 0 and not FROZEN_CLIP (`clip_ppo_utils.py:170-182`). Host-side:
    decides whether the jitted update is traced with the CLIP term at all."""
    return clip_lambda > 0.0 and ablation_mode != AblationMode.FROZEN_CLIP


def l2_normalize(x: jax.Array) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def encode_texts(
    clip_params: dict,
    cfg: CLIPConfig,
    descriptions: Sequence[str],
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Host tokenization + device text encode + L2 norm
    (`clip_ppo_utils.py:132-139`). Returns [B, embed_dim] float32."""
    tokens = jnp.asarray(tokenize(list(descriptions)))
    feats = clip_model_mod.encode_text(clip_params, cfg, tokens, compute_dtype)
    return l2_normalize(feats)


def encode_images(
    clip_params: dict,
    cfg: CLIPConfig,
    images_uint8: jax.Array,
    compute_dtype=jnp.float32,
    attention_impl: str = "auto",
) -> jax.Array:
    """uint8 [B, H, W, 3] → normalized [B, embed_dim] CLIP features.

    Fuses /255 → antialiased-bilinear 224 resize → CLIP normalization →
    ViT forward → L2 norm into one traced graph
    (`clip_ppo_utils.py:141-164`). Pure: safe inside the jitted iteration.
    ``attention_impl="xla"`` keeps the encode GSPMD-partitionable for
    tensor-parallel weights (the Pallas kernels have no partition rule).
    """
    x = preprocess_for_clip(images_uint8.astype(jnp.float32) / 255.0,
                            cfg.image_size)
    feats = clip_model_mod.encode_image(clip_params, cfg, x, compute_dtype,
                                        attention_impl=attention_impl)
    return l2_normalize(feats)


def generate_clip_embeddings(
    ablation_mode: AblationMode,
    clip_params: Optional[dict],
    cfg: Optional[CLIPConfig],
    modality: str,
    batch_size: int,
    key: Optional[jax.Array] = None,
    descriptions: Optional[Sequence[str]] = None,
    images: Optional[jax.Array] = None,
    embed_dim: int = 512,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Dispatch on ablation mode / modality (`clip_ppo_utils.py:100-167`):
    RANDOM_ENCODER → normalized Gaussian embeddings; text → tokenize+encode;
    image → preprocess+encode. Always L2-normalized float32."""
    if ablation_mode == AblationMode.RANDOM_ENCODER:
        assert key is not None, "RANDOM_ENCODER needs a PRNG key"
        emb = jax.random.normal(key, (batch_size, embed_dim), jnp.float32)
        return l2_normalize(emb)
    if modality == "text":
        if descriptions is None:
            raise ValueError("descriptions required for text modality")
        return encode_texts(clip_params, cfg, descriptions, compute_dtype)
    if modality == "image":
        if images is None:
            raise ValueError("images required for image modality")
        return encode_images(clip_params, cfg, images, compute_dtype)
    raise ValueError(f"Invalid modality: {modality}. Must be 'image' or 'text'")


def get_frozen_clip_features(
    clip_params: dict,
    cfg: CLIPConfig,
    x: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Frozen-CLIP visual features with standard preprocessing
    (`clip_ppo_utils.py:185-217`): [B, H, W, 3] float in [0,1] → resize
    224 + CLIP norm → ViT → float32 features. bfloat16 compute plays the
    role of the reference's ``.half()`` cast on TPU; stop_gradient keeps
    the tower frozen regardless of the loss around it."""
    x = preprocess_for_clip(x, cfg.image_size)
    feats = clip_model_mod.encode_image(clip_params, cfg, x, compute_dtype)
    return jax.lax.stop_gradient(feats)


def make_frozen_clip_features_fn(cfg: CLIPConfig, compute_dtype=jnp.bfloat16):
    """FeatureFn for the FROZEN_CLIP ablation on RGB observations: the
    agent's trunk becomes ``clip.visual`` (`clip_ppo_minigrid.py:219-227`).

    The frozen tower's weights arrive through the third (``frozen``)
    argument — ``{"clip": clip_params}`` threaded via ``TrainState.frozen``
    — NOT a closure: closed-over weight arrays become compile-time
    constants and bloat the executable."""

    def features(params: dict, obs: jax.Array, frozen: dict) -> jax.Array:
        del params  # trunk is the frozen CLIP tower
        x = obs.astype(jnp.float32) / 255.0
        return get_frozen_clip_features(frozen["clip"], cfg, x, compute_dtype)

    return features


def stack_to_rgb_frames(obs: jax.Array) -> jax.Array:
    """[B, H, W, 4] grayscale frame-stack → [B·4, H, W, 3] RGB frames
    (`convert_atari_frames_for_clip`, `clip_ppo_atari.py:249-269`):
    each frame's gray channel is replicated to RGB; frames are interleaved
    per batch element (b0f0..b0f3, b1f0..)."""
    b, h, w, s = obs.shape
    frames = jnp.moveaxis(obs, -1, 1).reshape(b * s, h, w, 1)
    return jnp.broadcast_to(frames, (b * s, h, w, 3))


def multiframe_clip_embeddings(
    clip_params: dict,
    cfg: CLIPConfig,
    obs: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """[B, H, W, 4] uint8 stack → [B, 4·embed_dim] concat CLIP features in
    ONE batched ViT pass (`process_multiframe_clip_embeddings`,
    `clip_ppo_atari.py:272-299`)."""
    b = obs.shape[0]
    frames = stack_to_rgb_frames(obs).astype(jnp.float32) / 255.0
    feats = get_frozen_clip_features(clip_params, cfg, frames, compute_dtype)
    return feats.reshape(b, -1)


def make_frozen_clip_stack_features_fn(cfg: CLIPConfig,
                                       compute_dtype=jnp.bfloat16):
    """Atari FROZEN_CLIP FeatureFn: per-frame frozen CLIP features,
    concatenated and passed through the trainable ``temporal_projection``
    (`clip_ppo_atari.py:211-228`). Gradients reach only the projection.
    CLIP weights arrive via ``frozen["clip"]`` (see
    :func:`make_frozen_clip_features_fn`)."""

    def features(params: dict, obs: jax.Array, frozen: dict) -> jax.Array:
        concat = multiframe_clip_embeddings(
            frozen["clip"], cfg, obs, compute_dtype
        )
        return cnn.dense(params["temporal_projection"], concat)

    return features


def make_encode_images_fn(cfg: CLIPConfig, compute_dtype=jnp.float32,
                          attention_impl: str = "auto"):
    """Per-iteration image-embedding fn for the fused MiniGrid image
    modality: ``(obs_uint8, frozen) -> [B, embed_dim]`` L2-normalized."""

    def embed(obs: jax.Array, frozen: dict) -> jax.Array:
        return encode_images(frozen["clip"], cfg, obs, compute_dtype,
                             attention_impl=attention_impl)

    return embed


def make_multiframe_embed_fn(cfg: CLIPConfig, compute_dtype=jnp.bfloat16):
    """Per-iteration multi-frame embedding fn for the fused Atari image
    modality: ``(obs_stack_uint8, frozen) -> [B, 4·embed_dim]`` with
    per-frame L2 norm (`clip_ppo_atari.py:272-299`)."""

    def embed(obs: jax.Array, frozen: dict) -> jax.Array:
        b = obs.shape[0]
        emb = multiframe_clip_embeddings(frozen["clip"], cfg, obs, compute_dtype)
        per_frame = l2_normalize(emb.reshape(b, obs.shape[-1], -1))
        return per_frame.reshape(b, -1)

    return embed


def build_minigrid_text_table(
    clip_params: dict,
    cfg: CLIPConfig,
    width: int,
    height: int,
    suffix: str,
    compute_dtype=jnp.float32,
    encode_batch: int = 1024,
) -> jax.Array:
    """Precompute text embeddings for every possible MiniGrid description.

    MiniGrid descriptions are ``"agent at (x,y) facing D" + suffix`` where
    the suffix (first 3 non-empty cells in x-major scan order) is the
    static border walls — constant for the whole run
    (`clip_ppo_minigrid.py:164-211`; `envs/minigrid/core.describe_rollout`).
    The description space is therefore exactly W·H·4 strings; encoding
    them once lets the text modality run fully in-graph as a table gather
    (index (x·H + y)·4 + dir), removing the per-iteration host
    tokenization round trip. Embeddings are bit-identical to encoding the
    per-step strings (same tokenizer, same tower, deterministic).

    Returns [W·H·4, embed_dim] L2-normalized float32.
    """
    from clip_ppo_tpu.envs.minigrid.core import DIR_NAMES

    descriptions = [
        f"agent at ({x},{y}) facing {DIR_NAMES[d]}" + suffix
        for x in range(width)
        for y in range(height)
        for d in range(4)
    ]
    encode = jax.jit(
        lambda cp, toks: l2_normalize(
            clip_model_mod.encode_text(cp, cfg, toks, compute_dtype)
        )
    )
    chunks = []
    for i in range(0, len(descriptions), encode_batch):
        toks = jnp.asarray(tokenize(descriptions[i:i + encode_batch]))
        chunks.append(encode(clip_params, toks))
    return jnp.concatenate(chunks, axis=0)


def make_text_table_embed_fn(height: int):
    """In-graph text-modality embedding fn over a precomputed table:
    ``(desc, frozen) -> [T·N, embed_dim]`` where ``desc`` is the rollout's
    per-step state snapshot ({"agent_pos": [T,N,2], "agent_dir": [T,N]})
    and the table is threaded via ``frozen["text_table"]`` (never a
    closure — see make_frozen_clip_features_fn)."""

    def embed(desc: dict, frozen: dict) -> jax.Array:
        pos = desc["agent_pos"].reshape(-1, 2)  # t-major, matches b_* layout
        dirs = desc["agent_dir"].reshape(-1)
        idx = (pos[:, 0].astype(jnp.int32) * height + pos[:, 1]) * 4 + dirs
        return frozen["text_table"][idx]

    return embed


def make_random_embed_fn(batch_size: int, embed_dim: int = 512,
                         frames: int = 1):
    """In-graph RANDOM_ENCODER embeddings (`clip_ppo_utils.py:126-129`):
    ``(key) -> [batch_size, frames·embed_dim]`` normalized Gaussians —
    per-frame normalized then concatenated for the Atari multi-frame
    layout (`process_multiframe_clip_embeddings` with RANDOM mode)."""

    def embed(key: jax.Array) -> jax.Array:
        emb = jax.random.normal(
            key, (batch_size * frames, embed_dim), jnp.float32
        )
        emb = l2_normalize(emb)
        return emb.reshape(batch_size, frames * embed_dim)

    return embed


def verbose_debug_print(
    iteration: int,
    clip_lambda: float,
    ent_coef: float,
    vf_coef: float,
    scalars: dict,
) -> None:
    """The reference's per-iteration verbose loss debug block, printed for
    the first minibatch of the first epoch (`clip_ppo_minigrid.py:546-552`)
    using the un-warmed λ exactly as the reference does."""
    pg = float(scalars["first_pg_loss"])
    v = float(scalars["first_v_loss"])
    ent = float(scalars["first_entropy"])
    cl = float(scalars["first_clip_loss"])
    print(f"Iter {iteration}")
    print(f"Weighted CLIP loss: {clip_lambda * cl:>15.10f}")
    print(f"PPO loss:           {pg:>15.10f}")
    print(f"Combined loss: {pg - ent_coef * ent + v * vf_coef + clip_lambda * cl:.6f}")
    print("---")


@dataclasses.dataclass
class ClipPPOConfig:
    """Shared CLIP-PPO flags (`clip_ppo_utils.py:220-240`)."""

    clip_lambda: float = 0.00001
    """coefficient for CLIP alignment loss"""
    clip_model: str = "ViT-B/32"
    """CLIP model variant to use"""
    clip_modality: str = "text"
    """CLIP modality to use for alignment: 'image' or 'text'"""
    ablation_mode: AblationMode = AblationMode.NONE
    """ablation mode for controlled experiments"""
    apply_disturbances: bool = False
    """whether to apply visual disturbances during training"""
    disturbance_severity: str = "MODERATE"
    """disturbance severity level: MILD, MODERATE, HARD, SEVERE"""
