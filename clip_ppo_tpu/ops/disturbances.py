"""On-device visual-disturbance pipeline (noise → contrast → blur → cutout).

TPU-native redesign of the reference's two disturbance paths:

* **batched semantics** — the path the CLIP-PPO scripts train with
  (`shared/disturbances_gpu.py:66-73`): operates on a whole batch at once,
  Gaussian noise clamped to [0,1], contrast jitter with blend-toward-gray
  (torchvision ColorJitter) semantics, fixed-sigma Gaussian blur with
  reflect padding, and a single cutout patch shared by the batch.
* **per-image semantics** — the path `ppo_minigrid.py:260-263` uses
  (`shared/disturbances.py:45-67`): per-image RNG, plain multiplicative
  contrast, per-image cutout position, with uint8 quantization between
  stages.

Unlike the reference (host NumPy/OpenCV or torch CUDA calls), everything
here is pure JAX on ``[B, H, W, C]`` float arrays in [0,1] — jittable,
vmappable, and fused by XLA straight into the rollout/update graph, so the
disturbance stage costs no extra HBM round-trips. There are no layout
permutes: TPU code stays NHWC end-to-end (the reference permutes to NCHW
only because torch convs require it).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.ops.severity import DisturbanceParams

# Luma weights used by torchvision's rgb_to_grayscale, which ColorJitter's
# contrast adjustment blends toward (`disturbances_gpu.py:63` behavior).
_LUMA = np.array([0.2989, 0.587, 0.114], dtype=np.float32)


def gaussian_kernel_1d(sigma: float, ksize: int) -> np.ndarray:
    """Normalized 1-D Gaussian taps; matches torchvision/cv2 construction."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


# ---------------------------------------------------------------------------
# Individual stages — batched [B, H, W, C] float [0, 1]
# ---------------------------------------------------------------------------


def apply_gaussian_noise(x: jax.Array, key: jax.Array, sigma: float) -> jax.Array:
    """Additive Gaussian noise, clamped to [0,1] (torchvision GaussianNoise)."""
    noise = sigma * jax.random.normal(key, x.shape, dtype=x.dtype)
    return jnp.clip(x + noise, 0.0, 1.0)


def apply_contrast_blend(
    x: jax.Array, key: jax.Array, contrast_range: tuple[float, float]
) -> jax.Array:
    """Contrast jitter with blend-toward-gray-mean (ColorJitter) semantics.

    torchvision's ColorJitter draws ONE factor per call, shared by the
    whole batch (the transform is applied to the [B,C,H,W] tensor at
    `disturbances_gpu.py:110`); the blend target is the per-image mean of
    the grayscale (luma for RGB, channel mean otherwise). Replicated
    exactly — these are the semantics the CLIP scripts trained with.
    """
    b = x.shape[0]
    lo, hi = contrast_range
    factor = jax.random.uniform(key, (), dtype=x.dtype, minval=lo, maxval=hi)
    if x.shape[-1] == 3:
        gray = jnp.einsum("bhwc,c->bhw", x, jnp.asarray(_LUMA, dtype=x.dtype))
        mean = jnp.mean(gray, axis=(1, 2)).reshape(b, 1, 1, 1)
    else:
        mean = jnp.mean(x, axis=(1, 2, 3)).reshape(b, 1, 1, 1)
    return jnp.clip(factor * x + (1.0 - factor) * mean, 0.0, 1.0)


def apply_contrast_scale(
    x: jax.Array, key: jax.Array, contrast_range: tuple[float, float]
) -> jax.Array:
    """Plain multiplicative contrast (per-image factor) — per-image-path math
    (`shared/disturbances.py:94-96`), on [0,1] floats."""
    b = x.shape[0]
    lo, hi = contrast_range
    factor = jax.random.uniform(key, (b, 1, 1, 1), dtype=x.dtype, minval=lo, maxval=hi)
    return jnp.clip(factor * x, 0.0, 1.0)


def apply_gaussian_blur(x: jax.Array, sigma: float, ksize: int) -> jax.Array:
    """Separable Gaussian blur with reflect padding (BORDER_REFLECT_101).

    Two 1-D depthwise convolutions; XLA maps these onto the VPU/MXU without
    materializing the padded image in HBM twice.
    """
    taps = jnp.asarray(gaussian_kernel_1d(sigma, ksize), dtype=x.dtype)
    pad = ksize // 2
    b, h, w, c = x.shape

    # Blur along H: treat (B, H, W*C) and convolve the H axis.
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    xh = jax.lax.conv_general_dilated(
        xp.reshape(b, h + 2 * pad, w * c, 1),
        taps.reshape(ksize, 1, 1, 1),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, h, w, c)

    # Blur along W.
    xp = jnp.pad(xh, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    xw = jax.lax.conv_general_dilated(
        xp.transpose(0, 2, 1, 3).reshape(b, w + 2 * pad, h * c, 1),
        taps.reshape(ksize, 1, 1, 1),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, w, h, c).transpose(0, 2, 1, 3)
    return xw


def _cutout_patch_hw(h: int, w: int, ratio: float) -> tuple[int, int]:
    """Patch height/width from an area ratio (`shared/disturbances.py:130-133`)."""
    patch_area = int(h * w * ratio)
    if patch_area == 0:
        return 0, 0  # degenerate ratio → no cutout
    patch_h = int(np.sqrt(patch_area))
    patch_w = patch_area // patch_h
    return patch_h, patch_w


def apply_cutout_shared(x: jax.Array, key: jax.Array, ratio: float) -> jax.Array:
    """Zero out one rectangle at a single random position shared by the batch
    (the batched-path behavior, `shared/disturbances_gpu.py:157-172`)."""
    _, h, w, _ = x.shape
    ph, pw = _cutout_patch_hw(h, w, ratio)
    kh, kw = jax.random.split(key)
    sh = jax.random.randint(kh, (), 0, max(1, h - ph + 1))
    sw = jax.random.randint(kw, (), 0, max(1, w - pw + 1))
    rows = jnp.arange(h).reshape(1, h, 1, 1)
    cols = jnp.arange(w).reshape(1, 1, w, 1)
    inside = (rows >= sh) & (rows < sh + ph) & (cols >= sw) & (cols < sw + pw)
    return jnp.where(inside, jnp.zeros_like(x), x)


def apply_cutout_per_image(x: jax.Array, key: jax.Array, ratio: float) -> jax.Array:
    """Per-image random cutout position (`shared/disturbances.py:135-145`)."""
    b, h, w, _ = x.shape
    ph, pw = _cutout_patch_hw(h, w, ratio)
    kh, kw = jax.random.split(key)
    # Reference uses randint(0, max(1, h - ph)) — exclusive upper bound.
    sh = jax.random.randint(kh, (b, 1, 1, 1), 0, max(1, h - ph))
    sw = jax.random.randint(kw, (b, 1, 1, 1), 0, max(1, w - pw))
    rows = jnp.arange(h).reshape(1, h, 1, 1)
    cols = jnp.arange(w).reshape(1, 1, w, 1)
    inside = (rows >= sh) & (rows < sh + ph) & (cols >= sw) & (cols < sw + pw)
    return jnp.where(inside, jnp.zeros_like(x), x)


# ---------------------------------------------------------------------------
# Full pipelines
# ---------------------------------------------------------------------------


def disturb_auto(
    x: jax.Array,
    key: jax.Array,
    params: DisturbanceParams,
    semantics: Literal["batched", "per_image", "stack_frames"] = "batched",
) -> jax.Array:
    """``disturb`` with the fused Pallas kernel on TPU for the batched
    (trained-path) semantics — one VMEM pass, ~2.2× the XLA pipeline on
    v5e — falling back to the XLA pipeline elsewhere. The Pallas noise
    uses the on-core PRNG (same distribution, different stream than
    jax.random)."""
    if semantics == "batched" and jax.default_backend() == "tpu":
        from clip_ppo_tpu.ops.pallas_disturb import disturb_pallas

        return disturb_pallas(x, key, params, interpret=False)
    return disturb(x, key, params, semantics)


@functools.partial(jax.jit, static_argnames=("params", "semantics"))
def disturb(
    x: jax.Array,
    key: jax.Array,
    params: DisturbanceParams,
    semantics: Literal["batched", "per_image", "stack_frames"] = "batched",
) -> jax.Array:
    """Apply the full noise → contrast → blur → cutout pipeline.

    Args:
        x: ``[B, H, W, C]`` float array in [0, 1].
        key: JAX PRNG key (split internally per stage).
        params: static disturbance parameters (severity preset).
        semantics: ``"batched"`` for the batch-level semantics the CLIP
            scripts train with; ``"per_image"`` for the per-image path
            (multiplicative contrast, per-image cutout, uint8 quantization
            between stages) used by the vanilla MiniGrid script;
            ``"stack_frames"`` for grayscale frame stacks, applying the
            batched pipeline independently per frame like the reference's
            per-frame loop (`clip_ppo_atari.py:568-584`).

    Returns:
        Disturbed ``[B, H, W, C]`` float array in [0, 1].
    """
    if semantics == "stack_frames":
        # Frame-stacked observations ([B, H, W, S] grayscale stacks): the
        # reference loops the torchvision pipeline over the S frames
        # because its transforms need 1-or-3-channel input
        # (`clip_ppo_atari.py:568-584`) — each frame gets its own noise,
        # contrast factor and cutout position, shared across the batch
        # within a frame. vmap over frames reproduces that exactly.
        s = x.shape[-1]
        frames = jnp.moveaxis(x, -1, 0)[..., None]  # [S, B, H, W, 1]
        keys = jax.random.split(key, s)
        out = jax.vmap(lambda f, k: disturb(f, k, params, "batched"))(frames, keys)
        return jnp.moveaxis(out[..., 0], 0, -1)

    k_noise, k_contrast, k_cutout = jax.random.split(key, 3)
    if semantics == "batched":
        x = apply_gaussian_noise(x, k_noise, params.gaussian_noise_sigma)
        x = apply_contrast_blend(x, k_contrast, params.contrast_range)
        x = apply_gaussian_blur(x, params.gaussian_blur_sigma, params.blur_kernel_size)
        x = apply_cutout_shared(x, k_cutout, params.cutout_ratio)
        return x
    elif semantics == "per_image":
        # uint8 quantization (truncation, as np.ndarray.astype does) between
        # stages, mirroring the reference's uint8-domain pipeline.
        def q(v: jax.Array) -> jax.Array:
            return jnp.floor(jnp.clip(v, 0.0, 1.0) * 255.0) / 255.0

        x = q(apply_gaussian_noise(x, k_noise, params.gaussian_noise_sigma))
        x = q(apply_contrast_scale(x, k_contrast, params.contrast_range))
        # cv2 rounds blurred uint8 results to nearest.
        x = apply_gaussian_blur(x, params.gaussian_blur_sigma, params.blur_kernel_size)
        x = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
        x = apply_cutout_per_image(x, k_cutout, params.cutout_ratio)
        return x
    else:
        raise ValueError(f"unknown semantics: {semantics!r}")


def disturb_uint8(
    x: jax.Array,
    key: jax.Array,
    params: DisturbanceParams,
    semantics: Literal["batched", "per_image", "stack_frames"] = "batched",
) -> jax.Array:
    """Convenience wrapper: uint8 ``[B, H, W, C]`` in, uint8 out."""
    y = disturb(x.astype(jnp.float32) / 255.0, key, params, semantics)
    return (jnp.clip(y, 0.0, 1.0) * 255.0).astype(jnp.uint8)
