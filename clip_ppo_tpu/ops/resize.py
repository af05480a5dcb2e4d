"""Image resize / normalization ops for the preprocessing graph.

TPU-native replacements for the resize calls the reference delegates to
native libraries:

* ``resize_bilinear_antialias`` — matches torch
  ``F.interpolate(..., mode='bilinear', align_corners=False, antialias=True)``
  used to feed CLIP at 224×224 (`shared/clip_ppo_utils.py:151-157,206`).
  ``jax.image.resize(method='linear')`` *is* an antialiased bilinear resize
  with half-pixel centers, so the semantics line up.
* ``upscale_nearest`` — integer-factor nearest upscale, equivalent to
  cv2/gymnasium ``ResizeObservation`` INTER_AREA for exact integer zoom
  (the 7×7 MiniGrid symbolic view → 84×84, `ppo_minigrid.py:114`).
* ``clip_normalize`` — CLIP's ImageNet normalization constants
  (`shared/clip_ppo_utils.py:21-22`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def resize_bilinear_antialias(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Antialiased bilinear resize of ``[..., H, W, C]`` to ``size=(H', W')``."""
    out_shape = x.shape[:-3] + (size[0], size[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="linear", antialias=True)


def upscale_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-neighbor integer upscale of ``[..., H, W, C]`` by ``factor``."""
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)


def clip_normalize(x: jax.Array) -> jax.Array:
    """Apply CLIP's channel normalization to ``[..., H, W, 3]`` in [0,1]."""
    mean = jnp.asarray(CLIP_MEAN, dtype=x.dtype)
    std = jnp.asarray(CLIP_STD, dtype=x.dtype)
    return (x - mean) / std


def preprocess_for_clip(x: jax.Array, size: int = 224) -> jax.Array:
    """[B, H, W, 3] float [0,1] → resized-to-``size`` + CLIP-normalized.

    Fuses the resize-224 + normalization that the reference performs with
    torch interpolate + tensor broadcasting (`clip_ppo_utils.py:149-160`).
    """
    return clip_normalize(resize_bilinear_antialias(x, (size, size)))


def rgb_to_grayscale(x: jax.Array) -> jax.Array:
    """ITU-R 601 luma, matching cv2.cvtColor(RGB2GRAY) used by WarpFrame."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=x.dtype)
    return jnp.einsum("...c,c->...", x, w)
