"""Nature-CNN actor-critic agent as pure-JAX functional modules.

TPU-native equivalent of the reference's `Agent` nn.Module
(`ppo_minigrid.py:128-162`, `ppo_atari.py:125-151`): the same
conv(8/4)-conv(4/2)-conv(3/1)-dense(512) trunk with orthogonal
initialization (std sqrt(2), actor 0.01, critic 1.0) and ReLU, but

* NHWC end-to-end (no NCHW permutes — TPU convs are natively NHWC);
* parameters are plain pytrees; ``apply`` is a pure function, so the
  whole agent fuses into the jitted rollout/update graphs;
* an optional ``compute_dtype`` (bfloat16) runs the convs/matmuls on the
  MXU at full throughput while keeping parameters and the loss in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


def _orthogonal(key: jax.Array, shape: tuple[int, ...], scale: float) -> jax.Array:
    """Orthogonal init over the flattened-input × output matrix, matching
    torch.nn.init.orthogonal_ as used by `layer_init` (`ppo_minigrid.py:122-125`)."""
    init = jax.nn.initializers.orthogonal(scale=scale, column_axis=-1)
    return init(key, shape, jnp.float32)


def init_conv(key: jax.Array, kh: int, kw: int, cin: int, cout: int, scale: float = np.sqrt(2)) -> Params:
    return {
        "w": _orthogonal(key, (kh, kw, cin, cout), scale),  # HWIO
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init_dense(key: jax.Array, din: int, dout: int, scale: float = np.sqrt(2)) -> Params:
    return {
        "w": _orthogonal(key, (din, dout), scale),
        "b": jnp.zeros((dout,), jnp.float32),
    }


def conv(p: Params, x: jax.Array, stride: int, dtype=None) -> jax.Array:
    w = p["w"].astype(dtype) if dtype else p["w"]
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(y.dtype)


def dense(p: Params, x: jax.Array, dtype=None) -> jax.Array:
    w = p["w"].astype(dtype) if dtype else p["w"]
    return x.astype(w.dtype) @ w + p["b"].astype(w.dtype)


def init_nature_cnn(key: jax.Array, in_channels: int, hidden: int = 512) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": init_conv(k1, 8, 8, in_channels, 32),
        "conv2": init_conv(k2, 4, 4, 32, 64),
        "conv3": init_conv(k3, 3, 3, 64, 64),
        "fc": init_dense(k4, 64 * 7 * 7, hidden),
    }


def nature_cnn(p: Params, x: jax.Array, dtype=None) -> jax.Array:
    """[B, 84, 84, C] float in [0,1] → [B, hidden] features (post-ReLU)."""
    x = jax.nn.relu(conv(p["conv1"], x, 4, dtype))
    x = jax.nn.relu(conv(p["conv2"], x, 2, dtype))
    x = jax.nn.relu(conv(p["conv3"], x, 1, dtype))
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(dense(p["fc"], x, dtype))
    return x.astype(jnp.float32)
