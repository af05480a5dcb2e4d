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


def _phase_masks(upscale: int, kernel: int = 8, stride: int = 4) -> np.ndarray:
    """Tile-offset selection masks for conv1 over a ×``upscale``
    nearest-neighbor image.

    Output column i of the strided conv reads pixels ``stride·i + u``;
    on a nearest-upscaled image pixel p carries tile ``p // upscale``, so
    relative to tile ``(stride·i) // upscale`` the window touches offsets
    ``off[r][u] = ((stride·i) % upscale + u) // upscale`` — depending on
    i only through the phase ``r = i mod (upscale/gcd(upscale, stride))``.
    Returns one-hot masks [P, 2, K] with m[r, off[r][u], u] = 1.
    """
    import math

    period = upscale // math.gcd(upscale, stride)
    off = np.array(
        [[((stride * r) % upscale + u) // upscale for u in range(kernel)]
         for r in range(period)]
    )
    assert off.max() <= 1, "window must span at most 2 tiles per axis"
    m = np.zeros((period, 2, kernel), np.float32)
    for r in range(period):
        for u in range(kernel):
            m[r, off[r, u], u] = 1.0
    return m


def nature_cnn_view(p: Params, v: jax.Array, upscale: int,
                    dtype=None, v_scale: float = 1.0) -> jax.Array:
    """[B, 7, 7, C] float view → [B, hidden]; exactly
    ``nature_cnn(p, nearest_upscale(view) * v_scale)`` with conv1
    reformulated.

    MiniGrid observations are a ×12 nearest upscale of the 7×7 symbolic
    view (ImgObsWrapper + ResizeObservation, `ppo_minigrid.py:110-114`),
    so every conv1 weight multiplies its pixel's TILE value: the 84×84
    conv collapses to a per-phase contraction of tile-summed weights
    with the raw view — ~14× fewer FLOPs, no 84×84 buffers, and none of
    the batch-minor relayout copies the TPU conv emitter needs at tiny
    batch (25.7 µs/step measured on v5e, the single hottest rollout op).
    Gradients through the (linear) weight pre-sum match the dense conv.

    Precision: the TPU-default bf16 passes on tiny /255 view values
    chained through two contractions cost ~3% relative feature error —
    enough to flatline learning (Empty-16x16 250k: 0.024 vs 0.976,
    measured on v5e). So the obs normalization is folded in HERE via
    ``v_scale`` (pass the RAW integer-coded view and v_scale=1/255): the
    weight pre-sum — loop-invariant, XLA hoists it out of the rollout
    scan — absorbs the scale and runs at HIGHEST precision for free,
    while the hot per-step contraction consumes integer view values
    (exact in bf16; MiniGrid codes are ≤ 10) at full MXU speed, leaving
    one bf16 weight rounding — the same error class as the dense conv
    path, which trains to reference quality at default precision.
    """
    w1 = p["conv1"]["w"].astype(dtype) if dtype else p["conv1"]["w"]
    v = v.astype(w1.dtype)
    m = jnp.asarray(_phase_masks(upscale), w1.dtype)        # [P, 2, K]
    # W2[r, s, dt, ds, c, o]: conv1 weights pre-summed per (phase, tile
    # offset), scaled by v_scale. Loop-invariant (XLA hoists it), so
    # HIGHEST precision is amortized across the whole rollout scan.
    w2 = jnp.einsum("rdu,sev,uvco->rsdeco", m, m, w1 * v_scale,
                    precision=jax.lax.Precision.HIGHEST)
    bsz, vs = v.shape[0], v.shape[1]
    vp = jnp.pad(v, ((0, 0), (0, 1), (0, 1), (0, 0)))
    v4 = jnp.stack(
        [
            jnp.stack([vp[:, :vs, :vs], vp[:, :vs, 1:vs + 1]], axis=-2),
            jnp.stack([vp[:, 1:vs + 1, :vs], vp[:, 1:vs + 1, 1:vs + 1]],
                      axis=-2),
        ],
        axis=-3,
    )                                                       # [B,V,V,2,2,C]
    out = jnp.einsum("bxydec,rsdeco->bxryso", v4, w2)       # [B,V,P,V,P,O]
    osz = (vs * upscale - 8) // 4 + 1
    per = m.shape[0]
    out = out.reshape(bsz, vs * per, vs * per, w2.shape[-1])[:, :osz, :osz, :]
    x = jax.nn.relu(out + p["conv1"]["b"].astype(out.dtype))
    x = jax.nn.relu(conv(p["conv2"], x, 2, dtype))
    x = jax.nn.relu(conv(p["conv3"], x, 1, dtype))
    x = x.reshape(bsz, -1)
    x = jax.nn.relu(dense(p["fc"], x, dtype))
    return x.astype(jnp.float32)
