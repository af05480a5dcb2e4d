"""Pallas TPU kernel: the full disturbance pipeline in ONE VMEM pass.

The XLA pipeline (`clip_ppo_tpu.ops.disturbances`) lowers to several
kernels with HBM round-trips between noise, contrast, the two blur convs
and cutout. At 84×84 the op is latency/bandwidth-bound, so fusing the
whole chain into one `pallas_call` — image resident in VMEM, noise drawn
by the on-core PRNG, blur as two small matmuls on the MXU — removes every
intermediate HBM trip. Semantics are the batched ("GPU, trained-path")
pipeline of the reference (`shared/disturbances_gpu.py:66-73`):

* Gaussian noise, clamped to [0,1] — Box–Muller over `pltpu.prng_random_bits`
  (a different PRNG stream than `jax.random`, same distribution; the
  stages below it are bit-comparable to the XLA path);
* contrast blend toward the per-image gray mean with ONE factor per call
  (torchvision ColorJitter), the factor drawn outside with `jax.random`
  and passed as a scalar;
* separable Gaussian blur with BORDER_REFLECT_101 padding, expressed as
  banded matmuls ``T_h @ X`` / ``X @ T_wᵀ`` with the reflection baked
  into the band matrices — mathematically identical to the depthwise
  convs, and MXU work instead of VPU shuffles;
* one cutout rectangle shared by the batch (position passed as scalars).

Layout: images enter as ``[B, C·H, W]`` (channels stacked along sublanes)
so the lane axis is W — no 3/4-channel lane waste. Grid = (B,); each
program owns one image. Per-image PRNG streams come from seeding with
``seed + program_id``.

Falls back to interpreter mode off-TPU, so the same code path is unit
tested on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_ppo_tpu.ops.disturbances import _LUMA, _cutout_patch_hw, gaussian_kernel_1d
from clip_ppo_tpu.ops.severity import DisturbanceParams

_TWO_PI = 2.0 * np.pi


def _reflect_band_matrix(n: int, sigma: float, ksize: int) -> np.ndarray:
    """[n, n] matrix T with T[i, j] = sum of Gaussian taps that land on
    source row j for output row i under BORDER_REFLECT_101 — so
    ``T @ X`` equals the reflect-padded 1-D Gaussian conv along axis 0."""
    taps = gaussian_kernel_1d(sigma, ksize)
    half = ksize // 2
    T = np.zeros((n, n), np.float32)
    for i in range(n):
        for k, w in enumerate(taps):
            j = i + k - half
            # BORDER_REFLECT_101: ... 2 1 | 0 1 2 ... n-1 | n-2 n-3 ...
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * n - 2 - j
            T[i, j] += w
    return T


def _uniform_from_bits(bits: jax.Array) -> jax.Array:
    """uint32 → float32 uniform in (0, 1): set mantissa, subtract 1."""
    mantissa = jax.lax.shift_right_logical(bits, np.uint32(9))
    one = jnp.uint32(0x3F800000)
    f = pltpu.bitcast(mantissa | one, jnp.float32)
    return f - 0.9999999  # avoid exactly 0 for the log below


def _disturb_kernel(
    iscalars_ref,  # SMEM [5] int32: seed, cut_r0, cut_r1, cut_c0, cut_c1
    fscalars_ref,  # SMEM [1] float32: contrast factor
    *refs,         # (noise?) x, th, tw, out — noise present iff host_noise
    channels: int,
    height: int,
    noise_sigma: float,
    host_noise: bool,
):
    # host_noise: the interpreter has no lowering for the on-core PRNG, so
    # CPU tests feed precomputed noise; the TPU path draws in-kernel.
    if host_noise:
        noise_ref, x_ref, th_ref, tw_ref, o_ref = refs
    else:
        x_ref, th_ref, tw_ref, o_ref = refs
    b = pl.program_id(0)
    x = x_ref[0]

    # -- Gaussian noise -------------------------------------------------------
    if noise_sigma > 0.0:
        if host_noise:
            normal = noise_ref[0]
        else:
            # Box–Muller over the on-core PRNG, per-image stream.
            pltpu.prng_seed(iscalars_ref[0] + b)
            u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32))
            u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32))
            normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
        x = jnp.clip(x + noise_sigma * normal, 0.0, 1.0)

    # -- contrast blend toward the per-image gray mean -----------------------
    factor = fscalars_ref[0]
    if channels == 3:
        gray = (
            _LUMA[0] * x[0 * height : 1 * height]
            + _LUMA[1] * x[1 * height : 2 * height]
            + _LUMA[2] * x[2 * height : 3 * height]
        )
        mean = jnp.mean(gray)
    else:
        mean = jnp.mean(x)
    x = jnp.clip(factor * x + (1.0 - factor) * mean, 0.0, 1.0)

    # -- separable blur as banded matmuls on the MXU -------------------------
    th = th_ref[:]
    tw = tw_ref[:]
    rows = []
    for c in range(channels):
        xc = x[c * height : (c + 1) * height]
        xc = jnp.dot(th, xc, preferred_element_type=jnp.float32)
        rows.append(xc)
    x = jnp.concatenate(rows, axis=0)
    x = jnp.dot(x, tw, preferred_element_type=jnp.float32)

    # -- shared cutout rectangle ---------------------------------------------
    r0, r1 = iscalars_ref[1], iscalars_ref[2]
    c0, c1 = iscalars_ref[3], iscalars_ref[4]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % height
    col_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    inside = (row_ids >= r0) & (row_ids < r1) & (col_ids >= c0) & (col_ids < c1)
    o_ref[0] = jnp.where(inside, 0.0, x)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def disturb_pallas(
    x: jax.Array,
    key: jax.Array,
    params: DisturbanceParams,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused batched-semantics disturbance pipeline.

    Args:
        x: ``[B, H, W, C]`` float32 in [0, 1].
        key: JAX PRNG key (drives the shared factor/cutout scalars and the
            per-image noise seeds).
        params: severity preset (static).
        interpret: force Pallas interpreter mode (defaults to True off-TPU
            so tests run on CPU).

    Returns ``[B, H, W, C]`` float32 in [0, 1].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape

    k_seed, k_factor, k_cut = jax.random.split(key, 3)
    seed = jax.random.randint(k_seed, (), 0, np.int32(2**31 - 1), jnp.int32)
    lo, hi = params.contrast_range
    factor = jax.random.uniform(k_factor, (), jnp.float32, lo, hi)
    ph, pw = _cutout_patch_hw(h, w, params.cutout_ratio)
    kh, kw = jax.random.split(k_cut)
    r0 = jax.random.randint(kh, (), 0, max(1, h - ph + 1), jnp.int32)
    c0 = jax.random.randint(kw, (), 0, max(1, w - pw + 1), jnp.int32)
    iscalars = jnp.stack([seed, r0, r0 + ph, c0, c0 + pw])
    fscalars = factor.reshape(1)

    th = jnp.asarray(
        _reflect_band_matrix(h, params.gaussian_blur_sigma, params.blur_kernel_size)
    )
    # For the column pass we right-multiply: X @ T_wᵀ.
    tw = jnp.asarray(
        _reflect_band_matrix(w, params.gaussian_blur_sigma, params.blur_kernel_size)
    ).T

    # [B, H, W, C] → [B, C·H, W] (channel-stacked rows, W on lanes).
    xs = jnp.moveaxis(x, -1, 1).reshape(b, c * h, w).astype(jnp.float32)

    host_noise = bool(interpret) and params.gaussian_noise_sigma > 0.0
    kernel = functools.partial(
        _disturb_kernel, channels=c, height=h,
        noise_sigma=params.gaussian_noise_sigma, host_noise=host_noise,
    )
    img_spec = pl.BlockSpec((1, c * h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [iscalars, fscalars]
    if host_noise:
        in_specs.append(img_spec)
        operands.append(jax.random.normal(k_seed, xs.shape, jnp.float32))
    in_specs += [
        img_spec,
        pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [xs, th, tw]
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((b, c * h, w), jnp.float32),
        interpret=interpret,
    )(*operands)

    return jnp.moveaxis(out.reshape(b, c, h, w), 1, -1)
