"""Stateful wrapper API over the disturbance pipeline (reference surface).

The reference exposes disturbances through two wrapper classes and a
factory (`shared/disturbances.py:11-67`, `shared/disturbances_gpu.py:14-214`):

* ``DisturbanceWrapper(seed, severity).apply_disturbances(uint8 HWC)`` —
  per-image CPU semantics;
* ``DisturbanceWrapperGPU(seed, severity).apply_disturbances(float
  [B,C,H,W] in [0,1])`` — batched semantics (torch layout), plus
  ``apply_*_numpy`` helpers used by its test script;
* ``create_disturbance_wrapper(use_gpu=...)`` factory
  (`disturbances_gpu.py:198-214`).

Here both classes drive the same jitted device pipeline
(:mod:`clip_ppo_tpu.ops.disturbances`); the classes only hold the PRNG
chain and do layout/dtype adaptation, so code written against the
reference API ports directly while the compute is XLA. (The training CLIs
bypass this stateful surface and fold the pure pipeline into the rollout
scan — this wrapper exists for API parity and host-side use.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.ops.disturbances import disturb, disturb_auto
from clip_ppo_tpu.ops.severity import DisturbanceSeverity, resolve_params


class _Base:
    _semantics: str

    def __init__(
        self,
        seed: int = 0,
        severity: Optional[DisturbanceSeverity | str] = DisturbanceSeverity.MODERATE,
        **custom,
    ):
        self.params = resolve_params(severity, **custom)
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self) -> jax.Array:
        self._key, key = jax.random.split(self._key)
        return key


class DisturbanceWrapper(_Base):
    """Per-image-semantics wrapper (`shared/disturbances.py:11-67`):
    uint8 HWC (or batched NHWC) in, uint8 out."""

    _semantics = "per_image"

    def apply_disturbances(self, obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs)
        single = obs.ndim == 3
        x = obs[None] if single else obs
        y = disturb(
            jnp.asarray(x, jnp.float32) / 255.0,
            self._next_key(),
            self.params,
            self._semantics,
        )
        out = np.asarray(jnp.clip(y, 0.0, 1.0) * 255.0).astype(np.uint8)
        return out[0] if single else out


class DisturbanceWrapperGPU(_Base):
    """Batched-semantics wrapper (`shared/disturbances_gpu.py:14-73`):
    float [B, C, H, W] in [0,1] in (torch layout), same out. Also accepts
    NHWC when ``channel_last=True``."""

    _semantics = "batched"

    def __init__(self, device=None, seed: int = 0,
                 severity=DisturbanceSeverity.MODERATE, **custom):
        # ``device`` accepted for signature parity; JAX places the compute.
        super().__init__(seed=seed, severity=severity, **custom)

    def apply_disturbances(self, obs, channel_last: bool = False):
        x = jnp.asarray(obs, jnp.float32)
        if not channel_last:
            x = jnp.moveaxis(x, 1, -1)  # BCHW → BHWC
        y = disturb_auto(x, self._next_key(), self.params, self._semantics)
        if not channel_last:
            y = jnp.moveaxis(y, -1, 1)
        return y

    # -- numpy helpers mirroring `disturbances_gpu.py:75-194` ----------------

    def _single(self, img: np.ndarray, stage: str) -> np.ndarray:
        from clip_ppo_tpu.ops import disturbances as D

        x = jnp.asarray(np.asarray(img), jnp.float32)[None] / 255.0
        key = self._next_key()
        if stage == "noise":
            y = D.apply_gaussian_noise(x, key, self.params.gaussian_noise_sigma)
        elif stage == "contrast":
            y = D.apply_contrast_blend(x, key, self.params.contrast_range)
        elif stage == "blur":
            y = D.apply_gaussian_blur(
                x, self.params.gaussian_blur_sigma, self.params.blur_kernel_size
            )
        elif stage == "cutout":
            y = D.apply_cutout_shared(x, key, self.params.cutout_ratio)
        else:
            raise ValueError(stage)
        return np.asarray(jnp.clip(y[0], 0.0, 1.0) * 255.0).astype(np.uint8)

    def apply_gaussian_noise_numpy(self, img: np.ndarray) -> np.ndarray:
        return self._single(img, "noise")

    def apply_contrast_jitter_numpy(self, img: np.ndarray) -> np.ndarray:
        return self._single(img, "contrast")

    def apply_gaussian_blur_numpy(self, img: np.ndarray) -> np.ndarray:
        return self._single(img, "blur")

    def apply_cutout_numpy(self, img: np.ndarray) -> np.ndarray:
        return self._single(img, "cutout")

    def apply_disturbances_numpy(self, img: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.asarray(img), jnp.float32)[None] / 255.0
        y = disturb_auto(x, self._next_key(), self.params, self._semantics)
        return np.asarray(jnp.clip(y[0], 0.0, 1.0) * 255.0).astype(np.uint8)


def create_disturbance_wrapper(
    use_gpu: bool = True,
    device=None,
    seed: int = 0,
    severity=DisturbanceSeverity.MODERATE,
    **custom,
):
    """Factory mirroring `disturbances_gpu.py:198-214`. ``use_gpu`` picks
    the batched-semantics wrapper (the reference's GPU path); both run on
    the accelerator here."""
    if use_gpu:
        return DisturbanceWrapperGPU(device=device, seed=seed, severity=severity, **custom)
    return DisturbanceWrapper(seed=seed, severity=severity, **custom)
