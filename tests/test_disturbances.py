"""Numerical tests for the on-device disturbance pipeline.

Oracles re-derive the reference math in NumPy/OpenCV (SURVEY §4: kernel
unit tests against a NumPy/OpenCV oracle of `shared/disturbances.py`).
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_ppo_tpu.ops import (
    SEVERITY_CONFIGS,
    DisturbanceParams,
    DisturbanceSeverity,
    disturb,
    disturb_uint8,
    resolve_params,
)
from clip_ppo_tpu.ops.disturbances import (
    apply_contrast_blend,
    apply_contrast_scale,
    apply_cutout_per_image,
    apply_cutout_shared,
    apply_gaussian_blur,
    apply_gaussian_noise,
    gaussian_kernel_1d,
)


def _rand_img(key, b=4, h=84, w=84, c=3):
    return jax.random.uniform(jax.random.PRNGKey(key), (b, h, w, c), dtype=jnp.float32)


class TestSeverityConfigs:
    def test_presets_match_reference_values(self):
        m = SEVERITY_CONFIGS[DisturbanceSeverity.MILD]
        assert (m.gaussian_noise_sigma, m.gaussian_blur_sigma) == (0.08, 1.0)
        assert m.contrast_range == (0.75, 1.25) and m.cutout_ratio == 0.10
        s = SEVERITY_CONFIGS[DisturbanceSeverity.SEVERE]
        assert (s.gaussian_noise_sigma, s.gaussian_blur_sigma) == (0.26, 3.0)
        assert s.contrast_range == (0.6, 1.4) and s.cutout_ratio == 0.25

    def test_blur_kernel_size_rule(self):
        # max(3, int(2*sigma)+1), bumped to odd.
        assert SEVERITY_CONFIGS[DisturbanceSeverity.MILD].blur_kernel_size == 3
        assert SEVERITY_CONFIGS[DisturbanceSeverity.MODERATE].blur_kernel_size == 5
        assert SEVERITY_CONFIGS[DisturbanceSeverity.HARD].blur_kernel_size == 5
        assert SEVERITY_CONFIGS[DisturbanceSeverity.SEVERE].blur_kernel_size == 7

    def test_resolve_requires_all_custom_params(self):
        with pytest.raises(ValueError):
            resolve_params(None, gaussian_noise_sigma=0.1)
        p = resolve_params(
            None,
            gaussian_noise_sigma=0.1,
            gaussian_blur_sigma=1.5,
            contrast_range=(0.5, 1.5),
            cutout_ratio=0.2,
        )
        assert p.blur_kernel_size == 5
        assert resolve_params("HARD") == SEVERITY_CONFIGS[DisturbanceSeverity.HARD]


class TestNoise:
    def test_moments_and_clipping(self):
        x = jnp.full((2, 64, 64, 3), 0.5, dtype=jnp.float32)
        y = apply_gaussian_noise(x, jax.random.PRNGKey(0), 0.12)
        resid = np.asarray(y - x)
        assert abs(resid.mean()) < 5e-3
        assert abs(resid.std() - 0.12) < 5e-3
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_zero_sigma_identity(self):
        x = _rand_img(1)
        y = apply_gaussian_noise(x, jax.random.PRNGKey(0), 0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-7)


class TestContrast:
    def test_blend_matches_torchvision_formula(self):
        # out = f*x + (1-f)*mean(gray(x)); recover f from a known pixel.
        x = _rand_img(2)
        y = apply_contrast_blend(x, jax.random.PRNGKey(3), (0.6, 1.4))
        xn, yn = np.asarray(x), np.asarray(y)
        luma = np.array([0.2989, 0.587, 0.114], dtype=np.float32)
        for i in range(xn.shape[0]):
            mean = (xn[i] @ luma).mean()
            # Solve y = f*x + (1-f)*mean pixelwise; f must be constant.
            denom = xn[i] - mean
            mask = np.abs(denom) > 1e-2
            f = (yn[i] - mean)[mask] / denom[mask]
            inside = (yn[i] > 1e-6) & (yn[i] < 1 - 1e-6)  # ignore clipped px
            f = f[inside[mask]] if inside[mask].shape == f.shape else f
            assert f.std() < 1e-4
            assert 0.6 <= f.mean() <= 1.4

    def test_scale_is_multiplicative(self):
        x = _rand_img(4) * 0.5  # keep away from clipping
        y = apply_contrast_scale(x, jax.random.PRNGKey(5), (0.7, 1.3))
        ratio = np.asarray(y) / np.asarray(x)
        for i in range(ratio.shape[0]):
            r = ratio[i][np.asarray(x[i]) > 1e-3]
            assert r.std() < 1e-4
            assert 0.7 <= r.mean() <= 1.3

    def test_per_image_factors_differ(self):
        x = jnp.broadcast_to(_rand_img(6, b=1), (8, 84, 84, 3))
        y = apply_contrast_scale(x * 0.5, jax.random.PRNGKey(7), (0.7, 1.3))
        means = np.asarray(y).mean(axis=(1, 2, 3))
        assert means.std() > 1e-4


class TestBlur:
    @pytest.mark.parametrize("severity", ["MILD", "MODERATE", "SEVERE"])
    def test_matches_cv2_gaussian_blur(self, severity):
        p = SEVERITY_CONFIGS[DisturbanceSeverity[severity]]
        x = np.asarray(_rand_img(8, b=2))
        y = np.asarray(apply_gaussian_blur(jnp.asarray(x), p.gaussian_blur_sigma, p.blur_kernel_size))
        for i in range(2):
            for c in range(3):
                ref = cv2.GaussianBlur(
                    x[i, :, :, c],
                    (p.blur_kernel_size, p.blur_kernel_size),
                    p.gaussian_blur_sigma,
                )  # default border = REFLECT_101 = jnp.pad 'reflect'
                np.testing.assert_allclose(y[i, :, :, c], ref, atol=2e-6)

    def test_kernel_normalized(self):
        k = gaussian_kernel_1d(2.0, 5)
        assert abs(k.sum() - 1.0) < 1e-6
        assert np.all(k == k[::-1])  # symmetric

    def test_preserves_constant_image(self):
        x = jnp.full((1, 32, 32, 1), 0.3, dtype=jnp.float32)
        y = apply_gaussian_blur(x, 3.0, 7)
        np.testing.assert_allclose(np.asarray(y), 0.3, atol=1e-6)


class TestCutout:
    def test_shared_patch_geometry(self):
        # ratio 0.17 on 84x84 → area 1199, h=34, w=35 (reference formula).
        x = jnp.ones((4, 84, 84, 3), dtype=jnp.float32)
        y = np.asarray(apply_cutout_shared(x, jax.random.PRNGKey(9), 0.17))
        zeros = (y[0] == 0).all(axis=-1)
        rows = np.where(zeros.any(axis=1))[0]
        cols = np.where(zeros.any(axis=0))[0]
        assert len(rows) == 34 and len(cols) == 35
        # All batch elements share the same patch.
        for i in range(1, 4):
            np.testing.assert_array_equal((y[i] == 0).all(axis=-1), zeros)

    def test_per_image_patches_differ(self):
        x = jnp.ones((8, 84, 84, 3), dtype=jnp.float32)
        y = np.asarray(apply_cutout_per_image(x, jax.random.PRNGKey(11), 0.17))
        masks = [(y[i] == 0).all(axis=-1) for i in range(8)]
        assert any(not np.array_equal(masks[0], m) for m in masks[1:])
        for m in masks:
            assert m.sum() == 34 * 35


class TestFullPipeline:
    @pytest.mark.parametrize("semantics", ["batched", "per_image"])
    def test_output_range_and_shape(self, semantics):
        x = _rand_img(12)
        y = disturb(x, jax.random.PRNGKey(0), SEVERITY_CONFIGS[DisturbanceSeverity.HARD], semantics)
        assert y.shape == x.shape and y.dtype == x.dtype
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_deterministic_given_key(self):
        x = _rand_img(13)
        p = SEVERITY_CONFIGS[DisturbanceSeverity.MODERATE]
        y1 = disturb(x, jax.random.PRNGKey(42), p)
        y2 = disturb(x, jax.random.PRNGKey(42), p)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        y3 = disturb(x, jax.random.PRNGKey(43), p)
        assert not np.array_equal(np.asarray(y1), np.asarray(y3))

    def test_uint8_roundtrip(self):
        x = (np.asarray(_rand_img(14)) * 255).astype(np.uint8)
        y = disturb_uint8(jnp.asarray(x), jax.random.PRNGKey(1), SEVERITY_CONFIGS[DisturbanceSeverity.MILD])
        assert y.dtype == jnp.uint8 and y.shape == x.shape

    def test_single_channel_input(self):
        # Atari path disturbs each grayscale frame separately.
        x = _rand_img(15, c=1)
        y = disturb(x, jax.random.PRNGKey(2), SEVERITY_CONFIGS[DisturbanceSeverity.MODERATE])
        assert y.shape == x.shape

    def test_jit_under_vmap_over_batch_of_batches(self):
        # The rollout scan vmaps/folds keys; the pipeline must trace cleanly.
        p = SEVERITY_CONFIGS[DisturbanceSeverity.MILD]
        xs = jax.random.uniform(jax.random.PRNGKey(3), (2, 4, 84, 84, 3))
        keys = jax.random.split(jax.random.PRNGKey(4), 2)
        ys = jax.vmap(lambda x, k: disturb(x, k, p))(xs, keys)
        assert ys.shape == xs.shape
