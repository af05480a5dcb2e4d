"""Reference-surface wrapper API: DisturbanceWrapper(GPU) + factory."""

import numpy as np

import jax.numpy as jnp

from clip_ppo_tpu.ops import (
    DisturbanceSeverity,
    DisturbanceWrapper,
    DisturbanceWrapperGPU,
    create_disturbance_wrapper,
)


def _img(seed=0, h=84, w=84, c=3):
    return np.random.RandomState(seed).randint(0, 255, (h, w, c), np.uint8)


def test_cpu_wrapper_uint8_roundtrip():
    w = DisturbanceWrapper(seed=42, severity=DisturbanceSeverity.HARD)
    img = _img()
    out = w.apply_disturbances(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)


def test_cpu_wrapper_batched_input():
    w = DisturbanceWrapper(seed=0, severity="MILD")
    batch = np.stack([_img(i) for i in range(4)])
    out = w.apply_disturbances(batch)
    assert out.shape == batch.shape and out.dtype == np.uint8


def test_gpu_wrapper_bchw_layout():
    w = DisturbanceWrapperGPU(device=None, seed=1, severity=DisturbanceSeverity.MODERATE)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 3, 84, 84), jnp.float32)
    y = w.apply_disturbances(x)
    assert y.shape == (4, 3, 84, 84)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_gpu_wrapper_numpy_helpers():
    w = DisturbanceWrapperGPU(seed=2)
    img = _img()
    for fn in (
        w.apply_gaussian_noise_numpy,
        w.apply_contrast_jitter_numpy,
        w.apply_gaussian_blur_numpy,
        w.apply_cutout_numpy,
        w.apply_disturbances_numpy,
    ):
        out = fn(img)
        assert out.shape == img.shape and out.dtype == np.uint8


def test_rng_chain_advances():
    w = DisturbanceWrapper(seed=3, severity="SEVERE")
    img = _img()
    a, b = w.apply_disturbances(img), w.apply_disturbances(img)
    assert not np.array_equal(a, b)  # fresh key per call
    # Same seed → same sequence (determinism).
    w2 = DisturbanceWrapper(seed=3, severity="SEVERE")
    np.testing.assert_array_equal(a, w2.apply_disturbances(img))


def test_factory():
    gpu = create_disturbance_wrapper(use_gpu=True, seed=0)
    cpu = create_disturbance_wrapper(use_gpu=False, seed=0)
    assert isinstance(gpu, DisturbanceWrapperGPU)
    assert isinstance(cpu, DisturbanceWrapper)
