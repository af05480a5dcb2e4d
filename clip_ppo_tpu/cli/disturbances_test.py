"""Visual disturbance check: per-stage and combined panels saved to disk.

Rebuild of `shared/disturbances_test.py` (reference lines 16-209) for
headless TPU hosts: the reference loads a local ``lenna.png`` and opens
``cv2.imshow`` windows; here the input defaults to a generated synthetic
test card (checker + gradient + circles — structure that makes noise,
blur, contrast and cutout each visually obvious), every enabled
disturbance is applied individually plus combined, and the side-by-side
panel is written as one PNG. Same per-disturbance toggles, parameter
overrides, and fixed default seed (42).

Usage:
    python -m clip_ppo_tpu.cli.disturbances_test --severity HARD
    python -m clip_ppo_tpu.cli.disturbances_test --image path.png --no-blur
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.ops import DisturbanceSeverity, resolve_params
from clip_ppo_tpu.ops.disturbances import (
    apply_contrast_blend,
    apply_cutout_shared,
    apply_gaussian_blur,
    apply_gaussian_noise,
)
from clip_ppo_tpu.utils import flags


@dataclass
class DisturbanceTestArgs:
    """Configuration for the visual disturbance test."""

    image: Optional[str] = None
    """input image path (default: generated synthetic test card)"""
    output: str = "disturbance_test.png"
    """output panel path"""
    severity: str = "HARD"
    """severity preset: MILD, MODERATE, HARD, SEVERE"""
    # Per-disturbance toggles (reference `disturbances_test.py:28-39`).
    noise: bool = True
    """apply Gaussian noise"""
    contrast: bool = True
    """apply contrast jitter"""
    blur: bool = True
    """apply Gaussian blur"""
    cutout: bool = True
    """apply cutout"""
    # Parameter overrides (None → severity preset values).
    noise_sigma: Optional[float] = None
    """override Gaussian noise sigma"""
    blur_sigma: Optional[float] = None
    """override Gaussian blur sigma"""
    contrast_min: Optional[float] = None
    """override contrast range lower bound"""
    contrast_max: Optional[float] = None
    """override contrast range upper bound"""
    cutout_ratio: Optional[float] = None
    """override cutout area ratio"""
    seed: int = 42
    """PRNG seed"""
    size: int = 256
    """synthetic test-card size"""


def test_card(size: int) -> np.ndarray:
    """Synthetic RGB test image in [0,1]: gradient + checker + circles."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    r = 0.5 + 0.5 * np.sin(10 * np.pi * x) * np.sin(10 * np.pi * y)  # checker-ish
    g = x  # horizontal gradient
    b = y  # vertical gradient
    img = np.stack([r, g, b], axis=-1)
    cy, cx = size / 2, size / 2
    for rad, val in ((size * 0.3, 1.0), (size * 0.18, 0.0), (size * 0.08, 1.0)):
        mask = (np.mgrid[0:size, 0:size][0] - cy) ** 2 + (
            np.mgrid[0:size, 0:size][1] - cx
        ) ** 2 < rad**2
        img[mask] = val
    return np.clip(img, 0.0, 1.0)


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return img


def run(args: DisturbanceTestArgs) -> str:
    params = resolve_params(DisturbanceSeverity[args.severity])
    import dataclasses as _dc

    overrides = {}
    if args.noise_sigma is not None:
        overrides["gaussian_noise_sigma"] = args.noise_sigma
    if args.blur_sigma is not None:
        overrides["gaussian_blur_sigma"] = args.blur_sigma
    if args.contrast_min is not None or args.contrast_max is not None:
        lo, hi = params.contrast_range
        overrides["contrast_range"] = (
            args.contrast_min if args.contrast_min is not None else lo,
            args.contrast_max if args.contrast_max is not None else hi,
        )
    if args.cutout_ratio is not None:
        overrides["cutout_ratio"] = args.cutout_ratio
    params = _dc.replace(params, **overrides)

    img = load_image(args.image) if args.image else test_card(args.size)
    x = jnp.asarray(img)[None]  # [1, H, W, 3]
    key = jax.random.PRNGKey(args.seed)
    k_noise, k_contrast, k_cutout, k_combined = jax.random.split(key, 4)

    panels: list[tuple[str, np.ndarray]] = [("original", img)]
    if args.noise:
        panels.append(
            ("noise", np.asarray(apply_gaussian_noise(x, k_noise, params.gaussian_noise_sigma))[0])
        )
    if args.contrast:
        panels.append(
            ("contrast", np.asarray(apply_contrast_blend(x, k_contrast, params.contrast_range))[0])
        )
    if args.blur:
        panels.append(
            ("blur", np.asarray(apply_gaussian_blur(x, params.gaussian_blur_sigma, params.blur_kernel_size))[0])
        )
    if args.cutout:
        panels.append(
            ("cutout", np.asarray(apply_cutout_shared(x, k_cutout, params.cutout_ratio))[0])
        )
    if args.noise or args.contrast or args.blur or args.cutout:
        # Combined panel applies ONLY the enabled stages, in pipeline order
        # (matching the reference harness's toggle semantics).
        kc = jax.random.split(k_combined, 3)
        y = x
        if args.noise:
            y = apply_gaussian_noise(y, kc[0], params.gaussian_noise_sigma)
        if args.contrast:
            y = apply_contrast_blend(y, kc[1], params.contrast_range)
        if args.blur:
            y = apply_gaussian_blur(y, params.gaussian_blur_sigma, params.blur_kernel_size)
        if args.cutout:
            y = apply_cutout_shared(y, kc[2], params.cutout_ratio)
        panels.append(("combined", np.asarray(y)[0]))

    from PIL import Image, ImageDraw

    h, w = panels[0][1].shape[:2]
    pad, caption = 4, 14
    canvas = Image.new(
        "RGB", (len(panels) * (w + pad) - pad, h + caption), "black"
    )
    draw = ImageDraw.Draw(canvas)
    for i, (name, p) in enumerate(panels):
        tile = Image.fromarray((np.clip(p, 0, 1) * 255).astype(np.uint8))
        canvas.paste(tile, (i * (w + pad), caption))
        draw.text((i * (w + pad) + 2, 1), f"{name}", fill="white")
    out_dir = os.path.dirname(args.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    canvas.save(args.output)
    print(f"severity={args.severity} panels={[n for n, _ in panels]}")
    print(f"saved {args.output}")
    return args.output


def main() -> None:
    run(flags.parse(DisturbanceTestArgs))


if __name__ == "__main__":
    main()
