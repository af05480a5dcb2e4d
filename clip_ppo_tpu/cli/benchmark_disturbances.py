"""Disturbance-pipeline benchmark: per-image vs batched semantics on device.

Rebuild of `shared/benchmark_disturbances.py` (reference lines 19-126):
the reference times its CPU per-image path against the CUDA batched path
over batch sizes {1,4,8,16,32,64} at HARD severity on 84×84×3 images with
50 iterations and prints a speedup table. Here both semantics are XLA
programs on the accelerator, so the table compares the per-image-semantics
pipeline (vanilla-PPO path) against the batched-semantics pipeline
(CLIP-PPO trained path), each jit-compiled and properly fenced with
``block_until_ready`` (the reference's ``torch.cuda.synchronize``).

Usage:
    python -m clip_ppo_tpu.cli.benchmark_disturbances
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from clip_ppo_tpu.ops import DisturbanceSeverity, resolve_params
from clip_ppo_tpu.ops.disturbances import disturb
from clip_ppo_tpu.utils import flags


@dataclass
class BenchArgs:
    batch_sizes: tuple[int, ...] = (1, 4, 8, 16, 32, 64)
    """batch sizes to sweep"""
    iterations: int = 50
    """timed iterations per batch size"""
    severity: str = "HARD"
    """severity preset"""
    height: int = 84
    """image height"""
    width: int = 84
    """image width"""
    channels: int = 3
    """image channels"""
    seed: int = 0
    """PRNG seed"""


def _time(fn, x, keys, iterations: int) -> float:
    fn(x, keys[0]).block_until_ready()  # warmup/compile
    t0 = time.perf_counter()
    for i in range(iterations):
        out = fn(x, keys[i % len(keys)])
    out.block_until_ready()
    return (time.perf_counter() - t0) / iterations


def benchmark_disturbances(args: BenchArgs) -> list[dict]:
    params = resolve_params(DisturbanceSeverity[args.severity])
    keys = jax.random.split(jax.random.PRNGKey(args.seed), 16)
    per_image = jax.jit(lambda x, k: disturb(x, k, params, "per_image"))
    batched = jax.jit(lambda x, k: disturb(x, k, params, "batched"))

    rows = []
    print(f"Benchmarking severity={args.severity} "
          f"{args.height}x{args.width}x{args.channels}, "
          f"{args.iterations} iterations on {jax.devices()[0].platform}")
    print(f"{'batch':>6} {'per-image ms':>14} {'batched ms':>12} {'speedup':>8}")
    for b in args.batch_sizes:
        x = jax.random.uniform(
            keys[0], (b, args.height, args.width, args.channels), jnp.float32
        )
        t_per_image = _time(per_image, x, keys, args.iterations)
        t_batched = _time(batched, x, keys, args.iterations)
        speedup = t_per_image / t_batched if t_batched > 0 else float("inf")
        print(f"{b:>6} {t_per_image * 1e3:>14.3f} {t_batched * 1e3:>12.3f} "
              f"{speedup:>7.2f}x")
        rows.append(
            {
                "batch": b,
                "per_image_ms": t_per_image * 1e3,
                "batched_ms": t_batched * 1e3,
                "speedup": speedup,
            }
        )
    return rows


def main() -> None:
    benchmark_disturbances(flags.parse(BenchArgs))


if __name__ == "__main__":
    main()
