"""Disturbance-pipeline benchmark: per-image vs batched semantics on device.

Rebuild of `shared/benchmark_disturbances.py` (reference lines 19-126):
the reference times its CPU per-image path against the CUDA batched path
over batch sizes {1,4,8,16,32,64} at HARD severity on 84×84×3 images with
50 iterations and prints a speedup table. Here both semantics are XLA
programs on the accelerator, so the table compares the per-image-semantics
pipeline (vanilla-PPO path) against the batched-semantics pipeline
(CLIP-PPO trained path), each timed as a dependency-chained scan with a final scalar fetch (the
role ``torch.cuda.synchronize`` plays in the original; plain
``block_until_ready`` does not reliably synchronize on tunneled TPU
devices). The batched path uses the fused Pallas kernel on TPU.

Usage:
    python -m clip_ppo_tpu.cli.benchmark_disturbances
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from clip_ppo_tpu.ops import DisturbanceSeverity, resolve_params
from clip_ppo_tpu.ops.disturbances import disturb, disturb_auto
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


def _time(fn, x, key, iterations: int) -> float:
    """Chained scan + one dependent scalar fetch (block_until_ready does
    not reliably synchronize on tunneled TPU devices)."""
    import jax.numpy as jnp

    @jax.jit
    def chained(x0, k0):
        def body(carry, _):
            xc, k = carry
            k, k2 = jax.random.split(k)
            return (fn(xc, k2), k), None

        (xn, _), _ = jax.lax.scan(body, (x0, k0), None, length=iterations)
        return xn.reshape(-1)[0]

    _ = float(chained(x, key))  # compile + warmup
    t0 = time.perf_counter()
    _ = float(chained(x, key))
    return (time.perf_counter() - t0) / iterations


def benchmark_disturbances(args: BenchArgs) -> list[dict]:
    params = resolve_params(DisturbanceSeverity[args.severity])
    key = jax.random.PRNGKey(args.seed)
    per_image = lambda x, k: disturb(x, k, params, "per_image")
    batched = lambda x, k: disturb_auto(x, k, params, "batched")

    rows = []
    print(f"Benchmarking severity={args.severity} "
          f"{args.height}x{args.width}x{args.channels}, "
          f"{args.iterations} iterations on {jax.devices()[0].platform}")
    print(f"{'batch':>6} {'per-image ms':>14} {'batched ms':>12} {'speedup':>8}")
    for b in args.batch_sizes:
        x = jax.random.uniform(
            key, (b, args.height, args.width, args.channels), jnp.float32
        )
        t_per_image = _time(per_image, x, key, args.iterations)
        t_batched = _time(batched, x, key, args.iterations)
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
