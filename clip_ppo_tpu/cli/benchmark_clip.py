"""CLIP encoder throughput: frames/sec/chip (and text sequences/sec).

The per-iteration batched CLIP encode is the dominant CLIP cost in
CLIP-PPO training (SURVEY §3 hot loop c), and frames/sec/chip is a
first-class metric of the rebuild (BASELINE.md targets). This benchmark
times the image tower (fused preprocessing included — /255, antialiased
224 resize, normalization, exactly the training path) and the text tower
at growing batch sizes, bf16 on the MXU, properly fenced.

Usage:
    python -m clip_ppo_tpu.cli.benchmark_clip                 # ViT-B/32
    python -m clip_ppo_tpu.cli.benchmark_clip --model ViT-L/14 --batch-sizes 256
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from clip_ppo_tpu.models.clip import CLIP_CONFIGS
from clip_ppo_tpu.models.clip.loader import load_clip_model
from clip_ppo_tpu.models.clip.model import encode_image, encode_text
from clip_ppo_tpu.ops.resize import preprocess_for_clip
from clip_ppo_tpu.utils import flags


@dataclass
class ClipBenchArgs:
    model: str = "ViT-B/32"
    """CLIP variant: ViT-B/32, ViT-B/16, ViT-L/14"""
    batch_sizes: tuple[int, ...] = (64, 256, 1024, 4096)
    """image batch sizes to sweep"""
    text_batch: int = 1024
    """text batch size ([B, 77] tokens)"""
    iterations: int = 10
    """timed iterations"""
    source_size: int = 84
    """input frame size before the fused resize (the rollout frame size)"""
    dtype: str = "bfloat16"
    """compute dtype: bfloat16 | float32"""
    attention_impl: str = "auto"
    """attention implementation: auto (batch-packed for unmasked) | xla |
    packed2 | packed4 | pallas"""
    seed: int = 0
    """PRNG seed"""
    tp: int = 1
    """tensor-parallel degree: shard the tower weights Megatron-style
    over a ``tp`` mesh axis (parallel/tp.py); the batch shards over the
    remaining ``dp`` axis. Forces attention_impl=xla — the Pallas
    kernels have no GSPMD partition rule, so under tp the einsum path is
    the one the compiler can cut along heads/hidden (SURVEY §2c TP)"""
    num_devices: int = 0
    """devices for the (dp, tp) mesh (0 = all available)"""


def _bench(fn, params, data, iterations: int) -> float:
    """Chain ``iterations`` calls inside one jitted scan (each input
    perturbed by the previous output so nothing hoists), then fetch one
    dependent scalar — block_until_ready does not reliably synchronize on
    tunneled TPU devices, so timing must ride a data dependency."""

    @jax.jit
    def chained(p, d):
        def body(carry, _):
            out = fn(p, _perturb(d, carry))
            return out.reshape(-1)[0].astype(jnp.float32), None

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iterations)
        return final

    def _perturb(d, carry):
        if d.dtype == jnp.uint8:
            return d + (carry != 0.5).astype(jnp.uint8)
        return d + (carry != 0.5).astype(d.dtype)

    _ = float(chained(params, data))  # compile + warmup
    t0 = time.perf_counter()
    _ = float(chained(params, data))
    return (time.perf_counter() - t0) / iterations


def main() -> None:
    args = flags.parse(ClipBenchArgs)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = CLIP_CONFIGS[args.model]
    params, cfg = load_clip_model(args.model, pretrained="auto")
    dev = jax.devices()[0]
    print(f"model={args.model} dtype={args.dtype} device={dev.platform} "
          f"({dev.device_kind if hasattr(dev, 'device_kind') else '?'})")

    mesh = None
    if args.tp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from clip_ppo_tpu.parallel.mesh import make_mesh
        from clip_ppo_tpu.parallel.tp import shard_clip_params

        mesh = make_mesh(
            num_devices=args.num_devices or None, tp=args.tp)
        params = shard_clip_params(mesh, params)
        if args.attention_impl != "xla":
            print(f"tp={args.tp}: forcing attention_impl=xla "
                  "(Pallas kernels have no GSPMD partition rule)")
            args.attention_impl = "xla"
        print(f"mesh dp={mesh.shape['dp']} x tp={mesh.shape['tp']}; "
              "weights tensor-sharded, batch on dp")

        def place_batch(x):
            return jax.device_put(x, NamedSharding(mesh, P("dp")))
    else:
        def place_batch(x):
            return x

    @partial(jax.jit, static_argnums=())
    def image_fwd(p, frames):
        x = preprocess_for_clip(
            frames.astype(jnp.float32) / 255.0, cfg.image_size
        )
        return encode_image(p, cfg, x, dtype, attention_impl=args.attention_impl)

    key = jax.random.PRNGKey(args.seed)
    print(f"{'batch':>6} {'ms/batch':>10} {'frames/s/chip':>14}")
    for b in args.batch_sizes:
        frames = place_batch(jax.random.randint(
            key, (b, args.source_size, args.source_size, 3), 0, 255, jnp.uint8
        ))
        t = _bench(image_fwd, params, frames, args.iterations)
        print(f"{b:>6} {t * 1e3:>10.2f} {b / t:>14.0f}")

    @jax.jit
    def text_fwd(p, toks):
        return encode_text(p, cfg, toks, dtype)

    toks = jax.random.randint(
        key, (args.text_batch, cfg.context_length), 1, cfg.vocab_size - 2,
        jnp.int32,
    )
    toks = toks.at[:, 0].set(cfg.vocab_size - 2).at[:, -1].set(cfg.vocab_size - 1)
    toks = place_batch(toks)
    t = _bench(text_fwd, params, toks, args.iterations)
    print(f"text  batch={args.text_batch}: {t * 1e3:.2f} ms/batch "
          f"({args.text_batch / t:.0f} seqs/s/chip)")


if __name__ == "__main__":
    main()
