"""A/B the weight-streaming ViT-L/14 MLP kernel on the real TPU.

VERDICT r3 item 7: the d4-chunked kernel was HBM-bound at its
VMEM-forced block_batches=1 (re-streams the full 33.6 MB of MLP weights
per batch element); the r4 streaming kernel double-buffers [D, ck] /
[ck, D] weight-tile DMAs behind the matmuls, freeing the activation
block from the weight footprint. Target (from the verdict): >=1.15x over
the 308 ms fused-qkv batch-256 ViT-L/14 encode, else a roofline note.

Times three same-process configurations of the full encode_image:
  A: attention auto (fused-qkv) + XLA MLP      — the r3 default
  B: attention block + streaming MLP           — the candidate
  C: attention block + XLA MLP                 — isolates the MLP delta

Usage: python benchmarks/mlp_stream_ab.py [batch] [model]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
MODEL = sys.argv[2] if len(sys.argv) > 2 else "ViT-L/14"

from clip_ppo_tpu.models.clip.config import CLIP_CONFIGS
from clip_ppo_tpu.models.clip.model import encode_image, init_clip_params

cfg = CLIP_CONFIGS[MODEL]
params = init_clip_params(jax.random.PRNGKey(0), cfg)
x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.image_size,
                                              cfg.image_size, 3),
                      jnp.float32)
N = 6


def bench(tag: str, impl: str, stream: bool) -> float:
    os.environ["CLIP_PPO_MLP_STREAM"] = "1" if stream else "0"

    @jax.jit
    def encN(params, x):
        def body(c, _):
            e = encode_image(params, cfg, x + c * 1e-9, jnp.bfloat16,
                             attention_impl=impl)
            return c + 1.0 + jnp.abs(e[0, 0]) * 1e-12, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return c

    @jax.jit
    def null(x):
        return jnp.sum(x[0, 0])

    _ = float(encN(params, x))          # compile + warmup
    _ = float(null(x))
    t0 = time.perf_counter()
    _ = float(null(x))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(encN(params, x))
    per = (time.perf_counter() - t0 - rtt) / N
    print(f"{tag}: {MODEL} batch-{B} encode {per * 1e3:.1f} ms "
          f"({B / per:,.0f} frames/s; rtt {rtt * 1e3:.1f} ms)", flush=True)
    return per


a = bench("A auto(fused-qkv)+xla-mlp", "auto", False)
b = bench("B block+stream-mlp       ", "block", True)
c = bench("C block+xla-mlp          ", "block", False)
print(f"B vs A: {a / b:.3f}x   B vs C (MLP delta): {c / b:.3f}x")
