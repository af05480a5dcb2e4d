"""A/B the weight-streaming ViT-L/14 MLP pass on the real TPU.

VERDICT r3 item 7: the d4-chunked kernel was HBM-bound at its
VMEM-forced block_batches=1 (re-streams the full 33.6 MB of MLP weights
per batch element); the r4 streaming kernel double-buffers [D, ck] /
[ck, D] weight-tile DMAs behind the matmuls, freeing the activation
block from the weight footprint.

Times the MLP half of the resblock in isolation (a 24-layer stack over
a pre-embedded [B, 257, 1024] batch — the exact ViT-L/14 shape), so the
attention implementation is out of the picture:

  A: XLA formulation (_mlp_block_ref)       — the r3 default at L/14
  B: weight-streaming kernel                — the candidate
  C: d4-chunked grid kernel                 — r3's HBM-bound variant

Usage: python benchmarks/mlp_stream_ab.py [batch] [bb]
(bb overrides the streaming kernel's block_batches for sweeps)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BB = int(sys.argv[2]) if len(sys.argv) > 2 else None
T, D, D4, LAYERS = 257, 1024, 4096, 24

from clip_ppo_tpu.models.clip import pallas_block as pb

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
x0 = jax.random.normal(ks[0], (B, T, D), jnp.bfloat16)
wfc = (jax.random.normal(ks[1], (D, D4), jnp.bfloat16) * 0.02)
bfc = jax.random.normal(ks[2], (1, D4), jnp.bfloat16) * 0.02
wpj = (jax.random.normal(ks[3], (D4, D), jnp.bfloat16) * 0.02)
bpj = jax.random.normal(ks[4], (1, D), jnp.bfloat16) * 0.02
g = jnp.ones((1, D), jnp.bfloat16)
b = jnp.zeros((1, D), jnp.bfloat16)
N = 4


def bench(tag, fn):
    @jax.jit
    def stackN(x0, wfc, bfc, wpj, bpj):
        def body(x, _):
            for _l in range(LAYERS):
                x = fn(x, wfc, bfc, wpj, bpj)
            # renormalize so the chain neither explodes nor lets XLA
            # hoist anything (data dependence between iterations)
            x = (x / (1.0 + jnp.abs(x).max() * 1e-9)).astype(x0.dtype)
            return x, ()
        x, _ = jax.lax.scan(body, x0, None, length=N)
        return x[0, 0, 0]

    @jax.jit
    def null(x0):
        return x0[0, 0, 0]

    try:
        _ = float(stackN(x0, wfc, bfc, wpj, bpj))
    except Exception as e:  # noqa: BLE001 — report compile failures per-arm
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    _ = float(null(x0))
    t0 = time.perf_counter()
    _ = float(null(x0))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(stackN(x0, wfc, bfc, wpj, bpj))
    per = (time.perf_counter() - t0 - rtt) / N
    print(f"{tag}: batch-{B} {LAYERS}-layer MLP stack {per * 1e3:.1f} ms "
          f"(rtt {rtt * 1e3:.1f} ms)", flush=True)
    return per


a = bench("A xla-ref    ",
          lambda x, *w: pb._mlp_block_ref(x, *w, g, b, 1e-5))
bt = bench("B stream     ",
           lambda x, *w: pb._mlp_stream_fwd_impl(x, *w, g, b, 1e-5, BB,
                                                 False))
c = bench("C d4-chunked ",
          lambda x, *w: pb._mlp_chunked_fwd_impl(x, *w, g, b, 1e-5, None,
                                                 False))
if a and bt:
    print(f"B vs A: {a / bt:.3f}x", flush=True)
if c and bt:
    print(f"B vs C: {c / bt:.3f}x", flush=True)
