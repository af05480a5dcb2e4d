"""A/B the weight-streaming ViT-L/14 ATTENTION block on the real TPU.

VERDICT r4 item 6: at L/14 widths the resident-weight block kernel LOST
to fused-qkv (323.8 vs 300.3 ms full encode, r4 A/B) — the 8 MB qkv+out
weights squeezed the activation blocks. The r5 streaming kernel keeps
wqkv in HBM ([D, ck] tiles double-buffered behind the qkv matmul, the
r4 MLP-streaming recipe) and fuses LN1 + qkv + attention + out-proj +
residual into one pass.

Times the attention half in isolation (24-layer stack over a
pre-embedded [B, 257, 1024] batch, heads=16 — the exact ViT-L/14
shape), then the FULL encode via encode_image:

  A: xla attention half (LN -> qkv matmul -> fused_qkv_attention
     kernel -> out-proj -> residual)     — the r4 default at L/14
  B: weight-streaming attention block    — the candidate

Usage: python benchmarks/attn_stream_ab.py [batch] [bb]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BB = int(sys.argv[2]) if len(sys.argv) > 2 else None
T, D, HEADS, LAYERS = 257, 1024, 16, 24

from clip_ppo_tpu.models.clip import pallas_block as pb
from clip_ppo_tpu.models.clip.pallas_attention import fused_qkv_attention

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
x0 = jax.random.normal(ks[0], (B, T, D), jnp.bfloat16)
wqkv = jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02
bqkv = jax.random.normal(ks[2], (1, 3 * D), jnp.bfloat16) * 0.02
wout = jax.random.normal(ks[3], (D, D), jnp.bfloat16) * 0.02
bout = jax.random.normal(ks[4], (1, D), jnp.bfloat16) * 0.02
g = jnp.ones((1, D), jnp.bfloat16)
b = jnp.zeros((1, D), jnp.bfloat16)
N = 4


def xla_half(x, wqkv, bqkv, wout, bout):
    y = pb._ln_ref(x, g[0], b[0], 1e-5)
    qkv = (y.reshape(-1, D) @ wqkv + bqkv.astype(y.dtype)).reshape(
        x.shape[0], T, 3 * D)
    attn = fused_qkv_attention(qkv, HEADS, causal=False)
    return x + (attn.reshape(-1, D) @ wout
                + bout.astype(x.dtype)).reshape(x.shape)


def stream_half(x, wqkv, bqkv, wout, bout):
    return pb._attn_stream_fwd_impl(
        x, wqkv, bqkv, wout, bout, g, b, HEADS, False, 1e-5, BB, False)


def bench(tag, fn):
    @jax.jit
    def stackN(x0, *w):
        def body(x, _):
            for _l in range(LAYERS):
                x = fn(x, *w)
            x = (x / (1.0 + jnp.abs(x).max() * 1e-9)).astype(x0.dtype)
            return x, ()
        x, _ = jax.lax.scan(body, x0, None, length=N)
        return x[0, 0, 0]

    @jax.jit
    def null(x0):
        return x0[0, 0, 0]

    try:
        _ = float(stackN(x0, wqkv, bqkv, wout, bout))
    except Exception as e:  # noqa: BLE001 — report compile failures per-arm
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    _ = float(null(x0))
    t0 = time.perf_counter()
    _ = float(null(x0))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(stackN(x0, wqkv, bqkv, wout, bout))
    per = (time.perf_counter() - t0 - rtt) / N
    print(f"{tag}: batch-{B} {LAYERS}-layer attn stack {per * 1e3:.1f} ms "
          f"(rtt {rtt * 1e3:.1f} ms)", flush=True)
    return per


a = bench("A xla+fused-qkv", xla_half)
bt = bench("B attn-stream  ", stream_half)
if a and bt:
    print(f"B vs A (attn half): {a / bt:.3f}x", flush=True)

# ---- full encode A/B (the docs/PERFORMANCE.md 293.5 ms metric) -------------
#
# Unscanned single-encode with median-of-9 minus measured null-fetch RTT:
# wrapping the 48-Pallas-kernel stream+stream encode in a lax.scan makes
# the tunnel's tpu_compile_helper subprocess die (exit 1 — observed r5);
# the unscanned program compiles (~6 min cold). Each arm still runs in
# THIS one process; run arms in separate processes if the helper dies
# across arms (also observed — its state accumulates per process).
import os

import numpy as np

from clip_ppo_tpu.models.clip import CLIP_CONFIGS
from clip_ppo_tpu.models.clip.model import encode_image, init_clip_params

cfg = CLIP_CONFIGS["ViT-L/14"]
params = init_clip_params(jax.random.PRNGKey(1), cfg)
imgs = jax.random.normal(ks[5], (B, 224, 224, 3), jnp.float32)


def bench_encode(tag):
    @jax.jit
    def enc(params, imgs):
        return encode_image(params, cfg, imgs, jnp.bfloat16)[0, 0]

    @jax.jit
    def null(imgs):
        return imgs[0, 0, 0, 0]

    try:
        _ = float(enc(params, imgs))
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    _ = float(null(imgs))
    rtts, ts = [], []
    for _i in range(9):
        t0 = time.perf_counter()
        _ = float(null(imgs))
        rtts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = float(enc(params, imgs))
        ts.append(time.perf_counter() - t0)
    per = np.median(ts) - np.median(rtts)
    print(f"{tag}: batch-{B} full L/14 encode {per * 1e3:.1f} ms "
          f"(rtt {np.median(rtts) * 1e3:.1f})", flush=True)
    return per


os.environ["CLIP_PPO_ATTN_STREAM"] = "0"
e_a = bench_encode("A encode attn=fused-qkv ")
os.environ["CLIP_PPO_ATTN_STREAM"] = "1"
e_b = bench_encode("B encode attn=stream    ")
if e_a and e_b:
    print(f"B vs A (full encode): {e_a / e_b:.3f}x", flush=True)
