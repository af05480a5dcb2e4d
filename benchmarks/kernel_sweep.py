"""One-process TPU kernel measurement battery (single tunnel client).

Runs every pending kernel A/B sequentially inside ONE process so the
tunneled device sees a single client (rapid client churn wedges it —
CLAUDE.md). Timing is tunnel-honest: N iterations chained through a data
dependency, one dependent scalar fetched, null-program round trip
subtracted.

Usage: python benchmarks/kernel_sweep.py [section ...]
sections: b32 text l14 stack   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, ".")  # run from the repo root (CLAUDE.md)

import jax
import jax.numpy as jnp

sections = set(sys.argv[1:]) or {"b32", "text", "l14", "stack"}

from clip_ppo_tpu.models.clip.config import CLIP_CONFIGS
from clip_ppo_tpu.models.clip.model import (
    encode_image,
    encode_text,
    init_clip_params,
    resblock,
)

RESULTS = []


def timed(label, fn, *args, n=8):
    """Chained-iteration timing: fn folds its output back into its input
    so iteration k depends on k-1; one dependent scalar is fetched and a
    null-program round trip is subtracted. Returns per-iteration secs.

    A config that fails to compile (e.g. a block-batch size whose VMEM
    working set exceeds the 16 MB scoped limit — observed for bb=32 at
    B=1024) is recorded as OOM/compile-error and the sweep continues."""
    try:
        return _timed(label, fn, *args, n=n)
    except jax.errors.JaxRuntimeError as e:
        lines = str(e).strip().splitlines()
        msg = next(
            (l for l in lines if "exceed" in l.lower()
             or "out of memory" in l.lower() or "scoped" in l.lower()),
            lines[0] if lines else "?",
        )
        if "Scoped allocation" in msg:  # keep just the sizing clause
            msg = "Scoped allocation" + msg.split("Scoped allocation", 1)[1]
        print(f"{label}: COMPILE-FAIL ({msg[:300]})", flush=True)
        RESULTS.append((label, float("nan")))
        return None


def _timed(label, fn, *args, n=8):
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(out.ravel()[0])          # sync after compile/warmup
    null = jax.jit(lambda x: x.ravel()[0])
    _ = float(null(args[-1]))
    t0 = time.perf_counter()
    _ = float(null(args[-1]))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jfn(*args)
    _ = float(out.ravel()[0])
    per = (time.perf_counter() - t0 - rtt) / n
    print(f"{label}: {per * 1e3:.2f} ms/iter (rtt {rtt * 1e3:.0f} ms)",
          flush=True)
    RESULTS.append((label, per * 1e3))
    return per


def enc_image_loop(cfg, params, imgs, impl, n):
    # lax.scan (not a Python unroll): the [B,224,224,3] f32 carry is
    # reused in place, so n iterations hold ONE image buffer instead of n
    # (an unrolled version allocated >HBM at B=1024). The carry must be a
    # SCALAR, not the image tensor: a [B,224,224,3] f32 carry forces an
    # XLA relayout copy whose T(8,128) tiling pads the size-3 minor dim
    # to 128 — a 26.3 GB allocation at B=1024 (observed OOM on the 16 GB
    # v5e). Chaining via `imgs * (1 + c·1e-12)` keeps the data dependency
    # with one image buffer and a fused broadcast multiply.
    def fn(params, imgs):
        def body(c, _):
            e = encode_image(params, cfg, imgs * (1.0 + c * 1e-12),
                             compute_dtype=jnp.bfloat16,
                             attention_impl=impl)
            return e.ravel()[0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c
    return fn


def enc_text_loop(cfg, params, toks, impl, n):
    # Chain iterations by batch-rolling the token matrix one row per
    # step: same total work, but the encoder input genuinely differs
    # every iteration. The previous Python unroll re-encoded CONSTANT
    # inputs — XLA CSE'd the n identical encodes into one, reporting
    # per-iteration times ~n× too fast (the "3.30 ms" text encode in
    # the r3 sweep log; a [1024,77] 12-layer encode is ≥30 ms at the
    # chip's FLOP peak). The carry folds a truncated-to-zero function
    # of the output back into the roll offset so the chain is a real
    # data dependency.
    def fn(params, toks):
        def body(c, _):
            t = jnp.roll(toks, c, axis=0)
            e = encode_text(params, cfg, t, compute_dtype=jnp.bfloat16,
                            attention_impl=impl)
            dep = (jnp.abs(e.ravel()[0]) * 1e-12).astype(jnp.int32)
            return c + 1 + dep, ()
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
        return c
    return fn


B = int(os.environ.get("KB_BATCH", "1024"))
N = int(os.environ.get("KB_N", "8"))

if "b32" in sections:
    cfg = CLIP_CONFIGS["ViT-B/32"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, 224, 224, 3),
                              jnp.float32)
    # block kernels (the "auto" TPU default after the r3 flip) vs the
    # r2 fused-qkv kernel ("fused" forces it) — same-process A/B
    for impl in ("block", "fused"):
        timed(f"b32 encode {impl} bb=auto",
              enc_image_loop(cfg, params, imgs, impl, N),
              params, imgs, n=N)
    # block-batch sweep (kernel grid block sizes)
    for bb, mbb in ((8, 6), (16, 12), (32, 24)):
        os.environ["CLIP_PPO_BLOCK_BATCHES"] = str(bb)
        os.environ["CLIP_PPO_MLP_BLOCK_BATCHES"] = str(mbb)
        timed(f"b32 encode block bb={bb}/mlp={mbb}",
              enc_image_loop(cfg, params, imgs, "block", N),
              params, imgs, n=N)
        os.environ.pop("CLIP_PPO_BLOCK_BATCHES")
        os.environ.pop("CLIP_PPO_MLP_BLOCK_BATCHES")

if "text" in sections:
    cfg = CLIP_CONFIGS["ViT-B/32"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, 77), 0,
                              cfg.vocab_size)
    toks = toks.at[:, -1].set(cfg.vocab_size - 1)
    NT = 2 * N
    # "block" vs the r2 fused-qkv kernel explicitly — after the r3
    # default flip "auto" IS the block path at batch >= 64, so an
    # auto-vs-block A/B times the same kernel twice.
    for impl in ("block", "fused"):
        timed(f"text encode {impl}",
              enc_text_loop(cfg, params, toks, impl, NT),
              params, toks, n=NT)

if "l14" in sections:
    cfg = CLIP_CONFIGS["ViT-L/14"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    BL = min(B, 256)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (BL, 224, 224, 3),
                              jnp.float32)
    NL = max(1, N // 2)
    # block path: XLA-MLP default vs the opt-in chunked MLP kernel
    timed(f"l14 encode block+xla-mlp b{BL}",
          enc_image_loop(cfg, params, imgs, "block", NL),
          params, imgs, n=NL)
    os.environ["CLIP_PPO_MLP_CHUNKED"] = "1"
    timed(f"l14 encode block+chunked-mlp b{BL}",
          enc_image_loop(cfg, params, imgs, "block", NL),
          params, imgs, n=NL)
    os.environ.pop("CLIP_PPO_MLP_CHUNKED")
    # the r2 fused-qkv attention kernel explicitly — "auto" IS the block
    # path at batch >= 64, so an auto entry would time block twice
    timed(f"l14 encode fused-qkv b{BL}",
          enc_image_loop(cfg, params, imgs, "fused", NL),
          params, imgs, n=NL)

if "stack" in sections:
    cfg = CLIP_CONFIGS["ViT-B/32"]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    blocks = params["visual"]["transformer"]["resblocks"]
    tt = cfg.num_patches + 1
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, tt, cfg.vision_width),
                           jnp.bfloat16)

    def stack_fn(blocks, x0):
        def body(x, _):
            for blk in blocks:
                x = resblock(blk, x, cfg.vision_heads, None, impl="block")
            return x0 + x.sum() * 1e-9, ()
        x, _ = jax.lax.scan(body, x0, None, length=N)
        return x

    timed(f"b32 12-block stack alone b{B}", stack_fn, blocks, x0, n=N)

print("\n=== summary ===")
for label, ms in RESULTS:
    print(f"{label:44s} {ms:8.2f} ms")
