"""A/B the attention-kernel variants + block fusion on the real TPU.

Usage: python benchmarks/kernel_ab.py {rows|packed|unrolled|block|text-qkv|text-block} [batch]
rows/packed/unrolled select CLIP_PPO_ATTN_PAIR_VARIANT for the fused-qkv
kernel ("auto" encode path); "block" routes encode_image through the
pallas_block resblock fusion instead (attention_impl="block");
text-qkv/text-block time encode_text on [B,77] tokens with the fused-qkv
("auto") vs block-fusion causal path.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

variant = sys.argv[1] if len(sys.argv) > 1 else "rows"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

if variant.startswith("text-"):
    from clip_ppo_tpu.models.clip import CLIPConfig
    from clip_ppo_tpu.models.clip.model import init_clip_params, encode_text
    impl = "block" if variant == "text-block" else "auto"
    cfg = CLIPConfig(embed_dim=512)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, 77), 0, cfg.vocab_size)
    toks = toks.at[:, -1].set(cfg.vocab_size - 1)  # argmax EOT at the end
    N = 16

    @jax.jit
    def encN(params, toks):
        # batch-roll the tokens by a data-dependent offset each
        # iteration: encoding loop-INVARIANT inputs lets XLA CSE the N
        # encodes into one and reads ~N x too fast (see the r3 fix in
        # benchmarks/kernel_sweep.py).
        def body(c, _):
            e = encode_text(params, cfg, jnp.roll(toks, c, axis=0),
                            compute_dtype=jnp.bfloat16,
                            attention_impl=impl)
            return c + 1 + (jnp.abs(e[0, 0]) * 1e-12).astype(jnp.int32), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=N)
        return jnp.zeros((B, cfg.embed_dim), jnp.float32) + c

    @jax.jit
    def null(toks):
        return jnp.sum(toks[0])

    _ = float(jnp.sum(encN(params, toks)[0]))
    _ = float(null(toks))
    t0 = time.perf_counter(); _ = float(null(toks)); rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(jnp.sum(encN(params, toks)[0]))
    dt = time.perf_counter() - t0
    per = (dt - rtt) / N
    print(f"{variant}: text batch-{B} encode {per*1e3:.2f} ms "
          f"({B/per:,.0f} seqs/s; rtt {rtt*1e3:.1f} ms)")
    sys.exit(0)
if variant != "block":
    os.environ["CLIP_PPO_ATTN_PAIR_VARIANT"] = variant
import clip_ppo_tpu.models.clip.pallas_attention as pa
impl = "block" if variant == "block" else "auto"

if variant == "stack":
    # resblock stack alone on a pre-embedded [B, T, D] batch — the
    # difference vs the full encode is the stem (patch embed + pos +
    # ln_pre) + head (ln_post + proj) cost.
    from clip_ppo_tpu.models.clip.config import CLIP_CONFIGS
    from clip_ppo_tpu.models.clip.model import init_clip_params, resblock
    model_name = os.environ.get("CLIP_PPO_KBENCH_MODEL", "ViT-B/32")
    cfg = CLIP_CONFIGS[model_name]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    blocks = params["visual"]["transformer"]["resblocks"]
    tt = cfg.num_patches + 1
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, tt, cfg.vision_width),
                           jnp.bfloat16)
    N = 8

    @jax.jit
    def stackN(blocks, x0):
        x = x0
        for _ in range(N):
            for blk in blocks:
                x = resblock(blk, x, cfg.vision_heads, None, impl="block")
            x = x0 + x.sum() * 1e-9
        return x

    @jax.jit
    def null(x0):
        return jnp.sum(x0[0, 0])

    _ = float(jnp.sum(stackN(blocks, x0)[0, 0]))
    _ = float(null(x0))
    t0 = time.perf_counter(); _ = float(null(x0)); rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(jnp.sum(stackN(blocks, x0)[0, 0]))
    per = (time.perf_counter() - t0 - rtt) / N
    print(f"stack: {model_name} batch-{B} {cfg.vision_layers}-block stack "
          f"{per*1e3:.2f} ms (rtt {rtt*1e3:.1f} ms)")
    sys.exit(0)

T, D, H = 50, 768, 12
if variant != "block":
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, T, 3 * D), jnp.bfloat16)

    @jax.jit
    def stack12(qkv):
        # chain 12 kernel calls through a data dependency (tunnel-honest)
        x = qkv
        for _ in range(12):
            o = pa.fused_qkv_attention(x[:, :, :3 * D], H)
            x = jnp.concatenate([o, o, o], axis=-1) * 0.5 + qkv * 0.5
        return x

    r = stack12(qkv)
    _ = float(jnp.sum(r[0, 0]))  # sync
    t0 = time.perf_counter()
    r = stack12(qkv)
    _ = float(jnp.sum(r[0, 0]))
    dt = time.perf_counter() - t0
    print(f"{variant}: 12-layer attention stack {dt*1e3:.2f} ms  ({dt/12*1e3:.3f} ms/layer)")

# full encode (CLIP_PPO_KBENCH_MODEL=ViT-L/14 switches the tower)
from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.config import CLIP_CONFIGS
from clip_ppo_tpu.models.clip.model import init_clip_params, encode_image
model_name = os.environ.get("CLIP_PPO_KBENCH_MODEL", "ViT-B/32")
cfg = CLIP_CONFIGS[model_name]
params = init_clip_params(jax.random.PRNGKey(0), cfg)
imgs = jax.random.uniform(jax.random.PRNGKey(1),
                          (B, cfg.image_size, cfg.image_size, 3), jnp.float32)

N = 8

@jax.jit
def encN(params, imgs):
    x = imgs
    for _ in range(N):
        e = encode_image(params, cfg, x, compute_dtype=jnp.bfloat16,
                         attention_impl=impl)
        x = imgs + e.sum() * 1e-9
    return x

@jax.jit
def null(imgs):
    return jnp.sum(imgs[0, 0])

_ = float(jnp.sum(encN(params, imgs)[0]))
_ = float(null(imgs))
t0 = time.perf_counter(); _ = float(null(imgs)); rtt = time.perf_counter() - t0
t0 = time.perf_counter()
_ = float(jnp.sum(encN(params, imgs)[0]))
dt = time.perf_counter() - t0
per = (dt - rtt) / N
print(f"{variant}: {model_name} batch-{B} encode {per*1e3:.2f} ms ({B/per:,.0f} frames/s; rtt {rtt*1e3:.1f} ms)")
