"""Pure-JAX CLIP: ViT image encoder + causal transformer text encoder.

TPU-native replacement for the dependency-provided CLIP the reference
calls into (`clip_ppo_utils.py:90,138,163,211-215`): pre-LN transformer
blocks with QuickGELU, class token + learned positional embeddings, and
the final projection, expressed as pure functions over a params pytree so
the encoder fuses into the jitted training graph (the per-iteration
1024-frame batch encode is the dominant CLIP cost — SURVEY §3 hot loop c).

Layout/throughput notes:
* images flow NHWC; the patch embed is an MXU-friendly reshape+matmul
  (a stride=patch VALID conv is exactly a per-patch matmul — XLA maps
  either onto the MXU, the matmul form avoids any im2col ambiguity);
* ``compute_dtype=bfloat16`` runs every matmul on the MXU at full rate
  with fp32 LayerNorm statistics and fp32 output, which keeps embeddings
  within fp32-vs-fp16 tolerance of the reference (which runs fp16);
* attention over 50/77 tokens: on TPU at real batch sizes the unmasked
  (vision) path uses the fused-qkv Pallas kernel — profiling showed the
  einsum path is bound by HBM head-split relayout, not the MXU (see
  pallas_attention.py); the masked text path and small batches keep the
  batched einsum MHA.

Weight-key layout mirrors OpenAI's module names (visual.transformer.
resblocks.N..., transformer.resblocks.N..., see loader.py for the
HF-checkpoint converter).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.models.clip.config import CLIPConfig


def quick_gelu(x: jax.Array) -> jax.Array:
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with fp32 statistics regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _split_heads(x: jax.Array, heads: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads)


def _use_packed_attention(impl: str, mask) -> bool:
    # "auto" keeps the XLA path: the packed Pallas kernel measured only
    # ~5% faster on v5e (see pallas_attention.py) and is forward-only,
    # so it stays opt-in via attention_impl="pallas".
    return impl == "pallas" and mask is None


def _batch_pack_factor(impl: str, mask, seq: int) -> int:
    """Batch-packing group size for the einsum path (``impl="packedN"``).

    Packs G batch elements into one block-masked sequence of length G·S
    to amortize MXU tile passes on the tiny [S,S] score matmuls.
    Measured on v5e this LOSES (145 → 149/177 ms at G=2/4, batch-1024
    ViT-B/32 encode): the stage is HBM-layout-bound, not tile-bound, and
    packing grows the logits tensor G×. Kept as an explicit option for
    other hardware; "auto" never packs — it uses the fused-qkv Pallas
    kernel on TPU instead (see :func:`_use_fused_qkv`).
    """
    if mask is not None:
        return 1
    if impl.startswith("packed"):
        return int(impl[len("packed"):] or 2)
    return 1


def _use_fused_qkv(impl: str, mask, batch: int) -> bool:
    """The fused-qkv Pallas kernel (pallas_attention.fused_qkv_attention)
    is the TPU default for unmasked (vision) and causal (text) attention
    at real batch sizes: the XLA path spends ~4.5 ms/layer (ViT-B/32, batch 1024, v5e)
    relaying q/k/v into padded [B,S,H,64] HBM buffers; the kernel
    head-splits inside VMEM. Tiny batches (< 64 — e.g. the per-step
    FROZEN_CLIP encode inside the rollout scan) keep the einsum path
    under "auto": no win there, and the Mosaic compile is expensive.
    Differentiable via the einsum-recompute custom VJP
    (pallas_attention.py); impl="xla" forces the pure einsum path,
    impl="fused" forces the kernel at any batch size."""
    if mask is not None and not isinstance(mask, str):
        return False  # arbitrary mask arrays keep the einsum path
    if impl == "fused":
        return True
    return (
        impl == "auto" and batch >= 64 and jax.default_backend() == "tpu"
    )


def _packed_sdpa(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float, g: int
) -> jax.Array:
    """Scaled-dot-product attention with G batch elements packed per
    block-masked sequence. Exact (not an approximation): softmax rows are
    masked outside the diagonal blocks, so each sequence attends only to
    itself."""
    b, s, h, c = q.shape
    pad = (-b) % g
    if pad:
        zeros = jnp.zeros((pad, s, h, c), q.dtype)
        q = jnp.concatenate([q, zeros])
        k = jnp.concatenate([k, zeros])
        v = jnp.concatenate([v, zeros])
    bb = q.shape[0] // g
    qp = q.reshape(bb, g * s, h, c)
    kp = k.reshape(bb, g * s, h, c)
    vp = v.reshape(bb, g * s, h, c)
    logits = jnp.einsum("bqhc,bkhc->bhqk", qp * scale, kp)
    block = jnp.arange(g * s) // s
    block_mask = jnp.where(
        block[:, None] == block[None, :], 0.0, -jnp.inf
    ).astype(jnp.float32)
    weights = jax.nn.softmax(
        logits.astype(jnp.float32) + block_mask, axis=-1
    ).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhc->bqhc", weights, vp)
    out = out.reshape(bb * g, s, h, c)
    return out[:b] if pad else out


def attention(
    p: dict, x: jax.Array, heads: int, mask: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Multi-head self-attention (fused qkv projection).

    ``impl``: "auto" = fused-qkv Pallas kernel on TPU for unmasked
    attention at batch ≥ 64, einsum otherwise; "xla" = always einsum
    (differentiable); "fused" = force the kernel; "packedN" = einsum
    with N-way batch packing; "pallas" = the legacy (b,h)-pair kernel.
    """
    d = x.shape[-1]
    qkv = x @ p["in_proj_w"].astype(x.dtype).T + p["in_proj_b"].astype(x.dtype)
    if _use_fused_qkv(impl, mask, x.shape[0]):
        from clip_ppo_tpu.models.clip.pallas_attention import (
            fused_qkv_attention,
        )

        out = fused_qkv_attention(qkv, heads, causal=(mask == "causal"))
        return out @ p["out_proj_w"].astype(x.dtype).T + p["out_proj_b"].astype(x.dtype)
    if isinstance(mask, str):  # "causal" sentinel → concrete mask array
        assert mask == "causal", mask
        mask = causal_mask(x.shape[1]).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, heads)
    k = _split_heads(k, heads)
    v = _split_heads(v, heads)
    scale = 1.0 / np.sqrt(d // heads)
    pack = _batch_pack_factor(impl, mask, x.shape[1])
    if _use_packed_attention(impl, mask):
        from clip_ppo_tpu.models.clip.pallas_attention import packed_attention

        out = packed_attention(q, k, v)
    elif pack > 1 and x.shape[0] > 1:
        out = _packed_sdpa(q, k, v, scale, pack)
    else:
        logits = jnp.einsum("bqhc,bkhc->bhqk", q * scale, k)
        if mask is not None:
            logits = logits + mask.astype(logits.dtype)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhc->bqhc", weights, v)
    out = out.reshape(x.shape)
    return out @ p["out_proj_w"].astype(x.dtype).T + p["out_proj_b"].astype(x.dtype)


def _use_fused_block(impl: str, mask, batch: int, width: int) -> bool:
    """Block-fusion kernels (pallas_block.py): the whole pre-LN resblock
    as two Pallas passes, so the [B,T,3D] qkv and [B,T,4D] MLP hidden
    intermediates (and the LN outputs) never round-trip HBM.

    TPU default for BOTH unmasked (vision) and causal (text) attention at
    batch ≥ 64 when the MLP weights fit the VMEM budget (ViT-B widths):
    measured 65.4 ms vs the fused-qkv kernel's 77.2 ms for the
    batch-1024 ViT-B/32 encode, and 46.7 vs 52.7 ms (1.13×) for the
    batch-1024 causal text encode, on v5e same tunnel phase
    (docs/PERFORMANCE.md). ``attention_impl="block"`` forces it at any
    batch size/width. Differentiable (einsum-recompute custom VJPs,
    pinned against XLA grads in tests/test_pallas_block.py)."""
    if mask is not None and not isinstance(mask, str):
        return False
    if impl == "block":
        return True  # explicit opt-in is honored at any batch size
    # "auto" takes the block path only where its MLP pass is actually the
    # fused kernel. At ViT-L/14-class widths fused_mlp_block falls back
    # to the XLA formulation (weights exceed the VMEM budget,
    # pallas_block.py), so "block" there is just a slower attention pass:
    # same-process v5e A/B at batch 256 measured block+xla-mlp 323.8 ms
    # vs fused-qkv 300.3 ms — so auto routes those widths to fused-qkv.
    mlp_fits_vmem = 2 * width * 4 * width * 2 <= (12 << 20)  # bf16 bytes
    return (
        impl == "auto" and batch >= 64 and mlp_fits_vmem
        and jax.default_backend() == "tpu"
    )


def _use_stream_mlp(impl: str, mask, batch: int, width: int) -> bool:
    """ViT-L/14-class widths keep the fused-qkv attention path ("auto" —
    see `_use_fused_block`), but their MLP half routes to the r4
    weight-streaming kernel (pallas_block: manual double-buffered
    weight-tile DMAs, 1.171× the XLA formulation on the isolated
    batch-256 L/14 MLP stack — benchmarks/mlp_stream_ab.py). TPU-only,
    batch ≥ 64; CLIP_PPO_MLP_STREAM=0 restores the inline XLA MLP."""
    if mask is not None and not isinstance(mask, str):
        return False
    mlp_fits_vmem = 2 * width * 4 * width * 2 <= (12 << 20)
    return (
        impl == "auto" and batch >= 64 and not mlp_fits_vmem
        and jax.default_backend() == "tpu"
        and os.environ.get("CLIP_PPO_MLP_STREAM", "1") == "1"
    )


def _use_stream_attn(impl: str, mask, batch: int, width: int) -> bool:
    """r5: at the same over-VMEM widths, the attention half can run the
    weight-streaming block kernel (pallas_block.fused_attn_block_stream:
    qkv weights in HBM, [D, ck] tiles double-buffered; LN1/qkv/attention
    intermediates never touch HBM). OPT-IN via CLIP_PPO_ATTN_STREAM=1:
    measured r5 on v5e at batch 256, the kernel is 1.80× the
    fused-qkv arm on the ISOLATED 24-layer attention stack (224.3 →
    124.8 ms) but a WASH on the full L/14 encode (296.7 vs 296.3 ms,
    same unscanned median-minus-RTT methodology) — in context XLA
    cross-layer fusion already runs the attention side at ~5.2 ms/layer,
    so the LN/projection round trips the kernel removes are not the
    in-context bound; and the 48-Pallas-kernel program costs ~6-minute
    Mosaic compiles (a lax.scan wrapper crashes the tunnel's
    compile helper outright). docs/PERFORMANCE.md has the full table."""
    if mask is not None and not isinstance(mask, str):
        return False
    mlp_fits_vmem = 2 * width * 4 * width * 2 <= (12 << 20)
    return (
        impl == "auto" and batch >= 64 and not mlp_fits_vmem
        and jax.default_backend() == "tpu"
        and os.environ.get("CLIP_PPO_ATTN_STREAM", "0") == "1"
    )


def resblock(
    p: dict, x: jax.Array, heads: int, mask: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Pre-LN transformer block with QuickGELU MLP (width → 4·width)."""
    if _use_fused_block(impl, mask, x.shape[0], x.shape[-1]):
        from clip_ppo_tpu.models.clip.pallas_block import (
            fused_attn_block,
            fused_mlp_block,
        )

        x = fused_attn_block(x, p["ln_1"], p["attn"], heads,
                             causal=(mask == "causal"))
        return fused_mlp_block(x, p["ln_2"], p["mlp"])
    if _use_stream_attn(impl, mask, x.shape[0], x.shape[-1]):
        from clip_ppo_tpu.models.clip.pallas_block import (
            fused_attn_block_stream,
        )

        x = fused_attn_block_stream(x, p["ln_1"], p["attn"], heads,
                                    causal=(mask == "causal"))
    else:
        x = x + attention(p["attn"], layer_norm(p["ln_1"], x), heads,
                          mask, impl)
    if _use_stream_mlp(impl, mask, x.shape[0], x.shape[-1]):
        from clip_ppo_tpu.models.clip.pallas_block import fused_mlp_block

        return fused_mlp_block(x, p["ln_2"], p["mlp"])
    h = layer_norm(p["ln_2"], x)
    h = h @ p["mlp"]["fc_w"].astype(x.dtype).T + p["mlp"]["fc_b"].astype(x.dtype)
    h = quick_gelu(h)
    h = h @ p["mlp"]["proj_w"].astype(x.dtype).T + p["mlp"]["proj_b"].astype(x.dtype)
    return x + h


def transformer(
    p: dict, x: jax.Array, heads: int, mask: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    for block in p["resblocks"]:
        x = resblock(block, x, heads, mask, impl)
    return x


def encode_image(
    params: dict,
    cfg: CLIPConfig,
    images: jax.Array,
    compute_dtype=jnp.float32,
    attention_impl: str = "auto",
) -> jax.Array:
    """[B, 224, 224, 3] normalized images (NHWC) → [B, embed_dim] features.

    Equivalent to OpenAI ``model.encode_image`` / HF ``get_image_features``
    up to dtype; feed with `ops.resize.preprocess_for_clip`.
    """
    v = params["visual"]
    b = images.shape[0]
    ps, g = cfg.patch_size, cfg.grid_size
    x = images.astype(compute_dtype)
    # Patch embed as a single matmul: [B, g, ps, g, ps, 3] → [B, g*g, ps*ps*3].
    x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, g * g, ps * ps * 3)
    x = x @ v["patch_embed_w"].astype(compute_dtype)  # [B, P, width], no bias

    cls = v["class_embedding"].astype(compute_dtype)
    cls = jnp.broadcast_to(cls, (b, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(compute_dtype)
    x = layer_norm(v["ln_pre"], x)
    x = transformer(v["transformer"], x, cfg.vision_heads, impl=attention_impl)
    x = layer_norm(v["ln_post"], x[:, 0, :])
    out = x @ v["proj"].astype(compute_dtype)
    return out.astype(jnp.float32)


def causal_mask(t: int) -> jax.Array:
    mask = jnp.full((t, t), -jnp.inf)
    return jnp.triu(mask, k=1)


def encode_text(
    params: dict,
    cfg: CLIPConfig,
    tokens: jax.Array,
    compute_dtype=jnp.float32,
    attention_impl: str = "auto",
) -> jax.Array:
    """[B, 77] int32 token ids → [B, embed_dim] features.

    Pooled at each sequence's argmax token id (the EOT token, which has
    the highest id) exactly as OpenAI CLIP does.
    """
    t = params["text"]
    x = t["token_embedding"][tokens].astype(compute_dtype)
    x = x + t["positional_embedding"][: tokens.shape[1]].astype(compute_dtype)
    # "causal" sentinel: the fused kernel applies the mask in-VMEM on
    # TPU; the einsum path materializes the concrete array
    x = transformer(t["transformer"], x, cfg.text_heads, "causal",
                    impl=attention_impl)
    x = layer_norm(t["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    out = pooled @ t["text_projection"].astype(compute_dtype)
    return out.astype(jnp.float32)


def normalize(x: jax.Array) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


# ---------------------------------------------------------------------------
# Random initialization (OpenAI's init scheme; used for tests and the
# RANDOM_ENCODER-style ablations — real weights come from loader.py)
# ---------------------------------------------------------------------------


def _init_block(key, width: int) -> dict:
    ks = jax.random.split(key, 6)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    proj_std = attn_std  # per-block scaling is applied by the caller if needed
    return {
        "ln_1": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "ln_2": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "attn": {
            "in_proj_w": attn_std * jax.random.normal(ks[0], (3 * width, width)),
            "in_proj_b": jnp.zeros(3 * width),
            "out_proj_w": proj_std * jax.random.normal(ks[1], (width, width)),
            "out_proj_b": jnp.zeros(width),
        },
        "mlp": {
            "fc_w": fc_std * jax.random.normal(ks[2], (4 * width, width)),
            "fc_b": jnp.zeros(4 * width),
            "proj_w": proj_std * jax.random.normal(ks[3], (width, 4 * width)),
            "proj_b": jnp.zeros(width),
        },
    }


def init_clip_params(key: jax.Array, cfg: CLIPConfig) -> dict:
    kv, kt = jax.random.split(key)
    kvs = jax.random.split(kv, cfg.vision_layers + 4)
    kts = jax.random.split(kt, cfg.text_layers + 4)
    vw, tw = cfg.vision_width, cfg.text_width
    visual = {
        "patch_embed_w": (vw ** -0.5)
        * jax.random.normal(kvs[0], (cfg.patch_size * cfg.patch_size * 3, vw)),
        "class_embedding": (vw ** -0.5) * jax.random.normal(kvs[1], (vw,)),
        "positional_embedding": (vw ** -0.5)
        * jax.random.normal(kvs[2], (cfg.num_patches + 1, vw)),
        "ln_pre": {"scale": jnp.ones(vw), "bias": jnp.zeros(vw)},
        "transformer": {
            "resblocks": [
                _init_block(kvs[3 + i], vw) for i in range(cfg.vision_layers)
            ]
        },
        "ln_post": {"scale": jnp.ones(vw), "bias": jnp.zeros(vw)},
        "proj": (vw ** -0.5) * jax.random.normal(kvs[3 + cfg.vision_layers], (vw, cfg.embed_dim)),
    }
    text = {
        "token_embedding": 0.02 * jax.random.normal(kts[0], (cfg.vocab_size, tw)),
        "positional_embedding": 0.01
        * jax.random.normal(kts[1], (cfg.context_length, tw)),
        "transformer": {
            "resblocks": [
                _init_block(kts[2 + i], tw) for i in range(cfg.text_layers)
            ]
        },
        "ln_final": {"scale": jnp.ones(tw), "bias": jnp.zeros(tw)},
        "text_projection": (tw ** -0.5)
        * jax.random.normal(kts[2 + cfg.text_layers], (tw, cfg.embed_dim)),
    }
    return {"visual": visual, "text": text}
