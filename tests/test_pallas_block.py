"""Block-fusion Pallas kernels vs the XLA resblock path (interpret on CPU).

`pallas_block.fused_attn_block` / `fused_mlp_block` fuse each half of the
pre-LN resblock into one VMEM pass; these tests pin their math (and the
custom-VJP gradients) to the einsum/`layer_norm` reference in model.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.model import (
    attention,
    encode_image,
    encode_text,
    init_clip_params,
    layer_norm,
    resblock,
)
from clip_ppo_tpu.models.clip.pallas_block import (
    fused_attn_block,
    fused_mlp_block,
)

SMALL = CLIPConfig(
    embed_dim=32, image_size=56, patch_size=28, vision_width=128,
    vision_layers=2, vision_heads=2, text_width=128, text_heads=2,
    text_layers=1, vocab_size=128, context_length=8,
)


def _block_params(width=128, seed=0):
    cfg = CLIPConfig(embed_dim=32, vision_width=width, vision_layers=1,
                     vision_heads=2, text_layers=1)
    p = init_clip_params(jax.random.PRNGKey(seed), cfg)
    return p["visual"]["transformer"]["resblocks"][0]


@pytest.mark.parametrize("causal", [False, True])
def test_attn_block_matches_reference(causal):
    p = _block_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 10, 128))
    mask = "causal" if causal else None
    ref = x + attention(p["attn"], layer_norm(p["ln_1"], x), 2, mask,
                        impl="xla")
    out = fused_attn_block(x, p["ln_1"], p["attn"], 2, causal=causal,
                           block_batches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attn_block_pair_path():
    # d_head = 64 exercises the row-stacked head-pair path (the hot one).
    p = _block_params(width=128)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 7, 128))
    ref = x + attention(p["attn"], layer_norm(p["ln_1"], x), 2, None,
                        impl="xla")
    out = fused_attn_block(x, p["ln_1"], p["attn"], 2, block_batches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mlp_block_matches_reference():
    p = _block_params()
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 10, 128))
    h = layer_norm(p["ln_2"], x)
    h = h @ p["mlp"]["fc_w"].T + p["mlp"]["fc_b"]
    h = h * jax.nn.sigmoid(1.702 * h)
    ref = x + h @ p["mlp"]["proj_w"].T + p["mlp"]["proj_b"]
    out = fused_mlp_block(x, p["ln_2"], p["mlp"], block_batches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_resblock_impl_block_parity():
    p = _block_params()
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 9, 128))
    ref = resblock(p, x, 2, impl="xla")
    out = resblock(p, x, 2, impl="block")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_encode_image_block_parity():
    params = init_clip_params(jax.random.PRNGKey(0), SMALL)
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (3, 56, 56, 3))
    ref = encode_image(params, SMALL, imgs, attention_impl="xla")
    out = encode_image(params, SMALL, imgs, attention_impl="block")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_encode_text_block_parity():
    params = init_clip_params(jax.random.PRNGKey(0), SMALL)
    toks = jnp.zeros((3, 8), jnp.int32).at[:, 0].set(1).at[:, 5].set(127)
    ref = encode_text(params, SMALL, toks, attention_impl="xla")
    out = encode_text(params, SMALL, toks, attention_impl="block")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_block_kernels_grad_matches_xla():
    """The custom VJPs (einsum-recompute) must match XLA's gradients."""
    p = _block_params()
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 6, 128))

    def loss(impl):
        return lambda x: jnp.sum(resblock(p, x, 2, impl=impl) ** 2)

    g_ref = jax.grad(loss("xla"))(x)
    g_blk = jax.grad(loss("block"))(x)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(np.asarray(g_blk) / scale,
                               np.asarray(g_ref) / scale,
                               rtol=2e-5, atol=2e-5)


def test_block_padding():
    # batch 5 with block_batches=4 exercises the zero-padding path; the
    # padded rows' LN sees all-zero input (var=0) and must not poison
    # real rows.
    p = _block_params()
    x = jax.random.normal(jax.random.PRNGKey(7), (5, 10, 128))
    ref = resblock(p, x, 2, impl="xla")
    out_a = fused_attn_block(x, p["ln_1"], p["attn"], 2, block_batches=4)
    out = fused_mlp_block(out_a, p["ln_2"], p["mlp"], block_batches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _large_width_case(seed=8):
    """ViT-L/14-class width: 2·D·D4·itemsize crosses the 12 MB VMEM gate
    (fp32 on CPU: 2·1024·4096·4 = 33.5 MB), so fused_mlp_block routes to
    the d4-chunked grid kernel."""
    cfg = CLIPConfig(embed_dim=32, vision_width=1024, vision_layers=1,
                     vision_heads=16, text_layers=1)
    p = init_clip_params(jax.random.PRNGKey(seed), cfg)
    blk = p["visual"]["transformer"]["resblocks"][0]
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (3, 5, 1024))
    h = layer_norm(blk["ln_2"], x)
    h = h @ blk["mlp"]["fc_w"].T + blk["mlp"]["fc_b"]
    h = h * jax.nn.sigmoid(1.702 * h)
    ref = x + h @ blk["mlp"]["proj_w"].T + blk["mlp"]["proj_b"]
    return blk, x, ref


def test_mlp_chunked_large_width(monkeypatch):
    """CLIP_PPO_MLP_CHUNKED=1 opts over-budget widths into the d4-chunked
    grid kernel (only [D, D4/n] weight slices resident per step), which
    must match the XLA formulation; batch 3 with the default block size
    also exercises zero-padding."""
    monkeypatch.setenv("CLIP_PPO_MLP_CHUNKED", "1")
    blk, x, ref = _large_width_case()
    out = fused_mlp_block(x, blk["ln_2"], blk["mlp"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mlp_chunked_grad_matches_xla(monkeypatch):
    monkeypatch.setenv("CLIP_PPO_MLP_CHUNKED", "1")
    blk, x, ref = _large_width_case(seed=10)

    def ref_loss(x):
        h = layer_norm(blk["ln_2"], x)
        h = h @ blk["mlp"]["fc_w"].T + blk["mlp"]["fc_b"]
        h = h * jax.nn.sigmoid(1.702 * h)
        return jnp.sum((x + h @ blk["mlp"]["proj_w"].T
                        + blk["mlp"]["proj_b"]) ** 2)

    g_ref = jax.grad(ref_loss)(x)
    g_chk = jax.grad(
        lambda x: jnp.sum(fused_mlp_block(x, blk["ln_2"], blk["mlp"]) ** 2)
    )(x)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(np.asarray(g_chk) / scale,
                               np.asarray(g_ref) / scale,
                               rtol=2e-5, atol=2e-5)


def test_mlp_stream_large_width(monkeypatch):
    """CLIP_PPO_MLP_STREAM=1 opts over-budget widths into the
    weight-streaming kernel (manual double-buffered [D, ck]/[ck, D]
    weight-tile DMAs from HBM, fp32 accumulation) — must match the XLA
    formulation; batch 3 also exercises zero-padding."""
    monkeypatch.setenv("CLIP_PPO_MLP_STREAM", "1")
    blk, x, ref = _large_width_case()
    out = fused_mlp_block(x, blk["ln_2"], blk["mlp"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mlp_stream_grad_matches_xla(monkeypatch):
    monkeypatch.setenv("CLIP_PPO_MLP_STREAM", "1")
    blk, x, ref = _large_width_case(seed=11)

    def ref_loss(x):
        h = layer_norm(blk["ln_2"], x)
        h = h @ blk["mlp"]["fc_w"].T + blk["mlp"]["fc_b"]
        h = h * jax.nn.sigmoid(1.702 * h)
        return jnp.sum((x + h @ blk["mlp"]["proj_w"].T
                        + blk["mlp"]["proj_b"]) ** 2)

    g_ref = jax.grad(ref_loss)(x)
    g_chk = jax.grad(
        lambda x: jnp.sum(fused_mlp_block(x, blk["ln_2"], blk["mlp"]) ** 2)
    )(x)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(np.asarray(g_chk) / scale,
                               np.asarray(g_ref) / scale,
                               rtol=2e-5, atol=2e-5)


def test_mlp_large_width_defaults_to_stream(monkeypatch):
    """Over-budget widths default to the r4 weight-streaming kernel
    (1.171x the XLA formulation on hardware — mlp_stream_ab.py);
    CLIP_PPO_MLP_STREAM=0 restores the exact XLA fallback."""
    blk, x, ref = _large_width_case(seed=12)
    out = fused_mlp_block(x, blk["ln_2"], blk["mlp"])  # interpret auto
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    monkeypatch.setenv("CLIP_PPO_MLP_STREAM", "0")
    out = fused_mlp_block(x, blk["ln_2"], blk["mlp"], interpret=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_auto_routing_width_gated(monkeypatch):
    """"auto" takes the block path only where the MLP pass actually fuses
    (weights fit the VMEM budget). At ViT-L/14 widths the MLP falls back
    to XLA, making block just a slower attention pass (same-process v5e
    A/B: 324 vs 300 ms at batch 256) — so auto must route those widths to
    the fused-qkv kernel instead."""
    from clip_ppo_tpu.models.clip import model as m

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # ViT-B widths (768 vision / 512 text): block at batch >= 64.
    assert m._use_fused_block("auto", None, 1024, 768)
    assert m._use_fused_block("auto", "causal", 1024, 512)
    assert not m._use_fused_block("auto", None, 8, 768)  # small batch
    # ViT-L/14 width (1024): auto declines block; fused-qkv handles it.
    assert not m._use_fused_block("auto", None, 256, 1024)
    assert m._use_fused_qkv("auto", None, 256)
    # Explicit opt-in is honored at any width/batch.
    assert m._use_fused_block("block", None, 256, 1024)
    # Dense mask arrays (non-sentinel) never take the kernel paths.
    mask = jnp.zeros((4, 4))
    assert not m._use_fused_block("auto", mask, 1024, 768)


# -- r5: weight-streaming ATTENTION block (ViT-L/14 widths) ------------------


def _attn_stream_case(seed=12, causal=False, batch=3, t=7):
    cfg = CLIPConfig(embed_dim=32, vision_width=1024, vision_layers=1,
                     vision_heads=16, text_layers=1)
    p = init_clip_params(jax.random.PRNGKey(seed), cfg)
    blk = p["visual"]["transformer"]["resblocks"][0]
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (batch, t, 1024))
    mask = "causal" if causal else None
    ref = x + attention(blk["attn"], layer_norm(blk["ln_1"], x), 16, mask,
                        impl="xla")
    return blk, x, ref


@pytest.mark.parametrize("causal", [False, True])
def test_attn_stream_matches_reference(causal):
    from clip_ppo_tpu.models.clip.pallas_block import fused_attn_block_stream

    blk, x, ref = _attn_stream_case(causal=causal)
    out = fused_attn_block_stream(x, blk["ln_1"], blk["attn"], 16,
                                  causal=causal, block_batches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attn_stream_grad_matches_xla():
    from clip_ppo_tpu.models.clip.pallas_block import fused_attn_block_stream

    blk, x, _ = _attn_stream_case(seed=13)

    def ref_loss(x):
        return jnp.sum((x + attention(
            blk["attn"], layer_norm(blk["ln_1"], x), 16, None,
            impl="xla")) ** 2)

    g_ref = jax.grad(ref_loss)(x)
    g_chk = jax.grad(
        lambda x: jnp.sum(fused_attn_block_stream(
            x, blk["ln_1"], blk["attn"], 16, block_batches=2) ** 2)
    )(x)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(np.asarray(g_chk) / scale,
                               np.asarray(g_ref) / scale,
                               rtol=2e-5, atol=2e-5)


def test_attn_stream_padding():
    from clip_ppo_tpu.models.clip.pallas_block import fused_attn_block_stream

    blk, x, ref = _attn_stream_case(seed=14, batch=5)
    out = fused_attn_block_stream(x, blk["ln_1"], blk["attn"], 16,
                                  block_batches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
