"""Batch-packed Pallas attention vs the XLA einsum path (interpret on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.model import attention, encode_image, init_clip_params
from clip_ppo_tpu.models.clip.pallas_attention import packed_attention


def _qkv(b=6, t=50, h=4, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, t, h, d)) for k in ks)


def _reference(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhc,bkhc->bhqk", q * scale, k)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhc->bqhc", w, v)


@pytest.mark.parametrize("group,block_pairs", [(1, 4), (2, 4), (4, 8)])
def test_matches_einsum(group, block_pairs):
    q, k, v = _qkv()
    ref = np.asarray(_reference(q, k, v))
    out = np.asarray(packed_attention(q, k, v, group=group, block_pairs=block_pairs))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pair_padding():
    # b·h = 3·3 = 9, not divisible by block_pairs=4 → padding path.
    q, k, v = _qkv(b=3, t=13, h=3, d=16, seed=1)
    ref = np.asarray(_reference(q, k, v))
    out = np.asarray(packed_attention(q, k, v, group=2, block_pairs=4))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_no_cross_pair_leakage():
    """Changing pair j must not affect pair i ≠ j (the masked off-diagonal
    blocks really are dead)."""
    q, k, v = _qkv(b=2, t=10, h=1, d=8, seed=2)
    base = np.asarray(packed_attention(q, k, v, group=2, block_pairs=2))
    k2 = k.at[1].set(k[1] * -3.0 + 1.0)
    v2 = v.at[1].set(v[1] * 5.0)
    out = np.asarray(packed_attention(q, k2, v2, group=2, block_pairs=2))
    np.testing.assert_allclose(out[0], base[0], rtol=1e-6)
    assert not np.allclose(out[1], base[1])


def test_attention_impl_switch_parity():
    cfg = CLIPConfig(
        embed_dim=32, image_size=56, patch_size=28, vision_width=64,
        vision_layers=2, vision_heads=2, text_width=32, text_heads=2,
        text_layers=1, vocab_size=128, context_length=8,
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 56, 56, 3))
    a = np.asarray(encode_image(params, cfg, imgs, attention_impl="xla"))
    b = np.asarray(encode_image(params, cfg, imgs, attention_impl="pallas"))
    np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_bf16_path():
    q, k, v = _qkv(b=4, t=50, h=2, d=64, seed=3)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = np.asarray(_reference(qb, kb, vb).astype(jnp.float32))
    out = np.asarray(
        packed_attention(qb, kb, vb, group=2, block_pairs=4).astype(jnp.float32)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
