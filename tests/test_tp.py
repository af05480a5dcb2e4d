"""Tensor-parallel CLIP sharding: numerics identical to single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.model import encode_image, encode_text, init_clip_params
from clip_ppo_tpu.parallel.mesh import make_mesh
from clip_ppo_tpu.parallel.tp import clip_param_shardings, shard_clip_params

CFG = CLIPConfig(
    embed_dim=32,
    image_size=56,
    patch_size=28,
    vision_width=64,
    vision_layers=2,
    vision_heads=4,   # divisible by tp=4
    context_length=16,
    vocab_size=256,
    text_width=64,
    text_heads=4,
    text_layers=2,
)


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 56, 56, 3))
    toks = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 1, 254)
    toks = toks.at[:, -1].set(255)
    return params, imgs, toks


@pytest.mark.parametrize("dp,tp", [(2, 4), (1, 8), (4, 2)])
def test_tp_sharded_encode_matches_replicated(setup, dp, tp):
    params, imgs, toks = setup
    ref_img = np.asarray(encode_image(params, CFG, imgs))
    ref_txt = np.asarray(encode_text(params, CFG, toks))

    mesh = make_mesh(dp=dp, tp=tp)
    sharded = shard_clip_params(mesh, params)
    out_img = np.asarray(jax.jit(lambda p, x: encode_image(p, CFG, x))(sharded, imgs))
    out_txt = np.asarray(jax.jit(lambda p, t: encode_text(p, CFG, t))(sharded, toks))

    np.testing.assert_allclose(out_img, ref_img, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out_txt, ref_txt, rtol=2e-5, atol=2e-5)


def test_shardings_cover_every_leaf(setup):
    params, _, _ = setup
    mesh = make_mesh(dp=2, tp=4)
    sh = clip_param_shardings(mesh, params)
    p_leaves = jax.tree_util.tree_leaves(params)
    s_leaves = jax.tree_util.tree_leaves(
        sh, is_leaf=lambda x: hasattr(x, "spec")
    )
    assert len(p_leaves) == len(s_leaves)


def test_weights_actually_sharded(setup):
    params, _, _ = setup
    mesh = make_mesh(dp=1, tp=8)
    sharded = shard_clip_params(mesh, params)
    w = sharded["visual"]["transformer"]["resblocks"][0]["mlp"]["fc_w"]
    # column-parallel: row dim split across 8 devices
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(4 * CFG.vision_width // 8, CFG.vision_width)}
