"""Pallas block kernels INSIDE shard_map (VERDICT r3 "what's weak" 3).

The dp modality tests run the shard_map'd embed wrappers with
attention_impl="auto", which routes to the einsum path on the CPU mesh
(`model._use_fused_block` is TPU-gated) — so the kernel code path a real
multi-chip TPU would take (block kernels per shard inside
`Trainer._shard_features`) was executed nowhere. These tests force
``attention_impl="block"`` — whose kernels self-select interpret mode
off-TPU — through the same shard_map wrappers at ViT-B width (768), and
pin dp=1 ≡ unsharded ≡ einsum-path numerics plus dp=2 execution with
replicated parameters.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import clip_utils, init_agent_params
from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip import model as clip_model
from clip_ppo_tpu.models.clip.model import init_clip_params
from clip_ppo_tpu.parallel.mesh import make_mesh
from clip_ppo_tpu.train import PPOConfig, Trainer

# ViT-B width/heads (the hardware "auto" routing target), one layer and
# a coarse patch grid so interpret-mode Pallas stays fast on CPU;
# embed_dim 512 = the agent heads' feature width.
VITB_1L = CLIPConfig(
    embed_dim=512, image_size=224, patch_size=112, vision_width=768,
    vision_layers=1, vision_heads=12, text_width=64, text_heads=2,
    text_layers=1,
)


def _block_features_fn(cfg: CLIPConfig, impl: str):
    def features(params: dict, obs: jax.Array, frozen: dict) -> jax.Array:
        del params
        x = obs.astype(jnp.float32) / 255.0
        x = clip_utils.preprocess_for_clip(x, cfg.image_size)
        feats = clip_model.encode_image(
            frozen["clip"], cfg, x, jnp.float32, attention_impl=impl)
        return jax.lax.stop_gradient(feats)

    return features


def _trainer(mesh, impl):
    cfg = PPOConfig(num_envs=2, num_steps=2, num_minibatches=2,
                    update_epochs=1)
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", cfg.num_envs)
    clip_params = init_clip_params(jax.random.PRNGKey(7), VITB_1L)
    tr = Trainer(
        cfg, env, num_iterations=1,
        features_fn=_block_features_fn(VITB_1L, impl),
        frozen_params={"clip": clip_params},
        mesh=mesh,
    )
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions,
                               in_channels=3)
    return tr, params


def _run(mesh, impl):
    tr, params = _trainer(mesh, impl)
    state = tr.init_state(params, seed=0)
    state, packed = tr.run_iterations(state, 1, 1)
    return tr.fetch_logs_chunk(packed), state


def test_block_kernels_dp1_match_unsharded_and_einsum():
    base, _ = _run(None, "xla")
    blk, _ = _run(None, "block")
    dp1, _ = _run(make_mesh(num_devices=1), "block")
    for (sa, _), (sb, _), (sc, _) in zip(base, blk, dp1):
        for k in sa:
            # kernel vs einsum: float tolerance; dp1 vs unsharded kernel:
            # the same program modulo the mesh wrapper
            np.testing.assert_allclose(sa[k], sb[k], rtol=2e-4, atol=2e-5,
                                       err_msg=f"einsum-vs-block {k}",
                                       equal_nan=True)
            np.testing.assert_allclose(sb[k], sc[k], rtol=1e-5, atol=1e-6,
                                       err_msg=f"dp1 {k}", equal_nan=True)


def test_block_kernels_dp2_execute_replicated():
    logs, state = _run(make_mesh(num_devices=2), "block")
    for sc, _ in logs:
        assert np.isfinite(sc["policy_loss"])
        assert np.isfinite(sc["value_loss"])
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 2
    np.testing.assert_array_equal(shards[0], shards[1])


def test_embed_sharded_block_kernels_dp2():
    """The fused image-modality encode (`Trainer._embed_sharded`) with
    the block kernels per shard: dp=2 equals the unsharded flat encode
    exactly (each shard flattens its [T, N/dp] block t-major)."""
    cfg = PPOConfig(num_envs=2, num_steps=2, num_minibatches=2,
                    update_epochs=1)
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", cfg.num_envs)
    clip_params = init_clip_params(jax.random.PRNGKey(3), VITB_1L)

    def embed(obs, frozen):
        x = obs.astype(jnp.float32) / 255.0
        x = clip_utils.preprocess_for_clip(x, VITB_1L.image_size)
        return clip_model.encode_image(frozen["clip"], VITB_1L, x,
                                       jnp.float32, attention_impl="block")

    obs = jax.random.randint(
        jax.random.PRNGKey(1), (cfg.num_steps, cfg.num_envs, 84, 84, 3),
        0, 255, jnp.uint8)
    frozen = {"clip": clip_params}
    t, n = obs.shape[:2]
    flat = obs.reshape(t * n, 84, 84, 3)
    ref = np.asarray(embed(flat, frozen)).reshape(t, n, -1)

    tr = Trainer(cfg, env, num_iterations=1, mesh=make_mesh(num_devices=2))
    out = np.asarray(tr._embed_sharded(embed, obs, frozen))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
