"""Mesh coverage for every CLIP modality/ablation path (VERDICT r2 item 1).

r2 sharded only the fused image-modality encode; the FROZEN_CLIP trunk,
the precomputed text table, the split-text host path and the random
ablation all ran un-wrapped under a mesh — untested on real multi-chip
and liable to fail GSPMD partitioning on the Pallas encode. r3 routes all
outer-graph feature/embedding calls through shard_map
(`train/runner.py:_shard_features`, `_embed_sharded`); these tests pin
dp=1 ≡ unsharded numerics and dp>1 execution + parameter replication for
each path on the virtual CPU mesh (SURVEY §4 test strategy).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import clip_utils, init_agent_params
from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.model import init_clip_params
from clip_ppo_tpu.parallel.mesh import make_mesh
from clip_ppo_tpu.train import PPOConfig, Trainer

TINY_CLIP = CLIPConfig(
    embed_dim=512, image_size=224, patch_size=56, vision_width=64,
    vision_layers=1, vision_heads=2, text_width=64, text_heads=2,
    text_layers=1,
)


def _frozen_clip_trainer(mesh):
    """MiniGrid FROZEN_CLIP: the agent trunk IS the (tiny) CLIP visual
    tower (`clip_ppo_minigrid.py:219-227`), Pallas-bearing on TPU."""
    cfg = PPOConfig(num_envs=4, num_steps=4, num_minibatches=2, update_epochs=1)
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", cfg.num_envs)
    clip_params = init_clip_params(jax.random.PRNGKey(7), TINY_CLIP)
    tr = Trainer(
        cfg, env, num_iterations=2,
        features_fn=clip_utils.make_frozen_clip_features_fn(TINY_CLIP),
        frozen_params={"clip": clip_params},
        mesh=mesh,
    )
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=3)
    return tr, params


def _text_table_trainer(mesh):
    """Fused text modality: in-graph gather from a precomputed table
    threaded via frozen_params (`clip_utils.make_text_table_embed_fn`)."""
    cfg = PPOConfig(num_envs=4, num_steps=4, num_minibatches=2,
                    update_epochs=1, clip_mode="precomputed")
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", cfg.num_envs)
    h = env.params.height
    table = jax.random.normal(jax.random.PRNGKey(3),
                              (env.params.width * h * 4, 512), jnp.float32)
    table = table / jnp.linalg.norm(table, axis=-1, keepdims=True)
    tr = Trainer(
        cfg, env, num_iterations=2,
        embed_desc_fn=clip_utils.make_text_table_embed_fn(h),
        clip_lambda=1e-4,
        frozen_params={"text_table": table},
        mesh=mesh,
    )
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=3)
    return tr, params


def _random_trainer(mesh):
    cfg = PPOConfig(num_envs=4, num_steps=4, num_minibatches=2,
                    update_epochs=1, clip_mode="precomputed")
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", cfg.num_envs)
    tr = Trainer(
        cfg, env, num_iterations=2,
        embed_random_fn=clip_utils.make_random_embed_fn(cfg.batch_size),
        clip_lambda=1e-4,
        mesh=mesh,
    )
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=3)
    return tr, params


FACTORIES = {
    "frozen_clip": _frozen_clip_trainer,
    "text_table": _text_table_trainer,
    "random": _random_trainer,
}


def _run(factory, mesh, iterations=2):
    tr, params = factory(mesh)
    state = tr.init_state(params, seed=0)
    state, packed = tr.run_iterations(state, 1, iterations)
    return tr.fetch_logs_chunk(packed), state


def _assert_logs_match(a, b, rtol=1e-5, atol=1e-6):
    for (sa, _), (sb, _) in zip(a, b):
        for k in sa:
            np.testing.assert_allclose(
                sa[k], sb[k], rtol=rtol, atol=atol, err_msg=k, equal_nan=True
            )


def _assert_replicated(state, n_dev):
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == n_dev
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.parametrize("name", sorted(FACTORIES))
def test_dp1_matches_unsharded(name):
    factory = FACTORIES[name]
    base, _ = _run(factory, mesh=None)
    dp1, _ = _run(factory, mesh=make_mesh(num_devices=1))
    _assert_logs_match(base, dp1)


@pytest.mark.parametrize("name", sorted(FACTORIES))
def test_dp2_runs_finite_replicated(name):
    logs, state = _run(FACTORIES[name], mesh=make_mesh(num_devices=2))
    for sc, _ in logs:
        assert np.isfinite(sc["policy_loss"]), sc
        assert np.isfinite(sc["value_loss"]), sc
    _assert_replicated(state, 2)


def test_frozen_clip_dp4_runs():
    """Wider mesh on the Pallas-bearing trunk (4 divides num_envs=4)."""
    logs, state = _run(_frozen_clip_trainer, mesh=make_mesh(num_devices=4))
    assert np.isfinite(logs[-1][0]["policy_loss"])
    _assert_replicated(state, 4)


def test_split_text_path_under_mesh():
    """Host-computed embeddings ([B, D] t-major) through the split halves
    under a mesh: dp=1 ≡ unsharded, dp=2 runs and pairs embeddings with
    the dp-sharded batch via the [T, N, D] reshape (`runner._update`)."""

    def run(mesh):
        cfg = PPOConfig(num_envs=4, num_steps=4, num_minibatches=2,
                        update_epochs=1, clip_mode="precomputed")
        env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", cfg.num_envs)
        tr = Trainer(cfg, env, num_iterations=2, clip_lambda=1e-4, mesh=mesh)
        params = init_agent_params(
            jax.random.PRNGKey(0), env.num_actions, in_channels=3
        )
        state = tr.init_state(params, seed=0)
        out = []
        for it in (1, 2):
            state, data, stats, desc = tr.run_rollout_half(state)
            emb = jax.random.normal(
                jax.random.PRNGKey(100 + it), (cfg.batch_size, 512), jnp.float32
            )
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            state, scalars = tr.run_update_half(state, data, it, emb)
            out.append(tr.fetch_logs(scalars, stats))
        return out, state

    base, _ = run(None)
    dp1, _ = run(make_mesh(num_devices=1))
    _assert_logs_match(base, dp1)
    dp2, state = run(make_mesh(num_devices=2))
    assert np.isfinite(dp2[-1][0]["clip_loss"])
    _assert_replicated(state, 2)
