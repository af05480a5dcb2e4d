"""Orbax checkpoint backend: reference payload round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("orbax.checkpoint")

from clip_ppo_tpu.io.orbax_checkpoint import (
    load_checkpoint_orbax,
    save_checkpoint_orbax,
)


def _tree(key):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return {
        "trunk": {"w": jax.random.normal(k1, (4, 8)), "b": jnp.zeros(8)},
        "actor": {"w": jax.random.normal(k2, (8, 3)), "b": jnp.ones(3)},
    }


def test_roundtrip(tmp_path):
    import dataclasses

    @dataclasses.dataclass
    class Args:
        seed: int = 7
        env_id: str = "MiniGrid-Empty-16x16-v0"

    params = _tree(0)
    opt_state = {"m": _tree(1), "count": jnp.int32(5)}
    prefix = str(tmp_path / "run")
    save_checkpoint_orbax(prefix, params, opt_state, 3, 3072, Args())

    p2, o2, it, gs, meta = load_checkpoint_orbax(
        f"{prefix}_step_3072",
        jax.tree_util.tree_map(jnp.zeros_like, params),
        jax.tree_util.tree_map(jnp.zeros_like, opt_state),
    )
    assert (it, gs) == (3, 3072)
    assert meta["args"]["seed"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(o2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # _latest mirror exists and restores identically.
    p3, _, it3, _, _ = load_checkpoint_orbax(
        f"{prefix}_latest",
        jax.tree_util.tree_map(jnp.zeros_like, params),
        jax.tree_util.tree_map(jnp.zeros_like, opt_state),
    )
    assert it3 == 3


def test_final_flag(tmp_path):
    params = _tree(0)
    opt = {"count": jnp.int32(1)}
    prefix = str(tmp_path / "run")
    save_checkpoint_orbax(prefix, params, opt, 9, 9216, {"seed": 1}, final=True)
    _, _, _, _, meta = load_checkpoint_orbax(
        f"{prefix}_final",
        jax.tree_util.tree_map(jnp.zeros_like, params),
        {"count": jnp.int32(0)},
    )
    assert meta["training_complete"] is True


def test_returns_extras_and_enum_args(tmp_path):
    """Formerly-failing cases: b_returns + extra_models stored alongside,
    Enum-valued args fields, and restore through the _latest symlink."""
    import dataclasses
    from enum import Enum

    class Mode(Enum):
        A = "A"

    @dataclasses.dataclass
    class Args:
        mode: Mode = Mode.A
        seed: int = 3

    params = _tree(0)
    opt = {"count": jnp.int32(2)}
    extra = {"temporal_projection": {"w": jnp.ones((4, 2))}}
    prefix = str(tmp_path / "run")
    save_checkpoint_orbax(
        prefix, params, opt, 5, 5120, Args(),
        b_returns=np.arange(6.0), extra_models=extra,
    )
    p2, o2, it, gs, meta = load_checkpoint_orbax(
        f"{prefix}_step_5120",
        jax.tree_util.tree_map(jnp.zeros_like, params),
        {"count": jnp.int32(0)},
        extra_templates={"temporal_projection": {"w": jnp.zeros((4, 2))}},
    )
    assert (it, gs) == (5, 5120)
    assert meta["args"]["mode"] == "A"
    np.testing.assert_allclose(
        np.asarray(meta["extras"]["temporal_projection"]["w"]), np.ones((4, 2))
    )
    # _latest (symlink) restores identically and cheaply.
    p3, _, it3, _, _ = load_checkpoint_orbax(
        f"{prefix}_latest",
        jax.tree_util.tree_map(jnp.zeros_like, params),
        {"count": jnp.int32(0)},
    )
    assert it3 == 5
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_orbax_resume_under_mesh(tmp_path):
    """Checkpoint → resume → shard_state → continue at dp=8 (VERDICT r2
    item 8): a dp-trained state saved through the orbax backend restores
    into a FRESH Trainer on the mesh, training continues, and parameters
    stay bit-replicated on every device."""
    from clip_ppo_tpu.envs import JaxVectorEnv
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.parallel.mesh import make_mesh
    from clip_ppo_tpu.train import PPOConfig, Trainer
    import dataclasses

    @dataclasses.dataclass
    class Args:
        seed: int = 0
        env_id: str = "MiniGrid-Empty-5x5-v0"

    cfg = PPOConfig(num_envs=8, num_steps=8, num_minibatches=2, update_epochs=1)
    env = JaxVectorEnv(Args.env_id, cfg.num_envs)
    mesh = make_mesh(num_devices=8)

    tr1 = Trainer(cfg, env, num_iterations=6, mesh=mesh)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=3)
    st = tr1.init_state(params, seed=0)
    st, packed = tr1.run_iterations(st, 1, 4)
    _ = tr1.fetch_logs_chunk(packed)
    prefix = str(tmp_path / "dp8")
    save_checkpoint_orbax(
        prefix, jax.device_get(st.params), jax.device_get(st.opt_state),
        4, 4 * cfg.num_envs * cfg.num_steps, Args(),
    )

    tr2 = Trainer(cfg, env, num_iterations=6, mesh=mesh)
    fresh = init_agent_params(jax.random.PRNGKey(1), env.num_actions, in_channels=3)
    st2 = tr2.init_state(fresh, seed=0)
    p2, o2, it, gs, _ = load_checkpoint_orbax(
        f"{prefix}_latest", jax.device_get(st2.params), jax.device_get(st2.opt_state)
    )
    assert (it, gs) == (4, 256)
    st2 = tr2.shard_state(dataclasses.replace(st2, params=p2, opt_state=o2))

    # restored params match the saved ones exactly
    for a, b in zip(jax.tree_util.tree_leaves(st.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ...and training continues from them on the mesh
    st2, packed = tr2.run_iterations(st2, it + 1, 2)
    for scalars, _stats in tr2.fetch_logs_chunk(packed):
        assert np.isfinite(scalars["policy_loss"])
    leaf = jax.tree_util.tree_leaves(st2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 8
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
