"""The MiniGrid view fast path: conv1 phase reformulation + Trainer wiring.

MiniGrid observations are exact ×12 nearest upscales of the 7×7 symbolic
view (ImgObsWrapper + ResizeObservation, reference
`minigrid_experiments/ppo/ppo_minigrid.py:110-114`), so the 84×84 Nature
CNN collapses onto the raw view (`nature_cnn.nature_cnn_view`) with
identical numerics. These tests pin the reformulation against the dense
conv and the Trainer's gating/equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.models import nature_cnn as cnn
from clip_ppo_tpu.ops.resize import upscale_nearest
from clip_ppo_tpu.ops.severity import SEVERITY_CONFIGS, DisturbanceSeverity
from clip_ppo_tpu.train import PPOConfig, Trainer


def test_view_cnn_matches_dense_conv():
    p = cnn.init_nature_cnn(jax.random.PRNGKey(0), 3)
    view = jax.random.randint(
        jax.random.PRNGKey(1), (5, 7, 7, 3), 0, 11).astype(jnp.uint8)
    obs84 = upscale_nearest(view, 12)
    a = cnn.nature_cnn(p, obs84.astype(jnp.float32) / 255.0)
    b = cnn.nature_cnn_view(p, view.astype(jnp.float32) / 255.0, 12)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_view_cnn_gradients_match():
    p = cnn.init_nature_cnn(jax.random.PRNGKey(2), 3)
    view = jax.random.randint(
        jax.random.PRNGKey(3), (3, 7, 7, 3), 0, 11).astype(jnp.uint8)
    obs84 = upscale_nearest(view, 12)
    ga = jax.grad(
        lambda p: cnn.nature_cnn(p, obs84.astype(jnp.float32) / 255.0).sum()
    )(p)
    gb = jax.grad(
        lambda p: cnn.nature_cnn_view(
            p, view.astype(jnp.float32) / 255.0, 12).sum()
    )(p)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_trainer_enables_view_mode_by_default():
    env = JaxVectorEnv("MiniGrid-Empty-16x16-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2,
                    update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=4)
    assert tr.view_mode
    st = tr.init_state(
        init_agent_params(jax.random.PRNGKey(0), env.num_actions), seed=0)
    assert st.obs.shape == (4, 7, 7, 3)


def test_disturbances_disable_view_mode():
    env = JaxVectorEnv("MiniGrid-Empty-16x16-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2,
                    update_epochs=1)
    dist = SEVERITY_CONFIGS[DisturbanceSeverity.HARD]
    tr = Trainer(cfg, env, num_iterations=4, disturbance=dist)
    assert not tr.view_mode
    st = tr.init_state(
        init_agent_params(jax.random.PRNGKey(0), env.num_actions), seed=0)
    assert st.obs.shape == (4, 84, 84, 3)


def test_custom_features_disable_view_mode():
    env = JaxVectorEnv("MiniGrid-Empty-16x16-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2,
                    update_epochs=1)

    def other_features(params, obs, frozen=None):
        return agent_mod.cnn_features(params, obs, frozen)

    tr = Trainer(cfg, env, num_iterations=4, features_fn=other_features)
    assert not tr.view_mode


def test_view_mode_iteration_matches_obs_mode():
    """Same seed, one full iteration in both modes: the update scalars
    must agree to fp32 tolerance (actions/logprobs identical because the
    logits differ only at epsilon under the same Gumbel draw)."""
    env = JaxVectorEnv("MiniGrid-Empty-16x16-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=2)

    def run(view_mode):
        tr = Trainer(cfg, env, num_iterations=8)
        if not view_mode:
            tr.view_mode = False
            tr.features_fn = agent_mod.cnn_features
            tr.outer_features_fn = agent_mod.cnn_features
            tr._jit_iteration = jax.jit(tr._iteration, donate_argnums=(0,))
        st = tr.init_state(
            init_agent_params(jax.random.PRNGKey(0), env.num_actions),
            seed=0)
        st, scalars, stats = tr.run_iteration(st, 1)
        return {k: float(v) for k, v in scalars.items()}

    a, b = run(True), run(False)
    for k in ("policy_loss", "value_loss", "entropy", "approx_kl",
              "explained_variance", "clipfrac"):
        assert a[k] == pytest.approx(b[k], rel=2e-3, abs=5e-4), (k, a[k], b[k])


def test_view_mode_trains_end_to_end():
    env = JaxVectorEnv("MiniGrid-Empty-16x16-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=2)
    tr = Trainer(cfg, env, num_iterations=4)
    assert tr.view_mode
    st = tr.init_state(
        init_agent_params(jax.random.PRNGKey(0), env.num_actions), seed=0)
    st, packed = tr.run_iterations(st, 1, 4)
    logs = tr.fetch_logs_chunk(packed)
    assert all(np.isfinite(sc["policy_loss"]) for sc, _ in logs)
