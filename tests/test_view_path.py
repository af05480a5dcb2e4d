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
    b = cnn.nature_cnn_view(p, view.astype(jnp.float32), 12,
                            v_scale=1.0 / 255.0)
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
            p, view.astype(jnp.float32), 12, v_scale=1.0 / 255.0).sum()
    )(p)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_view_weight_presum_pinned_to_highest_precision():
    """TPU-default bf16 passes on tiny /255 view values chained through
    two contractions cost ~3% relative feature error — enough to flatline
    learning at scale (Empty-16x16 250k: 0.024 at default vs 0.976 at
    f32, measured on v5e). The fix: fold the obs scale into the hoisted
    weight pre-sum, which MUST stay at HIGHEST precision (it is
    loop-invariant, so that is free), while the hot per-step view
    contraction runs at default speed on integer-exact inputs. Pin both
    halves structurally in the jaxpr."""
    p = cnn.init_nature_cnn(jax.random.PRNGKey(0), 3)
    v = jnp.zeros((2, 7, 7, 3), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda p, v: cnn.nature_cnn_view(p, v, 12, v_scale=1 / 255.0))(p, v)
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots, "view path no longer lowers to dot_general — update test"
    hi = jax.lax.Precision.HIGHEST
    highest = [e for e in dots if e.params["precision"] == (hi, hi)]
    # The 3-operand weight pre-sum lowers to 2 pinned contractions; the
    # per-step view contraction must NOT be pinned (that 3× cost showed
    # up directly in the driver metric: 130.6k vs 158.7k SPS).
    assert len(highest) == 2, [e.params["precision"] for e in dots]
    assert len(dots) > 2


def test_view_integer_inputs_survive_bf16_operand_rounding():
    """The rationale for feeding RAW views + v_scale instead of /255
    views: under bf16 operand rounding (what the TPU does at default
    precision; emulated here via compute_dtype=bf16), integer-coded
    views are exact, so only one weight rounding remains and the feature
    error stays in the dense-conv class — while pre-divided views add
    input rounding that chains through the double contraction."""
    p = cnn.init_nature_cnn(jax.random.PRNGKey(4), 3)
    view = jax.random.randint(
        jax.random.PRNGKey(5), (8, 7, 7, 3), 0, 11).astype(jnp.float32)
    bf = jnp.bfloat16
    ref = cnn.nature_cnn_view(p, view, 12, v_scale=1 / 255.0)
    new = cnn.nature_cnn_view(p, view, 12, dtype=bf, v_scale=1 / 255.0)
    old = cnn.nature_cnn_view(p, view / 255.0, 12, dtype=bf)

    def rel(x):
        d = np.asarray(x, np.float32) - np.asarray(ref, np.float32)
        return float(np.linalg.norm(d) / np.linalg.norm(np.asarray(ref)))

    assert rel(new) < 0.02, rel(new)
    assert rel(new) <= rel(old), (rel(new), rel(old))


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
