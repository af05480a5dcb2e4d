"""HostTrainer: PPO over host-API envs (the ALE adapter's training path).

Driven with the pure-JAX envs' host API standing in for the emulator —
same reset/step/infos contract as ALEVectorEnv. The fake-ALE emulator
stack itself is exercised in tests/test_fake_ale.py.
"""

import numpy as np

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import AtariVectorEnv, JaxVectorEnv
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import HostTrainer, PPOConfig


def test_host_trainer_minigrid():
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    cfg = PPOConfig(num_envs=2, num_steps=16, num_minibatches=2, update_epochs=1)
    tr = HostTrainer(cfg, env, num_iterations=3)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    st = tr.init_state(params, seed=0)
    p0 = np.asarray(st.params["actor"]["w"]).copy()
    total_eps = 0
    for it in range(1, 4):
        st, scalars, episodes, _extras = tr.run_iteration(st, it)
        total_eps += len(episodes)
        for tag in ("policy_loss", "value_loss", "entropy", "approx_kl"):
            assert np.isfinite(float(scalars[tag]))
    assert not np.allclose(p0, np.asarray(st.params["actor"]["w"]))
    # 5x5 Empty truncates at 100 steps, so with 2 envs × 48 steps some
    # episodes can finish; tuples are (return, length, rollout_step).
    for r, length, t in episodes:
        assert isinstance(r, float) and isinstance(length, int)
        assert 0 <= t < cfg.num_steps


def test_host_trainer_atari_host_api():
    env = AtariVectorEnv("ALE/Pong-v5", 2)
    cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1)
    tr = HostTrainer(cfg, env, num_iterations=2)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=4)
    st = tr.init_state(params, seed=0)
    st, scalars, _, _ = tr.run_iteration(st, 1)
    assert np.isfinite(float(scalars["policy_loss"]))
    assert st.obs.shape == (2, 84, 84, 4)


def test_host_trainer_disturbance_changes_stored_obs():
    """With disturbances on, the stored rollout obs differ from the raw
    env obs (applied before storing/acting, `clip_ppo_atari.py:568-584`),
    while the carried state.obs stays raw for the bootstrap."""
    from clip_ppo_tpu.ops import DisturbanceSeverity, resolve_params

    env1 = AtariVectorEnv("ALE/Pong-v5", 2)
    env2 = AtariVectorEnv("ALE/Pong-v5", 2)
    cfg = PPOConfig(num_envs=2, num_steps=4, num_minibatches=2, update_epochs=1)
    params = init_agent_params(jax.random.PRNGKey(0), env1.num_actions, in_channels=4)

    clean = HostTrainer(cfg, env1, num_iterations=2)
    st_c = clean.init_state(params, seed=0)
    _, batch_c, _, _ = clean.run_rollout(st_c)

    tr = HostTrainer(
        cfg, env2, num_iterations=2,
        disturbance=resolve_params(DisturbanceSeverity.SEVERE),
        disturbance_semantics="stack_frames",
    )
    st = tr.init_state(params, seed=0)
    raw_first_obs = st.obs.copy()
    new_st, batch, _, _ = tr.run_rollout(st)
    stored = np.asarray(batch["obs"][0])
    assert not np.array_equal(stored, raw_first_obs), "step-0 obs not disturbed"
    # bootstrap obs is the raw post-rollout observation (not disturbed)
    assert np.array_equal(np.asarray(batch["last_obs"]), new_st.obs)


def test_host_matches_device_trainer_losses():
    """With identical params/obs streams the two trainers compute the same
    update math; a weak but useful coupling check: one iteration on each
    from the same init produces finite, same-magnitude losses."""
    from clip_ppo_tpu.train import Trainer

    env1 = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    env2 = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    cfg = PPOConfig(num_envs=2, num_steps=16, num_minibatches=2, update_epochs=1)
    params = init_agent_params(jax.random.PRNGKey(0), env1.num_actions)

    dev = Trainer(cfg, env1, num_iterations=2)
    dst = dev.init_state(jax.tree_util.tree_map(lambda x: x.copy(), params), seed=0)
    dst, dsc, _ = dev.run_iteration(dst, 1)

    host = HostTrainer(cfg, env2, num_iterations=2)
    hst = host.init_state(jax.tree_util.tree_map(lambda x: x.copy(), params), seed=0)
    hst, hsc, _, _ = host.run_iteration(hst, 1)

    assert abs(float(dsc["learning_rate"]) - float(hsc["learning_rate"])) < 1e-9
    for tag in ("policy_loss", "value_loss", "entropy"):
        assert np.isfinite(float(hsc[tag])) and np.isfinite(float(dsc[tag]))


def test_pipelined_rollout_matches_serial():
    """r3 host-rollout pipeline (VERDICT item 3): with env groups, the
    overlapped schedule (async dispatch of all groups, then fetch+step)
    must produce bit-identical rollouts to the serial schedule — the
    per-(step, group) folded PRNG keys make contents order-independent."""
    def make_groups():
        return [AtariVectorEnv("ALE/Pong-v5", 2), AtariVectorEnv("ALE/Pong-v5", 2)]

    cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2, update_epochs=1)
    params = init_agent_params(jax.random.PRNGKey(0), 6, in_channels=4)

    batches = {}
    for overlap in (True, False):
        tr = HostTrainer(cfg, make_groups(), num_iterations=2, overlap=overlap)
        st = tr.init_state(jax.tree_util.tree_map(lambda x: x.copy(), params), seed=0)
        st, batch, episodes, _ = tr.run_rollout(st)
        batches[overlap] = (jax.device_get(batch), episodes, st.obs.copy())

    (b1, e1, o1), (b0, e0, o0) = batches[True], batches[False]
    assert set(b1) == set(b0)
    for k in b1:
        np.testing.assert_array_equal(b1[k], b0[k], err_msg=k)
    assert e1 == e0
    np.testing.assert_array_equal(o1, o0)


def test_device_resident_rollout_buffers():
    """The policy's obs/logprob/value outputs live in device buffers (the
    per-step D2H fetch is the action only); the stored obs row matches an
    independent recomputation of the policy on the same inputs."""
    env = AtariVectorEnv("ALE/Pong-v5", 2)
    cfg = PPOConfig(num_envs=2, num_steps=4, num_minibatches=2, update_epochs=1)
    tr = HostTrainer(cfg, env, num_iterations=2)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=4)
    st = tr.init_state(params, seed=0)
    first_obs = st.obs.copy()
    _, batch, _, _ = tr.run_rollout(st)
    assert isinstance(batch["obs"], jax.Array)
    # no disturbance → the stored step-0 obs is the raw reset obs
    np.testing.assert_array_equal(np.asarray(batch["obs"][0]), first_obs)
    assert batch["logprobs"].shape == (4, 2)


def test_host_trainer_projected_clip_trains_only_projection():
    """Image-modality CLIP loss on the host path: gradient reaches only
    ``temporal_projection`` (`clip_ppo_atari.py:726-733`). Compare a run
    with λ=0 against λ huge: all params except temporal_projection get
    identical updates."""
    from clip_ppo_tpu.models import clip_utils
    from clip_ppo_tpu.models.clip import CLIPConfig
    from clip_ppo_tpu.models.clip.model import init_clip_params

    tiny = CLIPConfig(
        embed_dim=512, image_size=224, patch_size=56, vision_width=64,
        vision_layers=1, vision_heads=2, context_length=77,
        vocab_size=49408, text_width=64, text_heads=2, text_layers=1,
    )
    clip_params = init_clip_params(jax.random.PRNGKey(1), tiny)
    embed_fn = clip_utils.make_multiframe_embed_fn(tiny)

    def run(lam):
        env = AtariVectorEnv("ALE/Breakout-v5", 2)
        # huge max_grad_norm: global-norm clipping would otherwise couple
        # the CLIP gradient into every param's rescale factor
        cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2,
                        update_epochs=1, clip_mode="projected",
                        max_grad_norm=1e9)
        tr = HostTrainer(
            cfg, env, num_iterations=2,
            frozen_params={"clip": clip_params},
            embed_images_fn=embed_fn, clip_lambda=lam,
            clip_warmup_fraction=0.0,
        )
        params = init_agent_params(
            jax.random.PRNGKey(0), env.num_actions, in_channels=4,
            with_temporal_projection=True,
        )
        st = tr.init_state(params, seed=0)
        st, scalars, _, _ = tr.run_iteration(st, 1)
        return st.params, scalars

    p0, s0 = run(0.0)
    p1, s1 = run(10.0)
    # The gated-on first minibatch computes a real cosine loss (the
    # last-minibatch "clip_loss" scalar is 0 when the gate is off, same
    # as the reference's logged variable), and the huge λ moves ONLY the
    # projection.
    assert float(s1["first_clip_loss"]) > 0
    same = lambda a, b: np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert same(p0["trunk"]["conv1"]["w"], p1["trunk"]["conv1"]["w"])
    assert same(p0["actor"]["w"], p1["actor"]["w"])
    assert not same(
        p0["temporal_projection"]["w"], p1["temporal_projection"]["w"]
    ), "CLIP gradient must reach temporal_projection"
