"""Mission-conditioned policy (models/mission.py, --mission-conditioning).

The reference drops the mission string via ImgObsWrapper
(`ppo_minigrid.py:110`), so instruction-following families are only
learnable to mission-blind guess ceilings. The extension FiLM-conditions
the trunk on the env's structured instruction. Pinned here: the env's
mission vector, FiLM identity at init, exact logprob replay through the
(obs, mission) storage pairing, gradient flow into the FiLM head,
composition with the dp mesh and the exploration bonus, and the CLI
surface.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.models import mission as mission_mod
from clip_ppo_tpu.train import PPOConfig, Trainer


def test_mission_vector_matches_env_state():
    env = JaxVectorEnv("MiniGrid-Fetch-5x5-N2-v0", 3)
    st, _ = env.reset_fn(jax.random.PRNGKey(0))
    m = np.asarray(env.mission_fn(st))
    assert m.shape == (3, env.mission_dim) and m.dtype == np.int32
    np.testing.assert_array_equal(m[:, :8], np.asarray(st.env.target))
    np.testing.assert_array_equal(
        m[:, 8:56], np.asarray(st.env.instr).reshape(3, -1))
    np.testing.assert_array_equal(
        m[:, 56:], np.asarray(st.env.instr_state).reshape(3, -1))
    # Fetch's mission names a placed (type, color): both fields set
    assert (m[:, 0] > 0).all() and (m[:, 1] >= 0).all()


def test_film_identity_at_init():
    """Zero-initialized FiLM head: the conditioned features equal the
    unconditioned ones exactly at init, for ANY mission."""
    key = jax.random.PRNGKey(0)
    params = init_agent_params(key, 7, mission_dim=64)
    obs = jax.random.randint(key, (5, 7, 7, 3), 0, 12, jnp.uint8)
    mission = jax.random.randint(key, (5, 64), -1, 400, jnp.int32)
    base = agent_mod.make_view_features(12)
    fn = mission_mod.make_mission_features(base)
    np.testing.assert_array_equal(
        np.asarray(fn(params, (obs, mission))),
        np.asarray(base(params, obs)),
    )


def test_featurize_wildcards_and_positions():
    m = jnp.asarray([[-1, 0, 3, 484]], jnp.int32)
    f = np.asarray(mission_mod.featurize(m))
    assert f.shape == (1, 4 * (mission_mod.ONE_HOT + 1))
    per = mission_mod.ONE_HOT + 1
    # -1 → one-hot bin 0; 484 clips to the top bin but keeps its scalar
    assert f[0, 0] == 1.0
    assert f[0, 3 * per + mission_mod.ONE_HOT - 1] == 1.0
    assert f[0, 3 * per + per - 1] == pytest.approx(484 / 512)


@pytest.fixture(scope="module")
def fetch_setup():
    env = JaxVectorEnv("MiniGrid-Fetch-5x5-N2-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=2)
    tr = Trainer(cfg, env, num_iterations=5, mission_conditioning=True)
    params = init_agent_params(
        jax.random.PRNGKey(0), env.num_actions, mission_dim=env.mission_dim)
    return env, cfg, tr, params


def test_replay_matches_rollout_logprobs(fetch_setup):
    """At unchanged parameters, recomputing logprobs from the stored
    (obs, mission) pairs must reproduce the rollout's logprobs exactly —
    any misalignment between stored image and stored mission breaks it."""
    env, cfg, tr, params = fetch_setup
    assert tr.view_mode, "mission conditioning keeps the view fast path"
    state = tr.init_state(params, 0)
    state2, batch = jax.jit(tr._rollout)(state, None)
    assert isinstance(batch.obs, tuple) and batch.obs[1].shape == (
        cfg.num_steps, cfg.num_envs, env.mission_dim)
    flat = tr._flatten({"obs": batch.obs, "actions": batch.actions,
                        "logprobs": batch.logprobs})
    logp, _, _, _ = agent_mod.evaluate_actions(
        state2.params, flat["obs"], flat["actions"], tr.features_fn)
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(flat["logprobs"]), rtol=1e-6, atol=1e-6)


def test_training_updates_film_head(fetch_setup):
    env, cfg, tr, params = fetch_setup
    state = tr.init_state(params, 0)
    for it in range(1, 4):
        state, scalars, ep = tr.run_iteration(state, it)
        logs, _ = tr.fetch_logs(scalars, ep)
        assert np.isfinite(logs["policy_loss"])
    w = np.asarray(state.params["mission"]["film"]["w"])
    assert np.abs(w).max() > 0.0, "gradients must flow into the FiLM head"


def test_mission_dp2_runs_and_dp1_matches_unsharded():
    from clip_ppo_tpu.parallel.mesh import make_mesh

    def run(mesh, bonus=0.0):
        env = JaxVectorEnv("MiniGrid-Fetch-5x5-N2-v0", 4)
        cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2,
                        update_epochs=2)
        tr = Trainer(cfg, env, num_iterations=3, mission_conditioning=True,
                     mesh=mesh, exploration_bonus=bonus)
        params = init_agent_params(
            jax.random.PRNGKey(0), env.num_actions,
            mission_dim=env.mission_dim)
        state = tr.init_state(params, 0)
        out = []
        for it in range(1, 4):
            state, scalars, ep = tr.run_iteration(state, it)
            out.append(tr.fetch_logs(scalars, ep)[0])
        return out

    base = run(None)
    dp1 = run(make_mesh(num_devices=1))
    for a, b in zip(base, dp1):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k, equal_nan=True)
    # dp2 + exploration bonus: composes, finite, intrinsic flows
    logs = run(make_mesh(num_devices=2), bonus=0.02)
    assert np.isfinite(logs[-1]["policy_loss"])
    assert logs[-1]["intrinsic_reward"] > 0.0


def test_clip_cli_mission_composes_with_text_modality(tmp_path, monkeypatch):
    """--mission-conditioning on the CLIP-PPO MiniGrid CLI: composes
    with the text modality (the CLIP loss rides batch.desc, the policy
    rides (obs, mission))."""
    import glob
    import os

    from clip_ppo_tpu.models import clip_utils
    from clip_ppo_tpu.models.clip import CLIPConfig
    from clip_ppo_tpu.models.clip.model import init_clip_params

    # embed_dim must match the 512-d agent latent (the reference's
    # cosine-loss dim check, `clip_ppo_utils.py:62-64`)
    tiny = CLIPConfig(
        embed_dim=512, image_size=224, patch_size=56, vision_width=64,
        vision_layers=1, vision_heads=2, text_width=64, text_heads=2,
        text_layers=1, vocab_size=512, context_length=77,
    )
    cp = init_clip_params(jax.random.PRNGKey(0), tiny)
    monkeypatch.setattr(clip_utils, "load_clip_model",
                        lambda *a, **k: (cp, tiny))

    from clip_ppo_tpu.cli.clip_ppo_minigrid import (
        Args, MiniGridClipPPOConfig, train,
    )

    args = Args(
        env_id="MiniGrid-Fetch-5x5-N2-v0", total_timesteps=64,
        num_envs=2, num_steps=16, num_minibatches=2, update_epochs=1,
        capture_video=False, verbose=False, save_model=False,
        mission_conditioning=True,
        clip_config=MiniGridClipPPOConfig(
            clip_lambda=1e-5, clip_modality="text"),
    )
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        out = train(args, run_name="t_mission_text")
    finally:
        os.chdir(cwd)
    assert out["global_step"] == 64
    assert glob.glob(str(tmp_path / "runs" / "t_mission_text" / "events*"))


def test_cli_flag_and_checkpoint_roundtrip(tmp_path):
    import shutil

    from clip_ppo_tpu.cli import ppo_minigrid as cli

    args = cli.Args(
        env_id="MiniGrid-Fetch-5x5-N2-v0", total_timesteps=512,
        num_envs=4, num_steps=16, num_minibatches=2, update_epochs=1,
        capture_video=False, mission_conditioning=True,
        save_model=True, save_freq=512, model_path=str(tmp_path),
        exp_name="test_mission_cli", seed=3,
    )
    out = cli.train(args, run_name="test_mission_cli")
    assert out["global_step"] == 512
    ckpts = list(tmp_path.glob("*_final*"))
    assert ckpts, "final checkpoint written"
    # the payload round-trips the FiLM head
    from clip_ppo_tpu.io import load_checkpoint

    env = JaxVectorEnv(args.env_id, args.num_envs)
    template = init_agent_params(
        jax.random.PRNGKey(0), env.num_actions, mission_dim=env.mission_dim)
    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=1, mission_conditioning=True)
    st = tr.init_state(template, 0)
    params, _, it, gs, _ = load_checkpoint(
        str(ckpts[0]), st.params, st.opt_state)
    assert "mission" in params and gs == 512
    shutil.rmtree("runs/test_mission_cli", ignore_errors=True)


# -- recurrent composition (r5: --mission-conditioning + --recurrent) --------


def _rec_mission_setup(mesh=None, mission=True, num_steps=16):
    from clip_ppo_tpu.models import recurrent as rec

    env = JaxVectorEnv("MiniGrid-Fetch-5x5-N2-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=num_steps, num_minibatches=2,
                    update_epochs=2)
    tr = Trainer(cfg, env, num_iterations=5, recurrent=True,
                 mission_conditioning=mission, mesh=mesh)
    params = rec.init_agent_params_recurrent(
        jax.random.PRNGKey(0), env.num_actions,
        mission_dim=env.mission_dim if mission else 0)
    return env, cfg, tr, params


def test_recurrent_mission_rollout_identity_at_init():
    """Zero-init FiLM through the LSTM: the conditioned recurrent agent's
    rollout equals the unconditioned one's exactly at init, and the batch
    stores (obs, mission) pairs."""
    env, cfg, tr_c, params_c = _rec_mission_setup(mission=True)
    _, _, tr_u, params_u = _rec_mission_setup(mission=False)
    _, batch_c = jax.jit(tr_c._rollout)(tr_c.init_state(params_c, 0), None)
    _, batch_u = jax.jit(tr_u._rollout)(tr_u.init_state(params_u, 0), None)
    assert isinstance(batch_c.obs, tuple) and batch_c.obs[1].shape == (
        cfg.num_steps, cfg.num_envs, env.mission_dim)
    np.testing.assert_array_equal(np.asarray(batch_c.actions),
                                  np.asarray(batch_u.actions))
    np.testing.assert_allclose(np.asarray(batch_c.logprobs),
                               np.asarray(batch_u.logprobs), rtol=1e-6)


def test_recurrent_mission_replay_matches_rollout_logprobs():
    """At unchanged parameters the recurrent sequence replay over stored
    (obs, mission) pairs reproduces the rollout's logprobs exactly —
    image/mission misalignment or pair-blind env slicing breaks it."""
    from clip_ppo_tpu.train import ppo as ppo_mod

    env, cfg, tr, params = _rec_mission_setup(num_steps=64)
    state = tr.init_state(params, 0)
    init_lstm = state.lstm_state
    state2, batch = jax.jit(tr._rollout)(state, None)
    data = tr._data2d(state2, batch, None)
    mb = dict(data)
    mb["h0"], mb["c0"] = init_lstm
    _, aux = ppo_mod.recurrent_loss(state2.params, mb, cfg, tr.features_fn)
    assert abs(float(aux["approx_kl"])) < 1e-9
    assert abs(float(aux["old_approx_kl"])) < 1e-9


def test_recurrent_mission_trains_and_updates_film():
    env, cfg, tr, params = _rec_mission_setup()
    state = tr.init_state(params, 0)
    for it in range(1, 4):
        state, scalars, ep = tr.run_iteration(state, it)
        logs, _ = tr.fetch_logs(scalars, ep)
        assert np.isfinite(logs["policy_loss"])
    w = np.asarray(state.params["mission"]["film"]["w"])
    assert np.abs(w).max() > 0.0, "gradients must flow into the FiLM head"


def test_recurrent_mission_dp1_matches_unsharded_and_dp2_runs():
    from clip_ppo_tpu.parallel.mesh import make_mesh

    def run(mesh):
        _, _, tr, params = _rec_mission_setup(mesh=mesh, num_steps=8)
        state = tr.init_state(params, 0)
        out = []
        for it in range(1, 4):
            state, scalars, ep = tr.run_iteration(state, it)
            out.append(tr.fetch_logs(scalars, ep)[0])
        return out

    base = run(None)
    dp1 = run(make_mesh(num_devices=1))
    for a, b in zip(base, dp1):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k, equal_nan=True)
    logs = run(make_mesh(num_devices=2))
    assert np.isfinite(logs[-1]["policy_loss"])
