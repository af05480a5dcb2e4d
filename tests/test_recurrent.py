"""Recurrent (LSTM) PPO — a beyond-reference capability (the reference's
agents are all feed-forward, `ppo_minigrid.py:128-162`; the MiniGrid
Memory family requires recurrence, docs/PERFORMANCE.md).

Pins: cell math vs the torch.nn.LSTMCell oracle, episode-boundary
resets, BPTT through the sequence replay, rollout↔update logprob
consistency at unchanged parameters (the classic off-by-one hazard of
recurrent PPO), and end-to-end training through Trainer + the CLI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import recurrent as rec
from clip_ppo_tpu.train import PPOConfig, Trainer
from clip_ppo_tpu.train import ppo as ppo_mod


def test_lstm_step_matches_torch_cell():
    import torch

    key = jax.random.PRNGKey(0)
    p = rec.init_lstm(key, 12, 8)
    # random bias to exercise the b = b_ih + b_hh sum
    p = dict(p, b=jax.random.normal(jax.random.PRNGKey(1), (32,)) * 0.1)

    cell = torch.nn.LSTMCell(12, 8)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(p["w_ih"]).T))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(p["w_hh"]).T))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["b"])))
        cell.bias_hh.zero_()

    x = np.random.RandomState(0).randn(4, 12).astype(np.float32)
    h0 = np.random.RandomState(1).randn(4, 8).astype(np.float32)
    c0 = np.random.RandomState(2).randn(4, 8).astype(np.float32)

    h_j, (h2, c2) = rec.lstm_step(p, jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0)))
    with torch.no_grad():
        h_t, c_t = cell(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))
    np.testing.assert_allclose(np.asarray(h2), h_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), c_t.numpy(), atol=1e-5)


def test_init_orthogonal_zero_bias():
    p = rec.init_lstm(jax.random.PRNGKey(0), 16, 16)
    assert np.allclose(np.asarray(p["b"]), 0.0)
    w = np.asarray(p["w_hh"])  # [16, 64] (wide): rows orthonormal
    np.testing.assert_allclose(w @ w.T, np.eye(16), atol=1e-5)


def test_masked_step_resets_state_where_done():
    p = rec.init_lstm(jax.random.PRNGKey(0), 4, 6)
    x = jnp.ones((3, 4))
    h = jnp.full((3, 6), 5.0)
    c = jnp.full((3, 6), -5.0)
    done = jnp.asarray([1.0, 0.0, 1.0])
    out_reset, _ = rec.masked_lstm_step(p, x, (h, c), done)
    out_fresh, _ = rec.lstm_step(p, x, (jnp.zeros((3, 6)), jnp.zeros((3, 6))))
    out_keep, _ = rec.lstm_step(p, x, (h, c))
    np.testing.assert_allclose(out_reset[0], out_fresh[0], atol=1e-6)
    np.testing.assert_allclose(out_reset[2], out_fresh[2], atol=1e-6)
    np.testing.assert_allclose(out_reset[1], out_keep[1], atol=1e-6)


def test_unroll_bptt_learns_a_memory_task():
    """Gradient flows through time: train the cell + a linear head to
    output the FIRST input of each sequence at the last step — impossible
    without carrying state."""
    import optax

    T, B, D, H = 6, 32, 4, 16
    k = jax.random.PRNGKey(0)
    params = {
        "lstm": rec.init_lstm(k, D, H),
        "w": jax.random.normal(jax.random.PRNGKey(1), (H, D)) * 0.1,
    }
    dones = jnp.zeros((T, B))

    def loss_fn(params, x):
        latents, _ = rec.unroll(
            params["lstm"], x, dones,
            (jnp.zeros((B, H)), jnp.zeros((B, H))),
        )
        pred = latents[-1] @ params["w"]
        return jnp.mean((pred - x[0]) ** 2)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        x = jax.random.normal(key, (T, B, D))
        loss, grads = jax.value_and_grad(loss_fn)(params, x)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(500):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    # x[0] is unit-variance noise, so a memoryless predictor is pinned at
    # MSE ≈ 1.0; well below half of the initial loss requires gradient
    # flow through all T cell steps.
    assert losses[-1] < 0.4 * losses[0], (losses[0], losses[-1])


@pytest.fixture(scope="module")
def recurrent_setup():
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 8)
    cfg = PPOConfig(num_envs=8, num_steps=32, num_minibatches=4,
                    update_epochs=2)
    tr = Trainer(cfg, env, num_iterations=40, recurrent=True)
    params = rec.init_agent_params_recurrent(
        jax.random.PRNGKey(0), env.num_actions)
    return env, cfg, tr, params


def test_replay_matches_rollout_logprobs():
    """At unchanged parameters, the update's sequence replay must
    reproduce the rollout's logprobs exactly (ratio = 1, approx_kl = 0) —
    any done-masking off-by-one breaks this. 128 steps > Empty-5x5's
    max_steps=100, so truncation guarantees episode boundaries inside the
    rollout and the reset path is genuinely replayed."""
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 8)
    cfg = PPOConfig(num_envs=8, num_steps=128, num_minibatches=4,
                    update_epochs=2)
    tr = Trainer(cfg, env, num_iterations=40, recurrent=True)
    params = rec.init_agent_params_recurrent(
        jax.random.PRNGKey(0), env.num_actions)
    state = tr.init_state(params, 0)
    init_lstm = state.lstm_state
    state2, batch = jax.jit(tr._rollout)(state, None)
    data = tr._data2d(state2, batch, None)
    mb = dict(data)
    mb["h0"], mb["c0"] = init_lstm
    _, aux = ppo_mod.recurrent_loss(state2.params, mb, cfg, tr.features_fn)
    assert abs(float(aux["approx_kl"])) < 1e-9
    assert abs(float(aux["old_approx_kl"])) < 1e-9
    # episodes end mid-rollout, so the reset path is genuinely exercised
    assert float(jnp.sum(batch.dones)) > 0


def test_view_fast_path_active(recurrent_setup):
    env, cfg, tr, params = recurrent_setup
    assert tr.view_mode, "recurrent + default CNN trunk keeps the view path"


def test_recurrent_training_improves_return(recurrent_setup):
    env, cfg, tr, params = recurrent_setup
    state = tr.init_state(params, 0)
    first, last = [], []
    for it in range(1, 41):
        state, scalars, ep = tr.run_iteration(state, it)
        rets = np.asarray(ep["episode_return"])[np.asarray(ep["done_mask"])]
        (first if it <= 5 else last).extend(rets.tolist())
    f, l = np.mean(first), np.mean(last[-200:])
    assert l > f + 0.1, (f, l)
    # hidden state carried across iterations
    assert float(jnp.linalg.norm(state.lstm_state[0])) > 0


def test_recurrent_requires_divisible_envs():
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 6)
    cfg = PPOConfig(num_envs=6, num_steps=8, num_minibatches=4)
    with pytest.raises(AssertionError, match="not divisible"):
        Trainer(cfg, env, num_iterations=2, recurrent=True)


def test_cli_recurrent_trains_and_checkpoints(tmp_path):
    from clip_ppo_tpu.cli import ppo_minigrid

    out = ppo_minigrid.train(
        ppo_minigrid.Args(
            env_id="MiniGrid-Empty-5x5-v0", seed=3, total_timesteps=4096,
            num_steps=32, capture_video=False, recurrent=True,
            model_path=str(tmp_path), save_freq=10**9,
        ),
        run_name="test_recurrent_cli",
    )
    assert out["global_step"] == 4096
    import glob
    import shutil

    assert glob.glob(str(tmp_path / "*_final.ckpt"))
    shutil.rmtree("runs/test_recurrent_cli", ignore_errors=True)


# ---------------------------------------------------------------------------
# recurrent + dp mesh (r4: the r3 restriction is lifted)
# ---------------------------------------------------------------------------


def test_recurrent_dp1_matches_unsharded():
    from clip_ppo_tpu.parallel.mesh import make_mesh

    def run(mesh):
        env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 4)
        cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2,
                        update_epochs=2)
        tr = Trainer(cfg, env, num_iterations=3, recurrent=True, mesh=mesh)
        params = rec.init_agent_params_recurrent(
            jax.random.PRNGKey(0), env.num_actions, in_channels=3,
            lstm_hidden=32)
        state = tr.init_state(params, 0)
        out = []
        for it in range(1, 4):
            state, scalars, ep = tr.run_iteration(state, it)
            out.append(tr.fetch_logs(scalars, ep)[0])
        return out, state

    base, _ = run(None)
    dp1, _ = run(make_mesh(num_devices=1))
    for a, b in zip(base, dp1):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k, equal_nan=True)


def test_recurrent_dp2_runs_replicated_and_eb_composes():
    from clip_ppo_tpu.parallel.mesh import make_mesh

    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 8)
    cfg = PPOConfig(num_envs=8, num_steps=8, num_minibatches=2,
                    update_epochs=2)
    tr = Trainer(cfg, env, num_iterations=3, recurrent=True,
                 mesh=make_mesh(num_devices=2), exploration_bonus=0.02)
    params = rec.init_agent_params_recurrent(
        jax.random.PRNGKey(0), env.num_actions, in_channels=3,
        lstm_hidden=32)
    state = tr.init_state(params, 0)
    for it in range(1, 4):
        state, scalars, ep = tr.run_iteration(state, it)
        logs, _ = tr.fetch_logs(scalars, ep)
        assert np.isfinite(logs["policy_loss"])
        assert logs["intrinsic_reward"] > 0.0
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 2
    np.testing.assert_array_equal(shards[0], shards[1])
    # the LSTM carry is env-sharded across the mesh
    assert state.lstm_state[0].sharding.spec[0] == "dp"


def test_recurrent_dp_divisibility_is_per_device():
    from clip_ppo_tpu.parallel.mesh import make_mesh

    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 8)
    # 8 envs / dp=4 -> 2 local envs; 4 minibatches cannot slice them
    cfg = PPOConfig(num_envs=8, num_steps=8, num_minibatches=4)
    with pytest.raises(AssertionError, match="per-device"):
        Trainer(cfg, env, num_iterations=2, recurrent=True,
                mesh=make_mesh(num_devices=4))
