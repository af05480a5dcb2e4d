"""Golden tests for GAE and the PPO update math (SURVEY §4c)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import PPOConfig, compute_gae, make_optimizer
from clip_ppo_tpu.train import ppo as ppo_mod


def reference_gae(rewards, values, dones, next_value, next_done, gamma, lam):
    """Reference GAE loop re-derived in NumPy (`ppo_minigrid.py:275-288`)."""
    T, N = rewards.shape
    advantages = np.zeros_like(rewards)
    lastgaelam = np.zeros(N)
    for t in reversed(range(T)):
        if t == T - 1:
            nextnonterminal = 1.0 - next_done
            nextvalues = next_value
        else:
            nextnonterminal = 1.0 - dones[t + 1]
            nextvalues = values[t + 1]
        delta = rewards[t] + gamma * nextvalues * nextnonterminal - values[t]
        advantages[t] = lastgaelam = (
            delta + gamma * lam * nextnonterminal * lastgaelam
        )
    return advantages, advantages + values


class TestGAE:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference_loop(self, seed):
        rng = np.random.RandomState(seed)
        T, N = 16, 4
        rewards = rng.randn(T, N).astype(np.float32)
        values = rng.randn(T, N).astype(np.float32)
        dones = (rng.rand(T, N) < 0.1).astype(np.float32)
        next_value = rng.randn(N).astype(np.float32)
        next_done = (rng.rand(N) < 0.5).astype(np.float32)
        adv, ret = compute_gae(
            jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
            jnp.asarray(next_value), jnp.asarray(next_done), 0.99, 0.95,
        )
        ref_adv, ref_ret = reference_gae(
            rewards, values, dones, next_value, next_done, 0.99, 0.95
        )
        np.testing.assert_allclose(np.asarray(adv), ref_adv, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ret), ref_ret, rtol=1e-5, atol=1e-5)

    def test_terminal_blocks_bootstrap(self):
        # A done at t+1 must cut the value propagation from t+1 to t.
        rewards = jnp.zeros((2, 1))
        values = jnp.asarray([[0.0], [100.0]])
        dones = jnp.asarray([[0.0], [1.0]])
        adv, _ = compute_gae(
            rewards, values, dones, jnp.asarray([50.0]), jnp.asarray([0.0]),
            0.99, 0.95,
        )
        assert float(adv[0, 0]) == 0.0  # no leak from v=100 or bootstrap


def _tiny_batch(key, cfg, num_actions=7):
    ks = jax.random.split(key, 6)
    bs = cfg.batch_size
    return {
        "obs": jax.random.randint(ks[0], (bs, 84, 84, 3), 0, 255, jnp.int32).astype(jnp.uint8),
        "actions": jax.random.randint(ks[1], (bs,), 0, num_actions),
        "logprobs": -jnp.abs(jax.random.normal(ks[2], (bs,))),
        "advantages": jax.random.normal(ks[3], (bs,)),
        "returns": jax.random.normal(ks[4], (bs,)),
        "values": jax.random.normal(ks[5], (bs,)),
    }


class TestPPOLoss:
    def setup_method(self, _):
        self.cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2)
        self.params = init_agent_params(jax.random.PRNGKey(0), 7)
        self.batch = _tiny_batch(jax.random.PRNGKey(1), self.cfg)

    def test_loss_matches_numpy_oracle(self):
        cfg, params = self.cfg, self.params
        mb = {k: v[: cfg.minibatch_size] for k, v in self.batch.items()}
        loss, aux = ppo_mod.ppo_loss(
            params, mb, cfg, agent_mod.cnn_features, None, 0.0, False
        )
        # Recompute from the network's own outputs with NumPy.
        newlogprob, entropy, newvalue, _ = agent_mod.evaluate_actions(
            params, mb["obs"], mb["actions"]
        )
        nl, ent, nv = map(np.asarray, (newlogprob, entropy, newvalue))
        ol, adv, ret, val = map(
            np.asarray, (mb["logprobs"], mb["advantages"], mb["returns"], mb["values"])
        )
        logratio = nl - ol
        ratio = np.exp(logratio)
        a = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = np.maximum(-a * ratio, -a * np.clip(ratio, 0.9, 1.1)).mean()
        v_unc = (nv - ret) ** 2
        v_cl = (val + np.clip(nv - val, -0.1, 0.1) - ret) ** 2
        v = 0.5 * np.maximum(v_unc, v_cl).mean()
        expected = pg - cfg.ent_coef * ent.mean() + cfg.vf_coef * v
        np.testing.assert_allclose(float(loss), expected, rtol=2e-5)
        np.testing.assert_allclose(float(aux["pg_loss"]), pg, rtol=2e-5)
        np.testing.assert_allclose(float(aux["v_loss"]), v, rtol=2e-5)
        np.testing.assert_allclose(
            float(aux["approx_kl"]), ((ratio - 1) - logratio).mean(), rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            float(aux["clipfrac"]),
            (np.abs(ratio - 1.0) > cfg.clip_coef).mean(),
            rtol=1e-6,
        )

    def test_update_changes_params_and_is_deterministic(self):
        cfg, params = self.cfg, self.params
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        p1, _, m1 = ppo_mod.update_epochs(
            params, opt_state, self.batch, jax.random.PRNGKey(7), cfg, opt
        )
        p2, _, m2 = ppo_mod.update_epochs(
            params, opt_state, self.batch, jax.random.PRNGKey(7), cfg, opt
        )
        # Deterministic given the key.
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            p1, p2,
        )
        # Parameters actually moved.
        moved = jax.tree_util.tree_reduce(
            lambda acc, pair: acc, [0]
        )
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), p1, params
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0
        assert np.isfinite(float(m1.approx_kl))

    def test_grad_respects_global_norm_clip(self):
        cfg = self.cfg
        opt = make_optimizer(cfg)
        opt_state = opt.init(self.params)
        _, _, m = ppo_mod.update_epochs(
            self.params, opt_state, self.batch, jax.random.PRNGKey(3), cfg, opt
        )
        assert float(m.grad_norm) >= 0.0  # recorded pre-clip norm

    def test_lr_anneal_schedule(self):
        cfg = PPOConfig(learning_rate=2.5e-4)
        n = 100
        lr1 = float(ppo_mod.anneal_lr(cfg, jnp.int32(1), n))
        lr50 = float(ppo_mod.anneal_lr(cfg, jnp.int32(51), n))
        lr_last = float(ppo_mod.anneal_lr(cfg, jnp.int32(100), n))
        assert lr1 == pytest.approx(2.5e-4, rel=1e-5)
        assert lr50 == pytest.approx(2.5e-4 * 0.5, rel=1e-5)
        assert lr_last == pytest.approx(2.5e-4 * 0.01, rel=1e-4)

    def test_clip_loss_precomputed_is_monitor_only(self):
        # Text modality: detached latents + constant embeddings → zero grad,
        # but the loss value is reported (`SURVEY §7 hard part 4`).
        cfg = dataclasses.replace(self.cfg, clip_mode="precomputed")
        mb = {k: v[: cfg.minibatch_size] for k, v in self.batch.items()}
        emb = jax.random.normal(jax.random.PRNGKey(9), (cfg.minibatch_size, 512))

        def loss_with_clip(params):
            loss, aux = ppo_mod.ppo_loss(
                params, mb, cfg, agent_mod.cnn_features, emb,
                jnp.float32(1.0), jnp.bool_(True),
            )
            return aux["clip_loss"]

        g = jax.grad(lambda p: loss_with_clip(p))(self.params)
        assert max(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()), g)
        )) == 0.0
        assert float(loss_with_clip(self.params)) > 0.0

    def test_clip_loss_projected_trains_projection_only(self):
        cfg = dataclasses.replace(self.cfg, clip_mode="projected")
        params = init_agent_params(
            jax.random.PRNGKey(0), 7, with_temporal_projection=True
        )
        mb = {k: v[: cfg.minibatch_size] for k, v in self.batch.items()}
        emb = jax.random.normal(jax.random.PRNGKey(9), (cfg.minibatch_size, 2048))

        def clip_only(p):
            _, aux = ppo_mod.ppo_loss(
                p, mb, cfg, agent_mod.cnn_features, emb,
                jnp.float32(1.0), jnp.bool_(True),
            )
            return aux["clip_loss"]

        g = jax.grad(clip_only)(params)
        tp_grad = max(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()), g["temporal_projection"])
        ))
        trunk_grad = max(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()), g["trunk"])
        ))
        assert tp_grad > 0.0 and trunk_grad == 0.0

    def test_clip_gating_frequency(self):
        # use_clip flag pattern: counter % 4 == 0.
        assert ppo_mod.CLIP_LOSS_FREQUENCY == 4


class TestAgent:
    def test_architecture_shapes(self):
        params = init_agent_params(jax.random.PRNGKey(0), 7)
        assert params["trunk"]["conv1"]["w"].shape == (8, 8, 3, 32)
        assert params["trunk"]["fc"]["w"].shape == (64 * 7 * 7, 512)
        assert params["actor"]["w"].shape == (512, 7)
        obs = jnp.zeros((4, 84, 84, 3), jnp.uint8)
        a, lp, ent, v = agent_mod.get_action_and_value(
            params, obs, jax.random.PRNGKey(1)
        )
        assert a.shape == (4,) and v.shape == (4,)
        assert float(ent[0]) > 0

    def test_orthogonal_init_scaling(self):
        params = init_agent_params(jax.random.PRNGKey(0), 7)
        w = np.asarray(params["actor"]["w"])  # std=0.01 orthogonal
        s = np.linalg.svd(w, compute_uv=False)
        np.testing.assert_allclose(s, 0.01, atol=1e-6)
        w2 = np.asarray(params["critic"]["w"])
        s2 = np.linalg.svd(w2, compute_uv=False)
        np.testing.assert_allclose(s2, 1.0, atol=1e-6)

    def test_latent_is_stop_gradient(self):
        params = init_agent_params(jax.random.PRNGKey(0), 7)
        obs = jnp.ones((2, 84, 84, 3), jnp.uint8)
        g = jax.grad(
            lambda p: agent_mod.get_latent_representation(p, obs).sum()
        )(params)
        assert max(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: float(jnp.abs(x).max()), g)
        )) == 0.0
