"""Pure-JAX Atari (Breakout/Pong): dynamics, rendering, vector env, CLIs."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.atari import core
from clip_ppo_tpu.envs.atari.vector import AtariVectorEnv


class TestBreakout:
    def test_reset(self):
        s = core.breakout_reset(jax.random.PRNGKey(0))
        assert int(s.lives) == core.BK_LIVES
        assert bool(s.auto_fire)
        assert not bool(s.in_play)
        assert bool(s.bricks.all())

    def test_auto_fire_launches(self):
        s = core.breakout_reset(jax.random.PRNGKey(0))
        s, _, _, _ = core.breakout_step(s, jnp.int32(0))  # NOOP still serves
        assert bool(s.in_play)
        assert float(s.ball_vy) != 0.0

    def test_paddle_moves_and_clamps(self):
        s = core.breakout_reset(jax.random.PRNGKey(0))
        x0 = float(s.paddle_x)
        s, _, _, _ = core.breakout_step(s, jnp.int32(2))  # RIGHT
        assert float(s.paddle_x) == x0 + core.BK_PADDLE_SPEED * core.SUBSTEPS
        for _ in range(40):
            s, _, _, _ = core.breakout_step(s, jnp.int32(3))  # LEFT
        assert float(s.paddle_x) == core.BK_SIDE

    def test_brick_hit_scores_and_bounces(self):
        s = core.breakout_reset(jax.random.PRNGKey(0))
        # Place the ball just under the bottom brick row, moving up.
        s = dataclasses.replace(
            s,
            in_play=jnp.bool_(True),
            auto_fire=jnp.bool_(False),
            ball_x=jnp.float32(80.0),
            ball_y=jnp.float32(core.BK_BRICK_Y0 + core.BK_ROWS * core.BK_BRICK_H + 2),
            ball_vx=jnp.float32(0.0),
            ball_vy=jnp.float32(-2.0),
        )
        total = 0.0
        for _ in range(3):
            s, r, _, _ = core.breakout_step(s, jnp.int32(0))
            total += float(r)
        assert total > 0
        assert not bool(s.bricks.all())
        assert int(s.score) == int(total)

    def test_life_loss_is_episodic_done(self):
        s = core.breakout_reset(jax.random.PRNGKey(0))
        s = dataclasses.replace(
            s,
            in_play=jnp.bool_(True),
            auto_fire=jnp.bool_(False),
            ball_x=jnp.float32(30.0),
            ball_y=jnp.float32(195.0),
            ball_vx=jnp.float32(0.0),
            ball_vy=jnp.float32(2.0),
            paddle_x=jnp.float32(120.0),  # far from the ball
        )
        done = False
        for _ in range(6):
            s, _, d, game_over = core.breakout_step(s, jnp.int32(0))
            done = done or bool(d)
        assert done
        assert int(s.lives) == core.BK_LIVES - 1
        assert not bool(game_over)
        assert bool(s.auto_fire) or bool(s.in_play)  # re-serve pending/served

    def test_render_shows_bricks_and_paddle(self):
        s = core.breakout_reset(jax.random.PRNGKey(0))
        img = np.asarray(core.breakout_render(s))
        assert img.shape == (84, 84) and img.dtype == np.uint8
        assert (img > 0).sum() > 300  # bricks + walls + paddle visible
        # Kill all bricks → fewer lit pixels.
        s2 = dataclasses.replace(s, bricks=jnp.zeros_like(s.bricks))
        img2 = np.asarray(core.breakout_render(s2))
        assert (img2 > 0).sum() < (img > 0).sum()


class TestPong:
    def test_serve_and_motion(self):
        s = core.pong_reset(jax.random.PRNGKey(1))
        for _ in range(4):
            s, _, _, _ = core.pong_step(s, jnp.int32(0))
        assert float(s.ball_vx) != 0.0

    def test_player_paddle_moves(self):
        s = core.pong_reset(jax.random.PRNGKey(0))
        y0 = float(s.player_y)
        s, _, _, _ = core.pong_step(s, jnp.int32(2))  # up
        assert float(s.player_y) < y0
        s, _, _, _ = core.pong_step(s, jnp.int32(3))  # down
        assert float(s.player_y) == pytest.approx(y0)

    def test_enemy_miss_scores_player_point(self):
        s = core.pong_reset(jax.random.PRNGKey(0))
        # Ball headed to the far left, enemy paddle parked far away.
        s = dataclasses.replace(
            s,
            serve_wait=jnp.int32(0),
            ball_x=jnp.float32(30.0),
            ball_y=jnp.float32(PG_MID := 110.0),
            ball_vx=jnp.float32(-2.0),
            ball_vy=jnp.float32(0.0),
            enemy_y=jnp.float32(core.PG_TOP),
        )
        total = 0.0
        for _ in range(8):
            s, r, _, _ = core.pong_step(s, jnp.int32(0))
            total += float(r)
        assert total == 1.0
        assert int(s.player_score) == 1
        assert int(s.serve_wait) > 0  # pause before next serve

    def test_game_over_at_21(self):
        s = core.pong_reset(jax.random.PRNGKey(0))
        s = dataclasses.replace(s, enemy_score=jnp.int32(20),
                                serve_wait=jnp.int32(0),
                                ball_x=jnp.float32(157.0),
                                ball_vx=jnp.float32(2.0))
        s, r, done, game_over = core.pong_step(s, jnp.int32(0))
        assert bool(game_over) and bool(done)
        assert float(r) == -1.0

    def test_render(self):
        s = core.pong_reset(jax.random.PRNGKey(0))
        img = np.asarray(core.pong_render(s))
        assert img.shape == (84, 84)
        assert (img == core.PG_BG_GRAY).mean() > 0.5  # background dominates
        assert (img == core.PG_FG_GRAY).sum() > 10    # paddles + bands


class TestVectorEnv:
    def test_reset_step_shapes(self):
        env = AtariVectorEnv("ALE/Breakout-v5", 4)
        obs, _ = env.reset(seed=0)
        assert obs.shape == (4, 84, 84, 4) and obs.dtype == np.uint8
        obs, r, term, trunc, infos = env.step(np.ones(4, np.int32))
        assert obs.shape == (4, 84, 84, 4)
        assert r.shape == (4,)

    def test_frame_stack_shifts(self):
        env = AtariVectorEnv("ALE/Pong-v5", 2)
        state, obs0 = env.reset_fn(jax.random.PRNGKey(0))
        state, obs1, *_ = env.step_fn(state, jnp.zeros(2, jnp.int32))
        np.testing.assert_array_equal(
            np.asarray(obs0[..., 1:]), np.asarray(obs1[..., :3])
        )

    def test_reward_clipping(self):
        env = AtariVectorEnv("ALE/Breakout-v5", 1, clip_rewards=True)
        # High-value brick rows yield raw reward 4 or 7 → clipped to 1.
        state, _ = env.reset_fn(jax.random.PRNGKey(0))
        bricks_env = dataclasses.replace(
            state.env,
            in_play=jnp.ones(1, bool),
            auto_fire=jnp.zeros(1, bool),
            ball_x=jnp.full((1,), 80.0, jnp.float32),
            ball_y=jnp.full((1,), core.BK_BRICK_Y0 + 38.0, jnp.float32),
            ball_vx=jnp.zeros(1, jnp.float32),
            ball_vy=jnp.full((1,), -2.0, jnp.float32),
        )
        state = dataclasses.replace(state, env=bricks_env)
        got = 0.0
        for _ in range(6):
            state, _, r, *_ = env.step_fn(state, jnp.zeros(1, jnp.int32))
            got += float(r[0])
            assert float(r[0]) in (0.0, 1.0)
        assert got >= 1.0

    def test_parse_rejects_unknown(self):
        with pytest.raises(ValueError):
            core.parse_atari_id("ALE/MsPacman-v5")

    def test_action_spaces(self):
        assert AtariVectorEnv("ALE/Breakout-v5", 1).num_actions == 4
        assert AtariVectorEnv("ALE/Pong-v5", 1).num_actions == 6
        assert AtariVectorEnv("BreakoutNoFrameskip-v4", 1).num_actions == 4


class TestDescriptions:
    def test_breakout_format(self):
        env = AtariVectorEnv("ALE/Breakout-v5", 2)
        state, _ = env.reset_fn(jax.random.PRNGKey(0))
        descs = env.describe(state)
        assert len(descs) == 2
        assert descs[0].startswith("Breakout score 0, ball (")
        assert "lives 5" in descs[0]
        # One of the contextual phrases is always appended.
        assert any(
            p in descs[0]
            for p in ("near paddle danger zone", "near paddle safe",
                      "ball danger zone", "ball hitting bricks")
        )

    def test_pong_format(self):
        env = AtariVectorEnv("ALE/Pong-v5", 1)
        state, _ = env.reset_fn(jax.random.PRNGKey(0))
        descs = env.describe(state)
        assert descs[0].startswith("Pong score 0-0, ball (")
        assert "player paddle (" in descs[0]
        assert "computer paddle (" in descs[0]


class TestTraining:
    def test_ppo_atari_smoke(self, tmp_path, monkeypatch):
        import os

        from clip_ppo_tpu.cli import ppo_atari

        monkeypatch.chdir(tmp_path)
        args = ppo_atari.Args(
            env_id="ALE/Breakout-v5",
            total_timesteps=64,
            num_envs=2,
            num_steps=16,
            num_minibatches=2,
            update_epochs=1,
            capture_video=False,
        )
        out = ppo_atari.train(args, run_name="t_atari")
        assert out["global_step"] == 64
