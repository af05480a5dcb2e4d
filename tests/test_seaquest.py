"""Pure-JAX Seaquest: dynamics, oxygen/diver mechanics, vector env, PPO."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.atari import core, seaquest as sq
from clip_ppo_tpu.envs.atari.vector import AtariVectorEnv


def test_parse_and_actions():
    assert core.parse_atari_id("ALE/Seaquest-v5").game == "seaquest"
    assert AtariVectorEnv("ALE/Seaquest-v5", 1).num_actions == 18


def test_movement_and_bounds():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    x0, y0 = float(s.sub_x), float(s.sub_y)
    s, _, _, _ = sq.seaquest_step(s, jnp.int32(3))  # RIGHT
    assert float(s.sub_x) == x0 + sq.SUB_SPEED * sq.SUBSTEPS
    s, _, _, _ = sq.seaquest_step(s, jnp.int32(2))  # UP
    assert float(s.sub_y) < y0
    for _ in range(40):
        s, _, _, _ = sq.seaquest_step(s, jnp.int32(5))  # DOWN
    assert float(s.sub_y) == sq.WATER_BOTTOM - sq.SUB_H


def test_torpedo_kills_enemy_and_scores():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    # Plant an enemy directly to the right of the sub, then fire right.
    ey = float(s.sub_y)
    s = dataclasses.replace(
        s,
        enemy_x=s.enemy_x.at[0].set(float(s.sub_x) + 40.0),
        enemy_y=s.enemy_y.at[0].set(ey),
        enemy_dir=s.enemy_dir.at[0].set(0.0),
        enemy_active=s.enemy_active.at[0].set(True),
    )
    s, r, _, _ = sq.seaquest_step(s, jnp.int32(1))  # FIRE
    total = float(r)
    seen_dead = not bool(s.enemy_active[0])
    for _ in range(3):
        s, r, _, _ = sq.seaquest_step(s, jnp.int32(0))
        total += float(r)
        seen_dead = seen_dead or not bool(s.enemy_active[0])
    assert total == 20.0
    assert seen_dead  # the planted enemy died (slot may respawn later)
    assert int(s.score) == 20


def test_enemy_contact_costs_life():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    # Move away from the respawn point so the planted enemy doesn't kill
    # the respawned sub again within the same agent step.
    for _ in range(5):
        s, _, _, _ = sq.seaquest_step(s, jnp.int32(3))  # RIGHT
    s = dataclasses.replace(
        s,
        enemy_x=s.enemy_x.at[0].set(float(s.sub_x)),
        enemy_y=s.enemy_y.at[0].set(float(s.sub_y)),
        enemy_dir=s.enemy_dir.at[0].set(0.0),
        enemy_active=s.enemy_active.at[0].set(True),
    )
    s, _, done, game_over = sq.seaquest_step(s, jnp.int32(0))
    assert bool(done) and not bool(game_over)
    assert int(s.lives) == sq.LIVES - 1


def test_oxygen_depletes_and_costs_life():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    s = dataclasses.replace(s, oxygen=jnp.float32(0.05))
    s, _, done, _ = sq.seaquest_step(s, jnp.int32(0))
    assert bool(done)
    # Respawn refills (later substeps of the same step drain a little).
    assert float(s.oxygen) >= sq.OXYGEN_MAX - sq.SUBSTEPS * sq.OXYGEN_RATE


def test_diver_pickup_and_surface_bank():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    s = dataclasses.replace(
        s,
        diver_x=s.diver_x.at[0].set(float(s.sub_x)),
        diver_y=s.diver_y.at[0].set(float(s.sub_y)),
        diver_dir=s.diver_dir.at[0].set(0.0),
        diver_active=s.diver_active.at[0].set(True),
        oxygen=jnp.float32(sq.OXYGEN_MAX * 0.5),
        surfaced_once=jnp.bool_(True),
    )
    s, _, _, _ = sq.seaquest_step(s, jnp.int32(0))
    assert int(s.divers_held) == 1
    # Surface → bank the diver for 50 points, refill oxygen.
    total = 0.0
    for _ in range(30):
        s, r, done, _ = sq.seaquest_step(s, jnp.int32(2))  # UP
        total += float(r)
        assert not bool(done)
        if int(s.divers_held) == 0:
            break
    assert total == 50.0
    assert float(s.oxygen) == sq.OXYGEN_MAX


def test_surface_empty_after_first_costs_life():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    s = dataclasses.replace(
        s,
        surfaced_once=jnp.bool_(True),
        oxygen=jnp.float32(sq.OXYGEN_MAX * 0.5),
        sub_y=jnp.float32(sq.SURFACE_Y + 4.0),
    )
    done = False
    for _ in range(5):
        s, _, d, _ = sq.seaquest_step(s, jnp.int32(2))  # UP to surface
        if bool(d):
            done = True
            break
    assert done
    assert int(s.lives) == sq.LIVES - 1


def test_render():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    img = np.asarray(sq.seaquest_render(s))
    assert img.shape == (84, 84) and img.dtype == np.uint8
    assert (img == sq.SKY_GRAY).any() and (img == sq.WATER_GRAY).any()
    assert (img == sq.SUB_GRAY).sum() > 4   # sub visible
    assert (img == sq.OXY_GRAY).sum() > 10  # full oxygen bar


def test_descriptions_raise_like_reference():
    env = AtariVectorEnv("ALE/Seaquest-v5", 1)
    state, _ = env.reset_fn(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="not supported for CLIP PPO"):
        env.describe(state)


def test_ppo_trains_on_seaquest(tmp_path, monkeypatch):
    from clip_ppo_tpu.cli import ppo_atari

    monkeypatch.chdir(tmp_path)
    args = ppo_atari.Args(
        env_id="ALE/Seaquest-v5",
        total_timesteps=64,
        num_envs=2,
        num_steps=16,
        num_minibatches=2,
        update_epochs=1,
        capture_video=False,
    )
    out = ppo_atari.train(args, run_name="t_sq")
    assert out["global_step"] == 64
