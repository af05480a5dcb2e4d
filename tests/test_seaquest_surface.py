"""Seaquest surface rules: no camping fixed point, first arrival free."""

import dataclasses

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.atari import seaquest as sq


def _at_surface(s):
    return dataclasses.replace(
        s, sub_y=jnp.float32(sq.SURFACE_Y - 2.0),
        oxygen=jnp.float32(sq.OXYGEN_MAX * 0.5),
    )


def test_first_arrival_with_no_divers_is_free():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    s = _at_surface(s)  # surfaced_once is False
    s, r, done, _ = sq.seaquest_step(s, jnp.int32(0))
    assert not bool(done)
    assert float(s.oxygen) == sq.OXYGEN_MAX  # refilled


def test_lingering_with_no_divers_costs_life():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    s = _at_surface(s)
    s, _, d1, _ = sq.seaquest_step(s, jnp.int32(0))  # free arrival
    assert not bool(d1)
    # Agent keeps holding position at the surface → death (no camping).
    s = dataclasses.replace(s, sub_y=jnp.float32(sq.SURFACE_Y - 2.0))
    s, _, d2, _ = sq.seaquest_step(s, jnp.int32(0))
    assert bool(d2)
    assert int(s.lives) == sq.LIVES - 1


def test_lingering_with_divers_banks_until_empty_then_dies():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    s = dataclasses.replace(_at_surface(s), divers_held=jnp.int32(2))
    total = 0.0
    deaths = 0
    for _ in range(5):
        s, r, d, _ = sq.seaquest_step(s, jnp.int32(0))
        total += float(r)
        if bool(d):
            deaths += 1
            break
        # hold at the surface
        s = dataclasses.replace(s, sub_y=jnp.float32(sq.SURFACE_Y - 2.0))
    assert total >= 100.0  # two divers banked at 50 each
    assert deaths == 1     # then camping killed it


def test_full_rescue_bonus():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    s = dataclasses.replace(_at_surface(s), divers_held=jnp.int32(sq.MAX_DIVERS))
    s, r, done, _ = sq.seaquest_step(s, jnp.int32(0))
    assert float(r) >= 300.0  # 50 + 250 bonus
    assert int(s.divers_held) == 0
    assert not bool(done)


def test_diver_speed_single_multiplier():
    s = sq.seaquest_reset(jax.random.PRNGKey(0))
    s = dataclasses.replace(
        s,
        diver_x=s.diver_x.at[0].set(80.0),
        diver_y=s.diver_y.at[0].set(170.0),  # below the sub — no pickup
        diver_dir=s.diver_dir.at[0].set(sq.DIVER_SPEED),
        diver_active=s.diver_active.at[0].set(True),
    )
    s2, *_ = sq.seaquest_step(s, jnp.int32(0))
    moved = float(s2.diver_x[0]) - 80.0
    assert moved == sq.DIVER_SPEED * sq.SUBSTEPS  # not SPEED² per frame
