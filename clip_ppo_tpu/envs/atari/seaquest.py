"""Pure-JAX Seaquest: the third env of the reference's experiment grid.

`run_experiments.py:100-104` sweeps ALE/Breakout-v5, ALE/Pong-v5 and
ALE/Seaquest-v5 (image modality forced at `:37`, so no RAM descriptions
are needed — `generate_atari_descriptions` raises for Seaquest,
`clip_ppo_atari.py:445-462`, and this backend mirrors that). Like the
Breakout/Pong cores this is a native reimplementation of the game, not an
emulator port: ALE screen coordinates (160×210), 84×84 grayscale
renderer, frame-skip 4 folded in.

Game model (the mechanics that matter for learning):
* player submarine moves in 8 directions within the water, fires one
  torpedo at a time in its facing direction;
* enemy fish and enemy subs stream in horizontally from alternating
  sides in four depth lanes; contact kills, torpedo hits score 20;
* divers drift across lanes and are collected on contact (up to 6);
* oxygen drains while submerged; surfacing refills it — with ≥1 diver
  aboard one diver is banked (50 pts each), with all 6 a full-rescue
  bonus; surfacing with none, or oxygen hitting zero, costs a life
  (EpisodicLife surfaces that as ``terminated``);
* game over when lives run out.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

SCREEN_W, SCREEN_H = 160, 210
OBS_SIZE = 84
SUBSTEPS = 4

SURFACE_Y = 46          # water starts below this
WATER_BOTTOM = 186
SUB_W, SUB_H = 16, 8
SUB_SPEED = 2           # px per physics frame
TORPEDO_SPEED = 5
N_ENEMIES = 8
N_DIVERS = 4
ENEMY_W, ENEMY_H = 10, 6
DIVER_W, DIVER_H = 6, 8
ENEMY_SPEED = 1.0
DIVER_SPEED = 0.5
LANES = np.array([70, 104, 138, 172], dtype=np.float32)  # lane center y
OXYGEN_MAX = 64.0
OXYGEN_RATE = 64.0 / (32.0 * 60.0)  # ~32 seconds of air at 60 fps
LIVES = 4
MAX_DIVERS = 6
NUM_ACTIONS_SEAQUEST = 18  # full ALE action set

# Grayscale palette.
SKY_GRAY = 60
WATER_GRAY = 35
SUB_GRAY = 200
ENEMY_GRAY = 120
DIVER_GRAY = 170
OXY_GRAY = 230


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SeaquestState:
    sub_x: jax.Array         # [] f32 left edge
    sub_y: jax.Array         # [] f32 top edge
    facing: jax.Array        # [] i32: 0 right, 1 left
    oxygen: jax.Array        # [] f32 in [0, OXYGEN_MAX]
    lives: jax.Array         # [] i32
    score: jax.Array         # [] i32
    divers_held: jax.Array   # [] i32
    surfaced_once: jax.Array # [] bool (first surfacing is always safe)
    torp_x: jax.Array        # [] f32
    torp_y: jax.Array        # [] f32
    torp_dir: jax.Array      # [] f32 (+1 right / -1 left)
    torp_active: jax.Array   # [] bool
    enemy_x: jax.Array       # [N_ENEMIES] f32
    enemy_y: jax.Array       # [N_ENEMIES] f32
    enemy_dir: jax.Array     # [N_ENEMIES] f32 (+1 / -1)
    enemy_active: jax.Array  # [N_ENEMIES] bool
    diver_x: jax.Array       # [N_DIVERS] f32
    diver_y: jax.Array       # [N_DIVERS] f32
    diver_dir: jax.Array     # [N_DIVERS] f32
    diver_active: jax.Array  # [N_DIVERS] bool
    step_count: jax.Array    # [] i32
    rng: jax.Array


# Full ALE action decomposition: (dy, dx, fire) per action id.
#               NOOP FIRE  UP  RT  LT  DN  UR  UL  DR  DL UF  RF  LF  DF URF ULF DRF DLF
_AY = np.array([0,   0,   -1,  0,  0,  1, -1, -1,  1,  1, -1,  0,  0,  1, -1, -1,  1,  1], np.float32)
_AX = np.array([0,   0,    0,  1, -1,  0,  1, -1,  1, -1,  0,  1, -1,  0,  1, -1,  1, -1], np.float32)
_AF = np.array([0,   1,    0,  0,  0,  0,  0,  0,  0,  0,  1,  1,  1,  1,  1,  1,  1,  1], np.bool_)


def seaquest_reset(key: jax.Array) -> SeaquestState:
    k_next = jax.random.split(key)[0]
    return SeaquestState(
        sub_x=jnp.float32((SCREEN_W - SUB_W) / 2),
        sub_y=jnp.float32(SURFACE_Y + 20),
        facing=jnp.int32(0),
        oxygen=jnp.float32(OXYGEN_MAX),
        lives=jnp.int32(LIVES),
        score=jnp.int32(0),
        divers_held=jnp.int32(0),
        surfaced_once=jnp.bool_(False),
        torp_x=jnp.float32(0.0),
        torp_y=jnp.float32(0.0),
        torp_dir=jnp.float32(1.0),
        torp_active=jnp.bool_(False),
        enemy_x=jnp.zeros(N_ENEMIES, jnp.float32),
        enemy_y=jnp.zeros(N_ENEMIES, jnp.float32),
        enemy_dir=jnp.ones(N_ENEMIES, jnp.float32),
        enemy_active=jnp.zeros(N_ENEMIES, bool),
        diver_x=jnp.zeros(N_DIVERS, jnp.float32),
        diver_y=jnp.zeros(N_DIVERS, jnp.float32),
        diver_dir=jnp.ones(N_DIVERS, jnp.float32),
        diver_active=jnp.zeros(N_DIVERS, bool),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _overlap(ax, ay, aw, ah, bx, by, bw, bh):
    return (
        (ax < bx + bw) & (ax + aw > bx) & (ay < by + bh) & (ay + ah > by)
    )


def _spawn_entities(
    key, x, y, direction, active, n, speed_abs, respawn_p, w
):
    """Respawn inactive slots with probability ``respawn_p`` per frame:
    random lane, random side (enters moving inward)."""
    ks, kl, kd = jax.random.split(key, 3)
    do = jax.random.bernoulli(ks, respawn_p, (n,)) & ~active
    lane = jax.random.randint(kl, (n,), 0, len(LANES))
    from_left = jax.random.bernoulli(kd, 0.5, (n,))
    new_x = jnp.where(from_left, -float(w), float(SCREEN_W))
    new_dir = jnp.where(from_left, speed_abs, -speed_abs)
    x = jnp.where(do, new_x, x)
    y = jnp.where(do, jnp.asarray(LANES)[lane] - 4.0, y)
    direction = jnp.where(do, new_dir, direction)
    active = active | do
    return x, y, direction, active


def _sq_substep(s: SeaquestState) -> tuple[SeaquestState, jax.Array, jax.Array]:
    """One physics frame. Returns (state, reward, life_lost)."""
    key, k_en, k_dv = jax.random.split(s.rng, 3)

    # -- entity motion + respawn ---------------------------------------------
    ex = s.enemy_x + s.enemy_dir * jnp.where(s.enemy_active, 1.0, 0.0)
    e_off = (ex < -ENEMY_W - 1) | (ex > SCREEN_W + 1)
    e_active = s.enemy_active & ~e_off
    ex, ey, edir, e_active = _spawn_entities(
        k_en, ex, s.enemy_y, s.enemy_dir, e_active, N_ENEMIES,
        ENEMY_SPEED, 0.02, ENEMY_W,
    )

    # diver_dir already encodes ±DIVER_SPEED (set by _spawn_entities).
    dx_ = s.diver_x + s.diver_dir * jnp.where(s.diver_active, 1.0, 0.0)
    d_off = (dx_ < -DIVER_W - 1) | (dx_ > SCREEN_W + 1)
    d_active = s.diver_active & ~d_off
    dx_, dy_, ddir, d_active = _spawn_entities(
        k_dv, dx_, s.diver_y, s.diver_dir, d_active, N_DIVERS,
        DIVER_SPEED, 0.01, DIVER_W,
    )

    # -- torpedo --------------------------------------------------------------
    tx = s.torp_x + s.torp_dir * TORPEDO_SPEED
    t_active = s.torp_active & (tx > -4) & (tx < SCREEN_W + 4)
    hit = t_active & e_active & _overlap(
        tx, s.torp_y, 4, 2, ex, ey, ENEMY_W, ENEMY_H
    )
    any_hit = hit.any()
    e_active = e_active & ~hit
    t_active = t_active & ~any_hit
    reward = jnp.where(any_hit, 20.0, 0.0)

    # -- sub collisions --------------------------------------------------------
    sub_hit = (
        e_active
        & _overlap(s.sub_x, s.sub_y, SUB_W, SUB_H, ex, ey, ENEMY_W, ENEMY_H)
    ).any()

    pickup = d_active & _overlap(
        s.sub_x, s.sub_y, SUB_W, SUB_H, dx_, dy_, DIVER_W, DIVER_H
    )
    can_take = s.divers_held < MAX_DIVERS
    n_pickup = jnp.where(can_take, pickup.sum().astype(jnp.int32), 0)
    d_active = jnp.where(can_take, d_active & ~pickup, d_active)
    divers = jnp.minimum(s.divers_held + n_pickup, MAX_DIVERS)

    # -- oxygen ------------------------------------------------------------------
    # Drains while submerged, frozen at the surface; banking/penalties are
    # decided once per agent step in seaquest_step (surface position can't
    # change within a step, so per-frame checks can't express the "arrival
    # step is safe, lingering is not" rule).
    at_surface = s.sub_y <= SURFACE_Y
    oxygen = jnp.where(at_surface, s.oxygen, s.oxygen - OXYGEN_RATE).astype(
        jnp.float32
    )
    surfaced_once = s.surfaced_once

    out_of_air = oxygen <= 0.0
    life_lost = sub_hit | out_of_air
    lives = s.lives - jnp.where(life_lost, 1, 0)

    # Respawn sub mid-water after a death; keep oxygen full.
    sub_x = jnp.where(life_lost, (SCREEN_W - SUB_W) / 2.0, s.sub_x)
    sub_y = jnp.where(life_lost, SURFACE_Y + 20.0, s.sub_y)
    oxygen = jnp.where(life_lost, OXYGEN_MAX, oxygen)

    new_s = dataclasses.replace(
        s,
        sub_x=sub_x, sub_y=sub_y,
        oxygen=oxygen, lives=lives,
        score=s.score + reward.astype(jnp.int32),
        divers_held=divers,
        surfaced_once=surfaced_once,
        torp_x=tx, torp_active=t_active,
        enemy_x=ex, enemy_y=ey, enemy_dir=edir, enemy_active=e_active,
        diver_x=dx_, diver_y=dy_, diver_dir=ddir, diver_active=d_active,
        rng=key,
    )
    return new_s, reward, life_lost


def seaquest_step(
    s: SeaquestState, action: jax.Array
) -> tuple[SeaquestState, jax.Array, jax.Array, jax.Array]:
    """One agent step (4 physics frames).

    Returns (state, raw_reward, episodic_terminated, game_over)."""
    action = jnp.clip(action.astype(jnp.int32), 0, NUM_ACTIONS_SEAQUEST - 1)
    s = dataclasses.replace(s, step_count=s.step_count + 1)

    dy = jnp.asarray(_AY)[action] * SUB_SPEED * SUBSTEPS
    dx = jnp.asarray(_AX)[action] * SUB_SPEED * SUBSTEPS
    fire = jnp.asarray(_AF)[action]
    facing = jnp.where(dx > 0, 0, jnp.where(dx < 0, 1, s.facing))
    sub_x = jnp.clip(s.sub_x + dx, 0.0, SCREEN_W - SUB_W).astype(jnp.float32)
    sub_y = jnp.clip(s.sub_y + dy, SURFACE_Y - 2.0, WATER_BOTTOM - SUB_H).astype(
        jnp.float32
    )
    # Fire a torpedo if none in flight.
    do_fire = fire & ~s.torp_active
    tdir = jnp.where(facing == 0, 1.0, -1.0)
    s = dataclasses.replace(
        s,
        sub_x=sub_x, sub_y=sub_y, facing=facing,
        torp_x=jnp.where(do_fire, sub_x + SUB_W / 2, s.torp_x),
        torp_y=jnp.where(do_fire, sub_y + SUB_H / 2, s.torp_y),
        torp_dir=jnp.where(do_fire, tdir, s.torp_dir),
        torp_active=s.torp_active | do_fire,
    )

    # -- surface logic (once per agent step) -----------------------------------
    # Arrival step (oxygen not yet full): refill + bank one diver; the
    # first arrival of the episode is free even with no divers. Every
    # FURTHER step spent at the surface keeps banking one diver, and with
    # none left costs a life — surface camping is never a fixed point.
    at_surface = s.sub_y <= SURFACE_Y
    arrival = at_surface & (s.oxygen < OXYGEN_MAX)
    lingering = at_surface & ~arrival
    bank = at_surface & (s.divers_held > 0)
    full_rescue = bank & (s.divers_held == MAX_DIVERS)
    surf_reward = jnp.where(bank, 50.0, 0.0) + jnp.where(full_rescue, 250.0, 0.0)
    divers = jnp.where(
        full_rescue, 0, jnp.where(bank, s.divers_held - 1, s.divers_held)
    )
    empty_surface = (
        (arrival & ~bank & s.surfaced_once) | (lingering & ~bank)
    )
    lives = s.lives - jnp.where(empty_surface, 1, 0)
    s = dataclasses.replace(
        s,
        oxygen=jnp.where(at_surface, jnp.float32(OXYGEN_MAX), s.oxygen),
        divers_held=divers,
        surfaced_once=s.surfaced_once | at_surface,
        lives=lives,
        # Death pushes the sub back to mid-water like the in-frame deaths.
        sub_y=jnp.where(empty_surface, jnp.float32(SURFACE_Y + 20.0), s.sub_y).astype(jnp.float32),
        sub_x=jnp.where(empty_surface, (SCREEN_W - SUB_W) / 2.0, s.sub_x).astype(jnp.float32),
    )

    reward = surf_reward
    life_lost = empty_surface
    for _ in range(SUBSTEPS):
        s, r, lost = _sq_substep(s)
        reward = reward + r
        life_lost = life_lost | lost

    game_over = s.lives <= 0
    return s, reward, life_lost | game_over, game_over


def seaquest_render(s: SeaquestState) -> jax.Array:
    sx = OBS_SIZE / SCREEN_W
    sy = OBS_SIZE / SCREEN_H
    xs = (jnp.arange(OBS_SIZE, dtype=jnp.float32) + 0.5) / sx
    ys = (jnp.arange(OBS_SIZE, dtype=jnp.float32) + 0.5) / sy
    X = xs.reshape(1, OBS_SIZE)
    Y = ys.reshape(OBS_SIZE, 1)

    img = jnp.where(Y < SURFACE_Y, jnp.uint8(SKY_GRAY), jnp.uint8(WATER_GRAY))

    def rect(img, x0, y0, w, h, gray, cond=True):
        m = (X >= x0) & (X < x0 + w) & (Y >= y0) & (Y < y0 + h) & cond
        return jnp.where(m, jnp.uint8(gray), img)

    # Enemies / divers (vectorized over slots via fori-style unroll).
    for i in range(N_ENEMIES):
        img = rect(img, s.enemy_x[i], s.enemy_y[i], ENEMY_W, ENEMY_H,
                   ENEMY_GRAY, s.enemy_active[i])
    for i in range(N_DIVERS):
        img = rect(img, s.diver_x[i], s.diver_y[i], DIVER_W, DIVER_H,
                   DIVER_GRAY, s.diver_active[i])
    # Torpedo + sub.
    img = rect(img, s.torp_x, s.torp_y, 4, 2, 255, s.torp_active)
    img = rect(img, s.sub_x, s.sub_y, SUB_W, SUB_H, SUB_GRAY)
    # Oxygen bar (bottom): width proportional to air left.
    bar_w = (s.oxygen / OXYGEN_MAX) * 120.0
    img = rect(img, 20.0, 198.0, bar_w, 6, OXY_GRAY)
    # Held divers as ticks above the bar.
    for i in range(MAX_DIVERS):
        img = rect(img, 20.0 + 12.0 * i, 190.0, 8, 4, DIVER_GRAY,
                   s.divers_held > i)
    return img.astype(jnp.uint8)
