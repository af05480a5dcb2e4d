"""Pure-JAX Atari-family games: Breakout and Pong as functional envs.

TPU-native replacement for the reference's ALE pipeline
(`atari_experiments/atari_wrappers.py`, `clip_ppo_atari.py:149-168`). The
ALE is a host-side C++ emulator: driving it means per-step host↔device
sync, exactly the boundary the reference pays every step
(`ppo_atari.py:255`-style `.cpu().numpy()`). Here the two games the
reference's CLIP pipeline actually supports (Breakout and Pong — its RAM
description generators cover only these, `clip_ppo_atari.py:445-462`) are
re-implemented as pure JAX dynamics + renderer, so rollouts stay on device
inside `lax.scan` like the MiniGrid path. An import-gated ALE adapter
(`clip_ppo_tpu.envs.atari.ale_adapter`) provides the exact emulator stack
for hosts that have `ale_py` installed.

These are *native reimplementations of the games*, not emulator ports:
dynamics run in ALE screen coordinates (160×210) so the state-based text
descriptions keep the reference's RAM-derived coordinate semantics
(`clip_ppo_atari.py:302-442`: Breakout danger zone y>180, Pong player side
x>140, …), and the renderer draws straight to the 84×84 grayscale frame
the wrapper stack would have produced (WarpFrame + grayscale,
`atari_wrappers.py:233-266`). Preprocessing the reference gets from
wrappers is folded into the env itself:

* frame-skip 4  → one agent step integrates 4 physics substeps
  (`MaxAndSkipEnv`, `atari_wrappers.py:168-210`; max-pooling is for ALE
  sprite flicker, which a clean renderer does not have);
* EpisodicLife  → life loss surfaces ``terminated`` while the game
  continues; true game-over resets (`atari_wrappers.py:117-165`);
* FireReset     → the serve auto-launches on the step after an episodic
  reset (`atari_wrappers.py:94-114`);
* reward clip   → sign() applied by the vector wrapper; raw scores are
  kept for episode statistics like `RecordEpisodeStatistics` under the
  wrapper stack.
"""

from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

# ALE screen coordinates.
SCREEN_W, SCREEN_H = 160, 210
OBS_SIZE = 84
SUBSTEPS = 4  # physics frames per agent step (frame-skip 4)

# --- Breakout constants (160×210 screen) -----------------------------------

BK_WALL_TOP = 32
BK_SIDE = 8
BK_BRICK_Y0 = 57
BK_BRICK_H = 6
BK_BRICK_W = 8
BK_ROWS, BK_COLS = 6, 18
BK_PADDLE_Y = 189
BK_PADDLE_H = 4
BK_PADDLE_W = 16
BK_PADDLE_SPEED = 3  # px per physics frame
BK_BALL_W, BK_BALL_H = 2, 4
BK_DEATH_Y = 200
BK_LIVES = 5
# Row point values, top→bottom (red,red,orange/yellow...): 7,7,4,4,1,1.
BK_ROW_VALUES = np.array([7, 7, 4, 4, 1, 1], dtype=np.int32)
# Grayscale lumas of the classic row colors (red,orange,yellow,green,aqua,blue).
BK_ROW_GRAY = np.array([106, 122, 156, 140, 148, 92], dtype=np.uint8)
BK_WALL_GRAY = 142
BK_PADDLE_GRAY = 110  # red paddle/ball luma
NUM_ACTIONS_BREAKOUT = 4  # NOOP, FIRE, RIGHT, LEFT

# --- Pong constants ---------------------------------------------------------

PG_TOP = 34
PG_BOTTOM = 194
PG_PADDLE_H = 16
PG_PADDLE_W = 4
PG_PLAYER_X = 140  # right paddle (the agent)
PG_ENEMY_X = 16
PG_PADDLE_SPEED = 2  # px per physics frame
PG_ENEMY_SPEED = 1   # slower tracker → beatable
PG_BALL_W, PG_BALL_H = 2, 4
PG_WIN_SCORE = 21
PG_BG_GRAY = 87      # Pong's dark background luma
PG_FG_GRAY = 236
NUM_ACTIONS_PONG = 6  # NOOP, FIRE, RIGHT(up), LEFT(down), RIGHTFIRE, LEFTFIRE


@dataclasses.dataclass(frozen=True)
class AtariParams:
    """Static configuration (hashable, jit-static)."""

    game: str  # "breakout" | "pong"

    @property
    def num_actions(self) -> int:
        if self.game == "breakout":
            return NUM_ACTIONS_BREAKOUT
        if self.game == "pong":
            return NUM_ACTIONS_PONG
        from clip_ppo_tpu.envs.atari.seaquest import NUM_ACTIONS_SEAQUEST

        return NUM_ACTIONS_SEAQUEST


def parse_atari_id(env_id: str) -> AtariParams:
    """Map ALE env-id strings (``ALE/Breakout-v5``, ``BreakoutNoFrameskip-v4``,
    ``ALE/Pong-v5``…) to AtariParams."""
    m = re.match(r"(ALE/)?(Breakout|Pong|Seaquest)(NoFrameskip)?(-v\d+)?$", env_id)
    if not m:
        raise ValueError(
            f"unsupported Atari env id: {env_id!r} (the pure-JAX backend "
            "implements Breakout, Pong and Seaquest — the reference grid's "
            "games; install ale_py for others)"
        )
    return AtariParams(m.group(2).lower())


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BreakoutState:
    paddle_x: jax.Array      # [] f32, left edge
    ball_x: jax.Array        # [] f32
    ball_y: jax.Array        # [] f32
    ball_vx: jax.Array       # [] f32 px/frame
    ball_vy: jax.Array       # [] f32 px/frame
    bricks: jax.Array        # [6, 18] bool
    lives: jax.Array         # [] i32
    score: jax.Array         # [] i32
    in_play: jax.Array       # [] bool (ball launched)
    auto_fire: jax.Array     # [] bool (serve on next step — FireReset)
    paddle_hits: jax.Array   # [] i32 (speed-up counter)
    step_count: jax.Array    # [] i32
    rng: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PongState:
    player_y: jax.Array      # [] f32 paddle top (right/agent)
    enemy_y: jax.Array       # [] f32 paddle top (left/computer)
    ball_x: jax.Array        # [] f32
    ball_y: jax.Array        # [] f32
    ball_vx: jax.Array       # [] f32 px/frame
    ball_vy: jax.Array       # [] f32 px/frame
    player_score: jax.Array  # [] i32
    enemy_score: jax.Array   # [] i32
    serve_wait: jax.Array    # [] i32 frames until serve
    step_count: jax.Array    # [] i32
    rng: jax.Array


# ---------------------------------------------------------------------------
# Breakout
# ---------------------------------------------------------------------------


def breakout_reset(key: jax.Array) -> BreakoutState:
    k_next = jax.random.split(key)[0]
    return BreakoutState(
        paddle_x=jnp.float32((SCREEN_W - BK_PADDLE_W) / 2),
        ball_x=jnp.float32(SCREEN_W / 2),
        ball_y=jnp.float32(BK_PADDLE_Y - 40),
        ball_vx=jnp.float32(0.0),
        ball_vy=jnp.float32(0.0),
        bricks=jnp.ones((BK_ROWS, BK_COLS), bool),
        lives=jnp.int32(BK_LIVES),
        score=jnp.int32(0),
        in_play=jnp.bool_(False),
        auto_fire=jnp.bool_(True),  # FireReset fires on reset
        paddle_hits=jnp.int32(0),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _bk_launch(s: BreakoutState, key: jax.Array) -> BreakoutState:
    """Serve: ball drops from just below the brick wall, random x / dx."""
    kx, kd, k_next = jax.random.split(key, 3)
    x = jax.random.uniform(
        kx, (), minval=BK_SIDE + 10.0, maxval=SCREEN_W - BK_SIDE - 10.0
    )
    dx = jnp.where(jax.random.bernoulli(kd), 1.0, -1.0)
    return dataclasses.replace(
        s,
        ball_x=x,
        ball_y=jnp.float32(BK_BRICK_Y0 + BK_ROWS * BK_BRICK_H + 8),
        ball_vx=dx,
        ball_vy=jnp.float32(1.0),
        in_play=jnp.bool_(True),
        rng=k_next,
    )


def _bk_substep(s: BreakoutState) -> tuple[BreakoutState, jax.Array, jax.Array]:
    """One physics frame. Returns (state, reward, life_lost)."""
    x = s.ball_x + s.ball_vx
    y = s.ball_y + s.ball_vy
    vx, vy = s.ball_vx, s.ball_vy

    # Side walls.
    hit_left = x < BK_SIDE
    hit_right = x > SCREEN_W - BK_SIDE - BK_BALL_W
    vx = jnp.where(hit_left | hit_right, -vx, vx)
    x = jnp.clip(x, BK_SIDE, SCREEN_W - BK_SIDE - BK_BALL_W)
    # Ceiling.
    hit_top = y < BK_WALL_TOP
    vy = jnp.where(hit_top, jnp.abs(vy), vy)
    y = jnp.maximum(y, BK_WALL_TOP)

    # Bricks: test the cell under the ball center.
    cx = x + BK_BALL_W / 2
    cy = y + BK_BALL_H / 2
    row = jnp.floor((cy - BK_BRICK_Y0) / BK_BRICK_H).astype(jnp.int32)
    col = jnp.floor((cx - BK_SIDE) / BK_BRICK_W).astype(jnp.int32)
    in_wall = (row >= 0) & (row < BK_ROWS) & (col >= 0) & (col < BK_COLS)
    rc = jnp.clip(row, 0, BK_ROWS - 1)
    cc = jnp.clip(col, 0, BK_COLS - 1)
    brick_alive = s.bricks[rc, cc] & in_wall & s.in_play
    bricks = s.bricks.at[rc, cc].set(
        jnp.where(brick_alive, False, s.bricks[rc, cc])
    )
    reward = jnp.where(brick_alive, jnp.asarray(BK_ROW_VALUES)[rc], 0)
    vy = jnp.where(brick_alive, -vy, vy)

    # Paddle.
    ball_bottom = y + BK_BALL_H
    over_paddle = (cx >= s.paddle_x) & (cx < s.paddle_x + BK_PADDLE_W)
    hit_paddle = (
        s.in_play & (vy > 0) & over_paddle
        & (ball_bottom >= BK_PADDLE_Y) & (ball_bottom < BK_PADDLE_Y + BK_PADDLE_H + 2)
    )
    # Bounce angle from hit offset (classic Breakout control).
    offset = cx - (s.paddle_x + BK_PADDLE_W / 2)
    new_vx = jnp.where(
        jnp.abs(offset) < 4.0, jnp.sign(offset + 1e-3) * 1.0, jnp.sign(offset) * 2.0
    )
    paddle_hits = s.paddle_hits + jnp.where(hit_paddle, 1, 0)
    speed = jnp.where(paddle_hits >= 4, 2.0, 1.0)
    vx = jnp.where(hit_paddle, new_vx, vx)
    vy = jnp.where(hit_paddle, -speed, vy)
    y = jnp.where(hit_paddle, jnp.float32(BK_PADDLE_Y - BK_BALL_H), y)

    # Life loss.
    lost = s.in_play & (y >= BK_DEATH_Y)
    lives = s.lives - jnp.where(lost, 1, 0)

    new_s = dataclasses.replace(
        s,
        ball_x=x, ball_y=y, ball_vx=vx, ball_vy=vy,
        bricks=bricks, lives=lives, score=s.score + reward,
        paddle_hits=paddle_hits,
        in_play=s.in_play & ~lost,
        auto_fire=s.auto_fire | lost,  # EpisodicLife+FireReset re-serve
    )
    return new_s, reward.astype(jnp.float32), lost


def breakout_step(
    s: BreakoutState, action: jax.Array
) -> tuple[BreakoutState, jax.Array, jax.Array, jax.Array]:
    """One agent step (4 physics frames).

    Returns (state, raw_reward, episodic_terminated, game_over)."""
    action = action.astype(jnp.int32)
    key, k_launch = jax.random.split(s.rng)
    s = dataclasses.replace(s, rng=key, step_count=s.step_count + 1)

    # Paddle motion (RIGHT=2 → +x, LEFT=3 → -x), applied per agent step.
    dx = jnp.where(action == 2, BK_PADDLE_SPEED * SUBSTEPS,
                   jnp.where(action == 3, -BK_PADDLE_SPEED * SUBSTEPS, 0))
    paddle_x = jnp.clip(
        s.paddle_x + dx, BK_SIDE, SCREEN_W - BK_SIDE - BK_PADDLE_W
    ).astype(jnp.float32)
    s = dataclasses.replace(s, paddle_x=paddle_x)

    # Serve on FIRE or auto-fire (FireReset semantics).
    want_fire = (action == 1) | s.auto_fire
    do_launch = want_fire & ~s.in_play & (s.lives > 0)
    launched = _bk_launch(s, k_launch)
    s = jax.tree_util.tree_map(
        lambda a, b: jnp.where(do_launch, a, b), launched, s
    )
    s = dataclasses.replace(s, auto_fire=s.auto_fire & ~do_launch)

    reward = jnp.float32(0.0)
    life_lost = jnp.bool_(False)
    for _ in range(SUBSTEPS):
        s, r, lost = _bk_substep(s)
        reward = reward + r
        life_lost = life_lost | lost

    # Second wall: respawn bricks once cleared (real-game behavior).
    cleared = ~s.bricks.any()
    s = dataclasses.replace(
        s, bricks=jnp.where(cleared, jnp.ones_like(s.bricks), s.bricks)
    )

    game_over = s.lives <= 0
    episodic_done = life_lost | game_over
    return s, reward, episodic_done, game_over


def breakout_render(s: BreakoutState) -> jax.Array:
    """84×84 grayscale uint8 frame (WarpFrame-equivalent output)."""
    sx = OBS_SIZE / SCREEN_W
    sy = OBS_SIZE / SCREEN_H
    xs = (jnp.arange(OBS_SIZE, dtype=jnp.float32) + 0.5) / sx  # screen x per px col
    ys = (jnp.arange(OBS_SIZE, dtype=jnp.float32) + 0.5) / sy  # screen y per px row
    X = xs.reshape(1, OBS_SIZE)
    Y = ys.reshape(OBS_SIZE, 1)

    img = jnp.zeros((OBS_SIZE, OBS_SIZE), jnp.uint8)

    # Walls (sides + ceiling band).
    wall = (X < BK_SIDE) | (X >= SCREEN_W - BK_SIDE) | ((Y >= 17) & (Y < BK_WALL_TOP))
    img = jnp.where(wall, jnp.uint8(BK_WALL_GRAY), img)

    # Bricks.
    row = jnp.floor((Y - BK_BRICK_Y0) / BK_BRICK_H).astype(jnp.int32)
    col = jnp.floor((X - BK_SIDE) / BK_BRICK_W).astype(jnp.int32)
    in_wall = (row >= 0) & (row < BK_ROWS) & (col >= 0) & (col < BK_COLS)
    rc = jnp.clip(row, 0, BK_ROWS - 1)
    cc = jnp.clip(col, 0, BK_COLS - 1)
    alive = s.bricks[rc, cc] & in_wall
    img = jnp.where(alive, jnp.asarray(BK_ROW_GRAY)[rc], img)

    # Paddle.
    pad = (
        (X >= s.paddle_x) & (X < s.paddle_x + BK_PADDLE_W)
        & (Y >= BK_PADDLE_Y) & (Y < BK_PADDLE_Y + BK_PADDLE_H)
    )
    img = jnp.where(pad, jnp.uint8(BK_PADDLE_GRAY), img)

    # Ball.
    ball = (
        s.in_play
        & (X >= s.ball_x) & (X < s.ball_x + BK_BALL_W)
        & (Y >= s.ball_y) & (Y < s.ball_y + BK_BALL_H)
    )
    img = jnp.where(ball, jnp.uint8(BK_PADDLE_GRAY + 60), img)
    return img


# ---------------------------------------------------------------------------
# Pong
# ---------------------------------------------------------------------------


def pong_reset(key: jax.Array) -> PongState:
    k_next = jax.random.split(key)[0]
    mid = jnp.float32((PG_TOP + PG_BOTTOM - PG_PADDLE_H) / 2)
    return PongState(
        player_y=mid,
        enemy_y=mid,
        ball_x=jnp.float32(SCREEN_W / 2),
        ball_y=jnp.float32((PG_TOP + PG_BOTTOM) / 2),
        ball_vx=jnp.float32(0.0),
        ball_vy=jnp.float32(0.0),
        player_score=jnp.int32(0),
        enemy_score=jnp.int32(0),
        serve_wait=jnp.int32(8),  # brief pause before first serve
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _pg_serve(s: PongState, key: jax.Array) -> PongState:
    kd, kv, k_next = jax.random.split(key, 3)
    dx = jnp.where(jax.random.bernoulli(kd), 2.0, -2.0)
    dy = jax.random.uniform(kv, (), minval=-1.5, maxval=1.5)
    return dataclasses.replace(
        s,
        ball_x=jnp.float32(SCREEN_W / 2),
        ball_y=jnp.float32((PG_TOP + PG_BOTTOM) / 2),
        ball_vx=dx,
        ball_vy=dy,
        serve_wait=jnp.int32(0),
        rng=k_next,
    )


def _pg_substep(s: PongState) -> tuple[PongState, jax.Array]:
    """One physics frame. Returns (state, reward) — +1 player point,
    -1 enemy point."""
    in_play = s.serve_wait <= 0
    x = s.ball_x + jnp.where(in_play, s.ball_vx, 0.0)
    y = s.ball_y + jnp.where(in_play, s.ball_vy, 0.0)
    vx, vy = s.ball_vx, s.ball_vy

    # Enemy paddle tracks the ball (capped speed, dead zone).
    target = y + PG_BALL_H / 2 - PG_PADDLE_H / 2
    delta = target - s.enemy_y
    enemy_y = s.enemy_y + jnp.clip(
        jnp.where(jnp.abs(delta) > 4.0, delta, 0.0),
        -PG_ENEMY_SPEED, PG_ENEMY_SPEED,
    )
    enemy_y = jnp.clip(enemy_y, PG_TOP, PG_BOTTOM - PG_PADDLE_H)

    # Top/bottom walls.
    hit_top = y < PG_TOP
    hit_bot = y > PG_BOTTOM - PG_BALL_H
    vy = jnp.where(hit_top, jnp.abs(vy), jnp.where(hit_bot, -jnp.abs(vy), vy))
    y = jnp.clip(y, PG_TOP, PG_BOTTOM - PG_BALL_H)

    # Player paddle (right).
    cy = y + PG_BALL_H / 2
    hit_player = (
        in_play & (vx > 0)
        & (x + PG_BALL_W >= PG_PLAYER_X) & (x < PG_PLAYER_X + PG_PADDLE_W + 2)
        & (cy >= s.player_y - 1) & (cy <= s.player_y + PG_PADDLE_H + 1)
    )
    off_p = (cy - (s.player_y + PG_PADDLE_H / 2)) / (PG_PADDLE_H / 2)
    vx = jnp.where(hit_player, -jnp.abs(vx), vx)
    vy = jnp.where(hit_player, jnp.clip(off_p * 2.5, -2.5, 2.5), vy)
    x = jnp.where(hit_player, jnp.float32(PG_PLAYER_X - PG_BALL_W), x)

    # Enemy paddle (left).
    hit_enemy = (
        in_play & (vx < 0)
        & (x <= PG_ENEMY_X + PG_PADDLE_W) & (x + PG_BALL_W > PG_ENEMY_X - 2)
        & (cy >= enemy_y - 1) & (cy <= enemy_y + PG_PADDLE_H + 1)
    )
    off_e = (cy - (enemy_y + PG_PADDLE_H / 2)) / (PG_PADDLE_H / 2)
    vx = jnp.where(hit_enemy, jnp.abs(vx), vx)
    vy = jnp.where(hit_enemy, jnp.clip(off_e * 2.5, -2.5, 2.5), vy)
    x = jnp.where(hit_enemy, jnp.float32(PG_ENEMY_X + PG_PADDLE_W), x)

    # Points.
    player_point = in_play & (x < 0)
    enemy_point = in_play & (x > SCREEN_W - PG_BALL_W)
    reward = jnp.where(player_point, 1.0, jnp.where(enemy_point, -1.0, 0.0))

    scored = player_point | enemy_point
    new_s = dataclasses.replace(
        s,
        ball_x=x, ball_y=y, ball_vx=vx, ball_vy=vy,
        enemy_y=enemy_y,
        player_score=s.player_score + jnp.where(player_point, 1, 0),
        enemy_score=s.enemy_score + jnp.where(enemy_point, 1, 0),
        serve_wait=jnp.where(scored, 30, jnp.maximum(s.serve_wait - 1, 0)),
    )
    return new_s, reward


def pong_step(
    s: PongState, action: jax.Array
) -> tuple[PongState, jax.Array, jax.Array, jax.Array]:
    """One agent step (4 physics frames).

    Returns (state, raw_reward, episodic_terminated, game_over).
    Pong has one life, so episodic_terminated == game_over."""
    action = action.astype(jnp.int32)
    key, k_serve = jax.random.split(s.rng)
    s = dataclasses.replace(s, rng=key, step_count=s.step_count + 1)

    # RIGHT(2)/RIGHTFIRE(4) → up; LEFT(3)/LEFTFIRE(5) → down (ALE mapping).
    up = (action == 2) | (action == 4)
    down = (action == 3) | (action == 5)
    dy = jnp.where(up, -PG_PADDLE_SPEED * SUBSTEPS,
                   jnp.where(down, PG_PADDLE_SPEED * SUBSTEPS, 0))
    player_y = jnp.clip(
        s.player_y + dy, PG_TOP, PG_BOTTOM - PG_PADDLE_H
    ).astype(jnp.float32)
    s = dataclasses.replace(s, player_y=player_y)

    # Serve when the pause expires (within this step's frame budget).
    do_serve = (s.serve_wait > 0) & (s.serve_wait <= SUBSTEPS)
    served = _pg_serve(s, k_serve)
    s = jax.tree_util.tree_map(
        lambda a, b: jnp.where(do_serve, a, b), served, s
    )

    reward = jnp.float32(0.0)
    for _ in range(SUBSTEPS):
        s, r = _pg_substep(s)
        reward = reward + r

    game_over = (s.player_score >= PG_WIN_SCORE) | (s.enemy_score >= PG_WIN_SCORE)
    return s, reward, game_over, game_over


def pong_render(s: PongState) -> jax.Array:
    sx = OBS_SIZE / SCREEN_W
    sy = OBS_SIZE / SCREEN_H
    xs = (jnp.arange(OBS_SIZE, dtype=jnp.float32) + 0.5) / sx
    ys = (jnp.arange(OBS_SIZE, dtype=jnp.float32) + 0.5) / sy
    X = xs.reshape(1, OBS_SIZE)
    Y = ys.reshape(OBS_SIZE, 1)

    img = jnp.full((OBS_SIZE, OBS_SIZE), jnp.uint8(PG_BG_GRAY))
    # White top/bottom bands.
    band = ((Y >= 24) & (Y < PG_TOP)) | ((Y >= PG_BOTTOM) & (Y < PG_BOTTOM + 10))
    img = jnp.where(band, jnp.uint8(PG_FG_GRAY), img)

    player = (
        (X >= PG_PLAYER_X) & (X < PG_PLAYER_X + PG_PADDLE_W)
        & (Y >= s.player_y) & (Y < s.player_y + PG_PADDLE_H)
    )
    enemy = (
        (X >= PG_ENEMY_X) & (X < PG_ENEMY_X + PG_PADDLE_W)
        & (Y >= s.enemy_y) & (Y < s.enemy_y + PG_PADDLE_H)
    )
    ball = (
        (s.serve_wait <= 0)
        & (X >= s.ball_x) & (X < s.ball_x + PG_BALL_W)
        & (Y >= s.ball_y) & (Y < s.ball_y + PG_BALL_H)
    )
    img = jnp.where(player | enemy | ball, jnp.uint8(PG_FG_GRAY), img)
    return img


# ---------------------------------------------------------------------------
# Dispatch + state-based text descriptions
# ---------------------------------------------------------------------------


def reset(params: AtariParams, key: jax.Array):
    if params.game == "breakout":
        return breakout_reset(key)
    if params.game == "pong":
        return pong_reset(key)
    from clip_ppo_tpu.envs.atari import seaquest

    return seaquest.seaquest_reset(key)


def step(params: AtariParams, state, action: jax.Array):
    if params.game == "breakout":
        return breakout_step(state, action)
    if params.game == "pong":
        return pong_step(state, action)
    from clip_ppo_tpu.envs.atari import seaquest

    return seaquest.seaquest_step(state, action)


def render(params: AtariParams, state) -> jax.Array:
    if params.game == "breakout":
        return breakout_render(state)
    if params.game == "pong":
        return pong_render(state)
    from clip_ppo_tpu.envs.atari import seaquest

    return seaquest.seaquest_render(state)


def describe_breakout(
    score: np.ndarray, ball_x: np.ndarray, ball_y: np.ndarray,
    paddle_x: np.ndarray, lives: np.ndarray,
) -> list[str]:
    """Breakout descriptions with the reference's exact format and
    contextual-phrase logic (`clip_ppo_atari.py:302-367`), sourced from
    true game state instead of RAM addresses (same screen coordinates)."""
    out = []
    for i in range(len(score)):
        bx, by = int(ball_x[i]), int(ball_y[i])
        px = int(paddle_x[i])
        d = abs(bx - px)
        desc = (
            f"Breakout score {int(score[i])}, ball ({bx},{by}), "
            f"paddle ({px}), lives {int(lives[i])}"
        )
        if d < 15 and by > 180:
            desc += ", near paddle danger zone"
        elif d < 15:
            desc += ", near paddle safe"
        elif by > 180:
            desc += ", ball danger zone"
        else:
            desc += ", ball hitting bricks"
        out.append(desc)
    return out


def describe_pong(
    player_score: np.ndarray, enemy_score: np.ndarray,
    ball_x: np.ndarray, ball_y: np.ndarray,
    player_y: np.ndarray, enemy_y: np.ndarray,
) -> list[str]:
    """Pong descriptions matching `clip_ppo_atari.py:370-442`."""
    out = []
    for i in range(len(player_score)):
        bx, by = int(ball_x[i]), int(ball_y[i])
        py, ey = int(player_y[i]), int(enemy_y[i])
        desc = (
            f"Pong score {int(player_score[i])}-{int(enemy_score[i])}, "
            f"ball ({bx},{by}), player paddle ({py}), computer paddle ({ey})"
        )
        d_player = abs(by - py)
        d_enemy = abs(by - ey)
        if bx > 140:
            desc += ", near player paddle" if d_player < 10 else ", ball approaching player"
        elif bx < 20:
            desc += ", near computer paddle" if d_enemy < 10 else ", ball approaching computer"
        else:
            desc += ", ball moving toward player" if bx > 80 else ", ball moving toward computer"
        out.append(desc)
    return out


def describe_states(params: AtariParams, state, n: int) -> list[str]:
    """Batched state → per-env text (dispatcher mirroring
    `generate_atari_descriptions`, `clip_ppo_atari.py:445-462`; like the
    reference, Seaquest has no description generator and raises)."""
    if params.game == "seaquest":
        raise ValueError("Seaquest not supported for CLIP PPO")
    if params.game == "breakout":
        return describe_breakout(
            np.asarray(state.score), np.asarray(state.ball_x),
            np.asarray(state.ball_y), np.asarray(state.paddle_x),
            np.asarray(state.lives),
        )
    return describe_pong(
        np.asarray(state.player_score), np.asarray(state.enemy_score),
        np.asarray(state.ball_x), np.asarray(state.ball_y),
        np.asarray(state.player_y), np.asarray(state.enemy_y),
    )
