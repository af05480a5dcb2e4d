"""Fake ALE: a tiny Breakout-like gymnasium env exposing the ALE host API.

The real emulator adapter (`clip_ppo_tpu.envs.atari.ale_adapter`) is
import-gated on ``ale_py``, which is absent in CI — leaving the exact
wrapper stack and the HostTrainer CLIP path with zero executed coverage.
This module provides a minimal stand-in that speaks the ALE *interface*
the adapter stack consumes (the `atari_wrappers.py` behaviors call
``env.unwrapped.ale.getScreenGrayscale/getScreenRGB/lives`` and
``get_action_meanings``), plus the Breakout
RAM addresses the description generator reads
(`clip_ppo_atari.py:302-367`: score digits at RAM[36-38], ball at
(RAM[99], RAM[101]), paddle at RAM[72], lives at RAM[57]&0x7).

Register with :func:`register` and use the fake ids with
``--env-backend ale``; the adapter accepts any gymnasium-registered
ALE-compatible id without importing ale_py. BOTH env-id families the
reference actually trains are provided with their real ALE semantics
(`run_experiments.py:86-89` passes ``ALE/*-v5``; the CLI default is
``BreakoutNoFrameskip-v4``; the reference's ``make_env`` calls
``gym.make(env_id)`` with NO frameskip override, so the id's built-in
dynamics apply UNDER its MaxAndSkip(4)):

* ``FakeALE/Breakout-v5`` / ``FakeALE/Pong-v5`` — built-in frameskip 4
  and sticky actions (``repeat_action_probability=0.25``), like
  gymnasium's ``ALE/*-v5`` registrations → effective 16 raw frames per
  agent step through the wrapper stack;
* ``FakeALE/BreakoutNoFrameskip-v4`` / ``FakeALE/PongNoFrameskip-v4`` —
  frameskip 1, no sticky actions → the classic effective skip of 4.

Sticky actions follow ALE (Machado et al. 2017): independently per raw
frame, with probability p the previously EXECUTED action repeats instead
of the agent's. ``_raw_frames`` / ``_sticky_repeats`` counters on the
env expose the effective semantics to tests.

The games themselves are 210x160 RGB toys — Breakout: paddle/ball/bricks
with FIRE-to-serve, five lives, per-brick score; Pong: two paddles to 21
points with a ball-tracking opponent (Pong exercises the adapter's
``describe_pong`` RAM path: scores at RAM[13]/[14], ball at
(RAM[49], RAM[54]), paddles at RAM[51]/[50], and the no-lives EpisodicLife
behavior). Enough structure that NOOP-heavy policies lose and
paddle-tracking policies score, so training signal is real (if simple).
"""

from __future__ import annotations

import numpy as np

FAKE_ENV_ID = "FakeALE/Breakout-v5"
FAKE_PONG_ID = "FakeALE/Pong-v5"
FAKE_V4_ENV_ID = "FakeALE/BreakoutNoFrameskip-v4"
FAKE_V4_PONG_ID = "FakeALE/PongNoFrameskip-v4"

# playfield geometry (screen coords, 210 rows x 160 cols)
_WALL = 8
_PADDLE_Y = 189
_PADDLE_W = 16
_PADDLE_H = 4
_BRICK_TOP = 57
_BRICK_ROWS = 6
_BRICK_H = 6
_BRICK_W = 8
_BRICK_COLS = (160 - 2 * _WALL) // _BRICK_W  # 18
_ROW_COLORS = (  # classic Breakout row colors, top to bottom
    (200, 72, 72), (198, 108, 58), (180, 122, 48),
    (162, 162, 42), (72, 160, 72), (66, 72, 200),
)


class _FakeALEInterface:
    """The slice of ``ale_py.ALEInterface`` the wrapper stack touches."""

    def __init__(self, env: "FakeBreakoutEnv"):
        self._env = env

    def lives(self) -> int:
        return self._env._lives

    def getScreenRGB(self, out: np.ndarray | None = None) -> np.ndarray:
        screen = self._env._render_screen()
        if out is not None:
            out[...] = screen
            return out
        return screen

    def getScreenGrayscale(self, out: np.ndarray | None = None) -> np.ndarray:
        screen = self._env._render_screen()
        # ALE's grayscale is the luma of the RGB screen.
        gray = (screen.astype(np.uint16) @ np.array([299, 587, 114])) // 1000
        gray = gray.astype(np.uint8)
        if out is not None:
            out[...] = gray
            return out
        return gray

    def getRAM(self) -> np.ndarray:
        return self._env._fill_ram()


class FakeBreakoutEnv:
    """Instantiated via gymnasium's registry (see :func:`register`)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 60}

    def __new__(cls, render_mode=None, frameskip=1,
                repeat_action_probability=0.0):
        import gymnasium as gym

        outer = (render_mode, frameskip, repeat_action_probability)

        class _Env(gym.Env):
            metadata = cls.metadata

            def __init__(self, render_mode=None, frameskip=1,
                         repeat_action_probability=0.0):
                self.render_mode = render_mode
                self._frameskip = frameskip
                self._sticky_p = float(repeat_action_probability)
                self._exec_action = 0  # NOOP; sticky repeats the EXECUTED action
                self._raw_frames = 0
                self._sticky_repeats = 0
                self.observation_space = gym.spaces.Box(
                    0, 255, (210, 160, 3), np.uint8
                )
                self.action_space = gym.spaces.Discrete(4)
                self.ale = _FakeALEInterface(self)
                self._lives = 5
                self._score = 0
                self._paddle_x = 80
                self._ball_x = 80.0
                self._ball_y = float(_PADDLE_Y - 2)
                self._vx = 0.0
                self._vy = 0.0
                self._launched = False
                self._serve_timer = 0
                self._bricks = np.ones((_BRICK_ROWS, _BRICK_COLS), bool)

            def get_action_meanings(self):
                return ["NOOP", "FIRE", "RIGHT", "LEFT"]

            def _fill_ram(self) -> np.ndarray:
                ram = np.zeros(128, np.uint8)
                score = min(self._score, 999)
                ram[36] = score // 100          # adapter reads digits:
                ram[37] = (score // 10) % 10    # r[36]*100 + r[37]*10 + r[38]
                ram[38] = score % 10
                ram[99] = int(np.clip(self._ball_x, 0, 255))
                ram[101] = int(np.clip(self._ball_y, 0, 255))
                ram[72] = int(np.clip(self._paddle_x, 0, 255))
                ram[57] = self._lives & 0x7
                return ram

            # -- dynamics ------------------------------------------------

            def _serve(self):
                self._launched = True
                direction = 1.0 if self.np_random.random() < 0.5 else -1.0
                self._vx = 1.5 * direction
                self._vy = -2.0
                self._serve_timer = 0

            def step(self, action):
                # ALE semantics: the id's built-in frameskip repeats the
                # action over raw frames, summing rewards and returning the
                # LAST frame's screen; sticky actions apply independently
                # per raw frame (with prob p the previously executed action
                # runs instead — Machado et al. 2017, as in ale_py v5 ids).
                total = 0.0
                terminated = False
                for _ in range(self._frameskip):
                    self._raw_frames += 1
                    if (self._sticky_p > 0.0
                            and self.np_random.random() < self._sticky_p):
                        self._sticky_repeats += 1
                    else:
                        self._exec_action = action
                    r, terminated = self._frame(self._exec_action)
                    total += r
                    if terminated:
                        break
                return self._render_screen(), total, terminated, False, {}

            def _frame(self, action):
                """One raw emulator frame; returns (reward, terminated)."""
                reward = 0.0
                if action == 2:   # RIGHT
                    self._paddle_x = min(152 - _PADDLE_W // 2, self._paddle_x + 4)
                elif action == 3:  # LEFT
                    self._paddle_x = max(_WALL + _PADDLE_W // 2, self._paddle_x - 4)
                if not self._launched:
                    self._ball_x = float(self._paddle_x)
                    self._ball_y = float(_PADDLE_Y - 2)
                    self._serve_timer += 1
                    # FIRE serves; auto-serve keeps NOOP policies playing
                    # (the real game also force-serves after a delay).
                    if action == 1 or self._serve_timer > 60:
                        self._serve()
                else:
                    self._ball_x += self._vx
                    self._ball_y += self._vy
                    if self._ball_x <= _WALL or self._ball_x >= 160 - _WALL:
                        self._vx = -self._vx
                        self._ball_x = float(np.clip(self._ball_x, _WALL, 160 - _WALL))
                    if self._ball_y <= 32:
                        self._vy = abs(self._vy)
                    # brick collisions
                    row = int((self._ball_y - _BRICK_TOP) // _BRICK_H)
                    col = int((self._ball_x - _WALL) // _BRICK_W)
                    if (0 <= row < _BRICK_ROWS and 0 <= col < _BRICK_COLS
                            and self._bricks[row, col]):
                        self._bricks[row, col] = False
                        self._score += 7 - row  # top rows worth more
                        reward = float(7 - row)
                        self._vy = abs(self._vy)  # bounce downward
                    # paddle collision
                    if (self._vy > 0 and _PADDLE_Y - 2 <= self._ball_y <= _PADDLE_Y + _PADDLE_H
                            and abs(self._ball_x - self._paddle_x) <= _PADDLE_W // 2 + 1):
                        self._vy = -abs(self._vy)
                        # english: hit offset steers the ball
                        self._vx += 0.25 * np.sign(self._ball_x - self._paddle_x)
                        self._vx = float(np.clip(self._vx, -2.5, 2.5))
                    # ball lost
                    if self._ball_y > 208:
                        self._lives -= 1
                        self._launched = False
                        self._serve_timer = 0
                if not self._bricks.any():  # cleared — fresh wall
                    self._bricks[...] = True
                return reward, self._lives <= 0

            def reset(self, *, seed=None, options=None):
                super().reset(seed=seed)
                self._lives = 5
                self._score = 0
                self._paddle_x = 80
                self._launched = False
                self._serve_timer = 0
                self._exec_action = 0
                self._ball_x = float(self._paddle_x)
                self._ball_y = float(_PADDLE_Y - 2)
                self._bricks[...] = True
                return self._render_screen(), {}

            def render(self):
                if self.render_mode == "rgb_array":
                    return self._render_screen()
                return None

            def _render_screen(self) -> np.ndarray:
                s = np.zeros((210, 160, 3), np.uint8)
                s[:, :_WALL] = s[:, -_WALL:] = s[:32, :] = (142, 142, 142)
                for r in range(_BRICK_ROWS):
                    y0 = _BRICK_TOP + r * _BRICK_H
                    for c in np.nonzero(self._bricks[r])[0]:
                        x0 = _WALL + int(c) * _BRICK_W
                        s[y0:y0 + _BRICK_H - 1, x0:x0 + _BRICK_W - 1] = _ROW_COLORS[r]
                px = int(self._paddle_x)
                s[_PADDLE_Y:_PADDLE_Y + _PADDLE_H,
                  max(0, px - _PADDLE_W // 2):px + _PADDLE_W // 2] = (200, 72, 72)
                bx, by = int(self._ball_x), int(self._ball_y)
                s[max(0, by - 2):by + 2, max(0, bx - 1):bx + 1] = (200, 72, 72)
                return s

        return _Env(render_mode=outer[0], frameskip=outer[1],
                    repeat_action_probability=outer[2])


class FakePongEnv:
    """Pong toy: player paddle (right) vs a ball-tracking opponent, first
    to 21. Exposes the Pong RAM addresses the description generator reads
    (`clip_ppo_atari.py:370-442`). ALE Pong reports ``lives() == 0``
    throughout, which this reproduces (EpisodicLife then never fires)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 60}

    def __new__(cls, render_mode=None, frameskip=1,
                repeat_action_probability=0.0):
        import gymnasium as gym

        outer = (render_mode, frameskip, repeat_action_probability)

        class _Env(gym.Env):
            metadata = cls.metadata

            def __init__(self, render_mode=None, frameskip=1,
                         repeat_action_probability=0.0):
                self.render_mode = render_mode
                self._frameskip = frameskip
                self._sticky_p = float(repeat_action_probability)
                self._exec_action = 0
                self._raw_frames = 0
                self._sticky_repeats = 0
                self.observation_space = gym.spaces.Box(
                    0, 255, (210, 160, 3), np.uint8
                )
                self.action_space = gym.spaces.Discrete(4)
                self.ale = _FakeALEInterface(self)
                self._lives = 0  # ALE Pong has no lives counter
                self._p_score = 0
                self._e_score = 0
                self._player_y = 105.0   # right paddle
                self._enemy_y = 105.0    # left paddle
                self._ball_x = 80.0
                self._ball_y = 105.0
                self._vx = 0.0
                self._vy = 0.0
                self._serve_timer = 0

            def get_action_meanings(self):
                return ["NOOP", "FIRE", "RIGHT", "LEFT"]

            def _fill_ram(self) -> np.ndarray:
                ram = np.zeros(128, np.uint8)
                ram[13] = min(self._p_score, 255)   # player score
                ram[14] = min(self._e_score, 255)   # enemy score
                ram[49] = int(np.clip(self._ball_x, 0, 255))
                ram[54] = int(np.clip(self._ball_y, 0, 255))
                ram[51] = int(np.clip(self._player_y, 0, 255))
                ram[50] = int(np.clip(self._enemy_y, 0, 255))
                return ram

            def _serve(self, toward_player: bool):
                self._ball_x, self._ball_y = 80.0, 105.0
                self._vx = 2.0 if toward_player else -2.0
                self._vy = 1.5 if self.np_random.random() < 0.5 else -1.5
                self._serve_timer = 0

            def step(self, action):
                # same built-in frameskip + per-raw-frame sticky semantics
                # as the Breakout fake (see its step docstring).
                total = 0.0
                terminated = False
                for _ in range(self._frameskip):
                    self._raw_frames += 1
                    if (self._sticky_p > 0.0
                            and self.np_random.random() < self._sticky_p):
                        self._sticky_repeats += 1
                    else:
                        self._exec_action = action
                    r, terminated = self._frame(self._exec_action)
                    total += r
                    if terminated:
                        break
                return self._render_screen(), total, terminated, False, {}

            def _frame(self, action):
                reward = 0.0
                if action == 2:    # RIGHT = up
                    self._player_y = max(40.0, self._player_y - 4)
                elif action == 3:  # LEFT = down
                    self._player_y = min(180.0, self._player_y + 4)
                if self._vx == 0.0:
                    self._serve_timer += 1
                    if action == 1 or self._serve_timer > 40:
                        self._serve(toward_player=True)
                else:
                    # enemy tracks the ball with capped speed (beatable)
                    self._enemy_y += float(
                        np.clip(self._ball_y - self._enemy_y, -2.5, 2.5)
                    )
                    self._ball_x += self._vx
                    self._ball_y += self._vy
                    if self._ball_y <= 40 or self._ball_y >= 180:
                        self._vy = -self._vy
                    # paddles at x=140 (player) and x=20 (enemy)
                    if (self._vx > 0 and 138 <= self._ball_x <= 142
                            and abs(self._ball_y - self._player_y) <= 10):
                        self._vx = -abs(self._vx) - 0.1
                        self._vy += 0.3 * np.sign(self._ball_y - self._player_y)
                    if (self._vx < 0 and 18 <= self._ball_x <= 22
                            and abs(self._ball_y - self._enemy_y) <= 10):
                        self._vx = abs(self._vx) + 0.1
                    if self._ball_x > 158:   # past the player
                        self._e_score += 1
                        reward = -1.0
                        self._vx = self._vy = 0.0
                    elif self._ball_x < 2:   # past the enemy
                        self._p_score += 1
                        reward = 1.0
                        self._vx = self._vy = 0.0
                return reward, self._p_score >= 21 or self._e_score >= 21

            def reset(self, *, seed=None, options=None):
                super().reset(seed=seed)
                self._p_score = self._e_score = 0
                self._player_y = self._enemy_y = 105.0
                self._vx = self._vy = 0.0
                self._serve_timer = 0
                self._exec_action = 0
                self._ball_x, self._ball_y = 80.0, 105.0
                return self._render_screen(), {}

            def render(self):
                if self.render_mode == "rgb_array":
                    return self._render_screen()
                return None

            def _render_screen(self) -> np.ndarray:
                s = np.zeros((210, 160, 3), np.uint8)
                s[:34, :] = s[194:, :] = (236, 236, 236)
                py, ey = int(self._player_y), int(self._enemy_y)
                s[max(0, py - 8):py + 8, 140:144] = (92, 186, 92)
                s[max(0, ey - 8):ey + 8, 16:20] = (213, 130, 74)
                bx, by = int(self._ball_x), int(self._ball_y)
                s[max(0, by - 2):by + 2, max(0, bx - 1):bx + 1] = (236, 236, 236)
                return s

        return _Env(render_mode=outer[0], frameskip=outer[1],
                    repeat_action_probability=outer[2])


def register() -> str:
    """Idempotently register the fake env ids with gymnasium.

    Mirrors ale_py's registration split: ``*-v5`` ids carry built-in
    frameskip 4 + sticky actions 0.25; ``*NoFrameskip-v4`` ids are
    deterministic skip-1 (so the wrapper stack's MaxAndSkip(4) is the
    only frame skipping, as in the reference CLI default)."""
    import gymnasium as gym

    v5 = {"frameskip": 4, "repeat_action_probability": 0.25}
    v4 = {"frameskip": 1, "repeat_action_probability": 0.0}
    for env_id, entry, steps, kwargs in (
        # max_episode_steps counts agent-level env.step calls
        (FAKE_ENV_ID, FakeBreakoutEnv, 2000, v5),
        (FAKE_V4_ENV_ID, FakeBreakoutEnv, 2000, v4),
        (FAKE_PONG_ID, FakePongEnv, 8000, v5),  # a 21-point game runs long
        (FAKE_V4_PONG_ID, FakePongEnv, 8000, v4),
    ):
        if env_id not in gym.registry:
            gym.register(
                id=env_id, entry_point=entry,
                max_episode_steps=steps, kwargs=dict(kwargs),
            )
    return FAKE_ENV_ID
