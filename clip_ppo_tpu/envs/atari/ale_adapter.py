"""Import-gated ALE adapter: the exact emulator wrapper stack, host-side.

The pure-JAX games (`clip_ppo_tpu.envs.atari.core`) are the TPU-native
default. For hosts that have ``ale_py``/``gymnasium[atari]`` installed and
need the *exact* ALE emulator semantics (e.g. Seaquest, or strict
cross-framework comparisons), this module provides the reference's
wrapper stack (`atari_experiments/atari_wrappers.py:36-325`,
`clip_ppo_atari.py:149-168`) rebuilt on gymnasium's maintained wrapper
implementations, plus a SyncVectorEnv adapter exposing the same interface
as :class:`AtariVectorEnv` (numpy host API + RAM-based descriptions).

This is host I/O, not device compute (SURVEY §2b): the ALE's C++ core
does the emulation; observations are batched on the host and shipped to
the device per rollout chunk. Everything degrades with a clear error when
ale_py is absent.
"""

from __future__ import annotations

import numpy as np


def ale_available() -> bool:
    try:
        import ale_py  # noqa: F401

        return True
    except ImportError:
        return False


def _ensure_ale(env_id: str):
    """Make ``env_id`` resolvable: register ale_py's envs when installed,
    the fake-ALE stub for ``FakeALE/*`` ids, and accept any id already in
    gymnasium's registry (an ALE-compatible env someone registered
    themselves). Raises an informative ImportError otherwise."""
    import gymnasium as gym

    if env_id.startswith("FakeALE/"):
        from clip_ppo_tpu.envs.atari import fake_ale

        fake_ale.register()
        return
    try:
        import ale_py

        gym.register_envs(ale_py)
    except ImportError:
        if env_id in gym.registry:
            return
        raise ImportError(
            f"ale_py is not installed and {env_id!r} is not registered "
            "with gymnasium; the pure-JAX Breakout/Pong backend "
            "(clip_ppo_tpu.envs.atari.core) is the default. Install "
            "ale_py + gymnasium[atari] to use the emulator adapter, or "
            "use the 'FakeALE/Breakout-v5' CI stub."
        )


def make_ale_env(
    env_id: str,
    idx: int = 0,
    capture_video: bool = False,
    run_name: str = "",
    noop_max: int = 30,
    frame_skip: int = 4,
    screen_size: int = 84,
):
    """Single-env thunk with the reference wrapper stack
    (`clip_ppo_atari.py:149-168`): RecordEpisodeStatistics → Noop(30) →
    MaxAndSkip(4) → EpisodicLife → FireReset → ClipReward → Resize(84) →
    Grayscale → FrameStack(4), in that exact order.

    Crucially, ``gym.make(env_id)`` gets NO frameskip override — exactly
    like the reference's ``make_env`` — so the id's built-in registration
    semantics apply UNDER MaxAndSkip(4): ``ALE/*-v5`` ids (the
    orchestrator grid, `run_experiments.py:86-89`) run with built-in
    frameskip 4 + sticky actions 0.25 for an effective 16 raw frames per
    agent step, while ``*NoFrameskip-v4`` ids (the CLI default) are
    deterministic skip-1 for the classic effective skip of 4."""
    _ensure_ale(env_id)
    import gymnasium as gym

    def thunk():
        if capture_video and idx == 0:
            env = gym.make(env_id, render_mode="rgb_array")
            env = gym.wrappers.RecordVideo(env, f"videos/atari/{run_name}")
        else:
            env = gym.make(env_id)
        env = gym.wrappers.RecordEpisodeStatistics(env)
        env = _NoopReset(env, noop_max=noop_max)
        env = _MaxAndSkip(env, skip=frame_skip)
        env = _EpisodicLife(env)
        if "FIRE" in env.unwrapped.get_action_meanings():
            env = _FireReset(env)
        env = gym.wrappers.TransformReward(env, np.sign)
        env = gym.wrappers.ResizeObservation(env, (screen_size, screen_size))
        env = gym.wrappers.GrayscaleObservation(env)
        env = gym.wrappers.FrameStackObservation(env, 4)
        return env

    return thunk


class _NoopReset:
    """Random [1, noop_max] NOOP steps after reset to randomize initial
    state (`atari_wrappers.py:62-92` contract; re-reset if an episode ends
    mid-noop)."""

    def __new__(cls, env, noop_max: int = 30):
        import gymnasium as gym

        class NoopReset(gym.Wrapper):
            def reset(self, **kwargs):
                obs, info = self.env.reset(**kwargs)
                noops = int(self.unwrapped.np_random.integers(1, noop_max + 1))
                for _ in range(noops):
                    obs, _, terminated, truncated, info = self.env.step(0)
                    if terminated or truncated:
                        obs, info = self.env.reset(**kwargs)
                return obs, info

        return NoopReset(env)


class _MaxAndSkip:
    """Repeat the action over ``skip`` env steps, sum the rewards, and
    return the pixelwise max of the last two frames (flicker removal,
    `atari_wrappers.py:169-211` contract; stops early when the episode
    ends — the done-frame observation is unused downstream)."""

    def __new__(cls, env, skip: int = 4):
        import gymnasium as gym

        class MaxAndSkip(gym.Wrapper):
            def step(self, action):
                total = 0.0
                prev = obs = None
                terminated = truncated = False
                info: dict = {}
                for _ in range(skip):
                    nxt, reward, terminated, truncated, info = self.env.step(action)
                    prev, obs = obs, nxt
                    total += float(reward)
                    if terminated or truncated:
                        break
                frame = obs if prev is None else np.maximum(obs, prev)
                return frame, total, terminated, truncated, info

        return MaxAndSkip(env)


def _gym_wrapper_base():
    import gymnasium as gym

    return gym.Wrapper


class _EpisodicLife:
    """Life loss → terminated for the agent; real reset only at game over
    (`atari_wrappers.py:117-165` contract)."""

    def __new__(cls, env):
        import gymnasium as gym

        class EpisodicLife(gym.Wrapper):
            def __init__(self, env):
                super().__init__(env)
                self.lives = 0
                self.was_real_done = True

            def step(self, action):
                obs, reward, terminated, truncated, info = self.env.step(action)
                self.was_real_done = terminated or truncated
                lives = self.env.unwrapped.ale.lives()
                if 0 < lives < self.lives:
                    terminated = True
                self.lives = lives
                return obs, reward, terminated, truncated, info

            def reset(self, **kwargs):
                if self.was_real_done:
                    obs, info = self.env.reset(**kwargs)
                else:
                    obs, reward, terminated, truncated, info = self.env.step(0)
                    if terminated or truncated:
                        obs, info = self.env.reset(**kwargs)
                self.lives = self.env.unwrapped.ale.lives()
                return obs, info

        return EpisodicLife(env)


class _FireReset:
    """Press FIRE after reset for envs that need it
    (`atari_wrappers.py:94-114` contract)."""

    def __new__(cls, env):
        import gymnasium as gym

        class FireReset(gym.Wrapper):
            def reset(self, **kwargs):
                self.env.reset(**kwargs)
                obs, _, terminated, truncated, info = self.env.step(1)
                if terminated or truncated:
                    self.env.reset(**kwargs)
                obs, _, terminated, truncated, info = self.env.step(2)
                if terminated or truncated:
                    obs, info = self.env.reset(**kwargs)
                return obs, info

        return FireReset(env)


class ALEVectorEnv:
    """SyncVectorEnv over :func:`make_ale_env` with the AtariVectorEnv host
    interface (reset/step numpy API, NHWC uint8 [N,84,84,4] obs, RAM-based
    ``describe``)."""

    def __init__(self, env_id: str, num_envs: int, capture_video: bool = False,
                 run_name: str = ""):
        _ensure_ale(env_id)
        import gymnasium as gym

        self.env_id = env_id
        self.num_envs = num_envs
        # SAME_STEP autoreset: gymnasium 1.x defaults to NEXT_STEP, where
        # the post-done step ignores the agent's action and returns a fake
        # transition — HostTrainer's CleanRL-style rollout (and GAE) assume
        # the same-step semantics the pure-JAX envs implement.
        self.envs = gym.vector.SyncVectorEnv(
            [make_ale_env(env_id, i, capture_video, run_name) for i in range(num_envs)],
            autoreset_mode=gym.vector.AutoresetMode.SAME_STEP,
        )
        self.num_actions = int(self.envs.single_action_space.n)

    @staticmethod
    def _to_nhwc(obs: np.ndarray) -> np.ndarray:
        # FrameStackObservation yields [N, 4, 84, 84]; the framework is NHWC.
        return np.moveaxis(np.asarray(obs), 1, -1)

    def reset(self, seed: int = 0):
        obs, info = self.envs.reset(seed=seed)
        return self._to_nhwc(obs), info

    def step(self, actions: np.ndarray):
        obs, reward, terminated, truncated, infos = self.envs.step(actions)
        # Lift SAME_STEP-mode episode statistics to the vectorized
        # ``infos["episode"]["_r"]`` format the reference CLIP scripts (and
        # HostTrainer) consume (`clip_ppo_atari.py:602-616`).
        fi = infos.get("final_info")
        if fi and "episode" in fi:
            infos = dict(infos, episode=fi["episode"])
        return self._to_nhwc(obs), reward, terminated, truncated, infos

    def close(self):
        self.envs.close()

    def frame_env0(self) -> np.ndarray:
        """Current RGB screen of env 0 (for host-side video capture when
        moviepy-backed RecordVideo is unavailable)."""
        return np.asarray(self.envs.envs[0].unwrapped.ale.getScreenRGB())

    def describe(self, _state=None) -> list[str]:
        """RAM-based descriptions with the reference's addresses and phrase
        logic (`clip_ppo_atari.py:302-442`)."""
        from clip_ppo_tpu.envs.atari import core as jax_core

        rams = []
        for env in self.envs.envs:
            rams.append(np.asarray(env.unwrapped.ale.getRAM()))
        if "Breakout" in self.env_id:
            return jax_core.describe_breakout(
                score=np.array([r[36] * 100 + r[37] * 10 + r[38] for r in rams]),
                ball_x=np.array([r[99] for r in rams]),
                ball_y=np.array([r[101] for r in rams]),
                paddle_x=np.array([r[72] for r in rams]),
                lives=np.array([r[57] & 0x7 for r in rams]),
            )
        if "Pong" in self.env_id:
            return jax_core.describe_pong(
                player_score=np.array([r[13] for r in rams]),
                enemy_score=np.array([r[14] for r in rams]),
                ball_x=np.array([r[49] for r in rams]),
                ball_y=np.array([r[54] for r in rams]),
                player_y=np.array([r[51] for r in rams]),
                enemy_y=np.array([r[50] for r in rams]),
            )
        raise ValueError(f"{self.env_id} not supported for CLIP PPO")
