"""gym adapter returns the TRUE terminal observation (no autoreset leak)."""

import numpy as np

from clip_ppo_tpu.envs.gym_adapter import make_env


def test_terminal_observation_is_final_state():
    """Drive Empty-5x5 to the goal with a known action sequence; the obs
    returned WITH terminated=True must show the terminal state, not the
    next episode's first frame (the agent starts at (1,1) facing right and
    the terminal obs differs from the fresh-reset obs)."""
    env = make_env("MiniGrid-Empty-5x5-v0", seed=0)
    first_obs, _ = env.reset()
    # Path to goal at (3,3): forward, forward, turn right, forward, forward.
    last = None
    for a in (2, 2, 1, 2, 2):
        obs, r, term, trunc, _ = env.step(a)
        last = (obs, r, term)
    obs, r, term = last
    assert term and r > 0
    # Terminal obs ≠ the initial observation of a fresh episode.
    assert not np.array_equal(obs, first_obs)
    # Post-terminal reset starts a new episode whose first obs matches the
    # canonical start (fixed start position in Empty-5x5).
    obs2, _ = env.reset(seed=0)
    assert np.array_equal(obs2, first_obs)
    env.close()


def test_truncation_returns_final_obs_too():
    env = make_env("MiniGrid-Empty-5x5-v0", seed=1)
    env.reset()
    for _ in range(100):  # max_steps for 5x5 = 100
        obs, r, term, trunc, _ = env.step(0)  # spin left
        if term or trunc:
            break
    assert trunc and not term
    env.close()
