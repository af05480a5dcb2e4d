"""LavaGap: generation structure, lava-death semantics, training smoke.

The reference trains any registered MiniGrid id via ``gym.make``
(`ppo_minigrid.py:106-119`); LavaGap demonstrates the pure-JAX env
framework generalizes beyond the Empty/DoorKey/FourRooms grid (upstream
minigrid `lavagap.py` semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg


def test_parse():
    p = mg.parse_env_id("MiniGrid-LavaGapS5-v0")
    assert p.kind == "lavagap" and p.width == 5 and p.max_steps == 100
    assert not p.see_through_walls
    p7 = mg.parse_env_id("MiniGrid-LavaGapS7-v0")
    assert p7.width == 7 and p7.max_steps == 196


@pytest.mark.parametrize("seed", [0, 1, 7, 42])
def test_generation_structure(seed):
    p = mg.parse_env_id("MiniGrid-LavaGapS7-v0")
    s = mg.reset(p, jax.random.PRNGKey(seed))
    g = np.asarray(s.grid)
    w, h = 7, 7
    # exactly one lava column with exactly one gap
    lava_cols = np.unique(np.argwhere(g[..., 0] == mg.LAVA)[:, 0])
    assert len(lava_cols) == 1
    x = int(lava_cols[0])
    assert 2 <= x <= w - 3
    col = g[x, 1:-1, 0]
    assert (col == mg.LAVA).sum() == h - 3  # full strip minus the gap
    assert (col == mg.EMPTY).sum() == 1
    # agent fixed at (1,1) facing right, goal bottom-right
    assert tuple(np.asarray(s.agent_pos)) == (1, 1)
    assert int(s.agent_dir) == 0
    assert g[w - 2, h - 2, 0] == mg.GOAL


def test_walking_into_lava_terminates_with_zero_reward():
    p = mg.parse_env_id("MiniGrid-LavaGapS5-v0")
    # find a seed where the lava column is at x=2 with gap NOT at y=1,
    # so stepping forward twice from (1,1) dir=0 hits lava
    for seed in range(50):
        s = mg.reset(p, jax.random.PRNGKey(seed))
        g = np.asarray(s.grid)
        if g[2, 1, 0] == mg.LAVA:
            break
    else:
        pytest.fail("no seed with lava at (2,1)")
    s2, reward, terminated, truncated = mg.step(p, s, jnp.int32(mg.A_FORWARD))
    assert bool(terminated) and float(reward) == 0.0


def test_crossing_the_gap_reaches_goal():
    """A scripted path through the gap wins with the standard reward
    1 - 0.9·steps/max_steps."""
    p = mg.parse_env_id("MiniGrid-LavaGapS5-v0")
    # seed with gap at (2, 1): agent at (1,1) facing right walks straight
    # through, then to the goal at (3,3)
    for seed in range(100):
        s = mg.reset(p, jax.random.PRNGKey(seed))
        g = np.asarray(s.grid)
        if g[2, 1, 0] == mg.EMPTY and g[2, 2, 0] == mg.LAVA:
            break
    else:
        pytest.fail("no seed with gap at (2,1)")
    actions = [mg.A_FORWARD, mg.A_FORWARD,       # (3,1)
               mg.A_RIGHT, mg.A_FORWARD, mg.A_FORWARD]  # face down, to (3,3)
    total_steps = 0
    for a in actions:
        s, reward, terminated, truncated = mg.step(p, s, jnp.int32(a))
        total_steps += 1
    assert bool(terminated)
    expected = 1.0 - 0.9 * total_steps / p.max_steps
    assert abs(float(reward) - expected) < 1e-6


def test_vector_env_and_training_smoke():
    env = JaxVectorEnv("MiniGrid-LavaGapS5-v0", 2, obs_size=84)
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    assert obs.shape == (2, 84, 84, 3)
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=2)
    st = tr.init_state(init_agent_params(jax.random.PRNGKey(0), env.num_actions), 0)
    st, sc, _ = tr.run_iteration(st, 1)
    assert np.isfinite(float(sc["policy_loss"]))
