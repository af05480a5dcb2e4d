"""FourRooms: generation structure, connectivity, training smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg


def test_parse():
    p = mg.parse_env_id("MiniGrid-FourRooms-v0")
    assert p.kind == "fourrooms" and p.width == 19 and p.max_steps == 100
    assert not p.see_through_walls


@pytest.mark.parametrize("seed", [0, 1, 7, 42])
def test_generation_structure(seed):
    p = mg.parse_env_id("MiniGrid-FourRooms-v0")
    s = mg.reset(p, jax.random.PRNGKey(seed))
    g = np.asarray(s.grid)
    mx, my = 9, 9
    # central cross is wall except exactly four gaps
    vert = g[mx, 1:-1, 0]
    horz = g[1:-1, my, 0]
    assert (vert == mg.WALL).sum() == len(vert) - 2 - (g[mx, my, 0] != mg.WALL)
    # one gap in each half-segment
    assert (g[mx, 1:my, 0] == mg.EMPTY).sum() == 1
    assert (g[mx, my + 1 : -1, 0] == mg.EMPTY).sum() == 1
    assert (g[1:mx, my, 0] == mg.EMPTY).sum() == 1
    assert (g[mx + 1 : -1, my, 0] == mg.EMPTY).sum() == 1
    # exactly one goal, agent not on it
    goals = np.argwhere(g[..., 0] == mg.GOAL)
    assert len(goals) == 1
    ax, ay = np.asarray(s.agent_pos)
    assert not (goals[0] == [ax, ay]).all()
    assert g[ax, ay, 0] == mg.EMPTY


def test_rooms_connected():
    """All empty cells (+goal) form one connected component through the
    four gaps — the maze is always solvable."""
    from collections import deque

    p = mg.parse_env_id("MiniGrid-FourRooms-v0")
    for seed in range(5):
        s = mg.reset(p, jax.random.PRNGKey(seed))
        g = np.asarray(s.grid)[..., 0]
        passable = (g == mg.EMPTY) | (g == mg.GOAL)
        start = tuple(np.argwhere(passable)[0])
        seen = {start}
        dq = deque([start])
        while dq:
            x, y = dq.popleft()
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                n = (x + dx, y + dy)
                if (
                    0 <= n[0] < 19 and 0 <= n[1] < 19
                    and passable[n] and n not in seen
                ):
                    seen.add(n)
                    dq.append(n)
        assert len(seen) == int(passable.sum())


def test_vector_env_and_training_smoke():
    env = JaxVectorEnv("MiniGrid-FourRooms-v0", 2, obs_size=84)
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    assert obs.shape == (2, 84, 84, 3)
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    cfg = PPOConfig(num_envs=2, num_steps=8, num_minibatches=2, update_epochs=1)
    tr = Trainer(cfg, env, num_iterations=2)
    st = tr.init_state(init_agent_params(jax.random.PRNGKey(0), env.num_actions), 0)
    st, sc, _ = tr.run_iteration(st, 1)
    assert np.isfinite(float(sc["policy_loss"]))


def test_truncates_at_100():
    p = mg.parse_env_id("MiniGrid-FourRooms-v0")
    s = mg.reset(p, jax.random.PRNGKey(3))
    for i in range(100):
        s, r, term, trunc = mg.step(p, s, jnp.int32(mg.A_LEFT))  # spin
    assert bool(trunc)
