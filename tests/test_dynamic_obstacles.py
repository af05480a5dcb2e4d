"""Dynamic-Obstacles family: generation, stochastic ball movement, the
collision-terminates rule, restricted action space (the reference trains
any registered MiniGrid id via gym.make, `ppo_minigrid.py:106-119`;
upstream minigrid/envs/dynamicobstacles.py is the semantics source —
not installed here, so parity is structural + behavioral).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg

P8 = mg.parse_env_id("MiniGrid-Dynamic-Obstacles-8x8-v0")


def test_parse_env_id():
    assert P8.kind == "dynobs"
    assert (P8.width, P8.height) == (8, 8)
    assert P8.n_obstacles == 4
    assert P8.num_actions == 3
    assert P8.max_steps == 4 * 64
    assert P8.see_through_walls
    assert not P8.random_start
    pr = mg.parse_env_id("MiniGrid-Dynamic-Obstacles-Random-6x6-v0")
    assert pr.random_start and pr.n_obstacles == 3
    p5 = mg.parse_env_id("MiniGrid-Dynamic-Obstacles-5x5-v0")
    assert p5.n_obstacles == 2
    p16 = mg.parse_env_id("MiniGrid-Dynamic-Obstacles-16x16-v0")
    assert p16.n_obstacles == 8


@pytest.mark.parametrize("seed", range(10))
def test_layout_invariants(seed):
    state = mg.reset(P8, jax.random.PRNGKey(seed))
    grid = np.asarray(state.grid)
    balls = np.argwhere(grid[..., 0] == mg.BALL)
    assert len(balls) == 4
    # all balls interior, none on the goal or the agent
    assert (balls >= 1).all() and (balls <= 6).all()
    assert grid[6, 6, 0] == mg.GOAL
    ax, ay = np.asarray(state.agent_pos)
    assert (ax, ay) == (1, 1) and int(state.agent_dir) == 0
    assert not any((b == [ax, ay]).all() for b in balls)


def test_obstacles_move_and_conserve_count():
    state = mg.reset(P8, jax.random.PRNGKey(0))
    positions = set()
    for _ in range(20):
        state, r, term, trunc = mg.step(P8, state, jnp.int32(mg.A_LEFT))
        grid = np.asarray(state.grid)
        balls = np.argwhere(grid[..., 0] == mg.BALL)
        assert len(balls) == 4  # conserved
        # never on the agent or the goal, never in the border walls
        assert (balls >= 1).all() and (balls <= 6).all()
        assert not any(tuple(b) == tuple(np.asarray(state.agent_pos))
                       for b in balls)
        assert grid[6, 6, 0] == mg.GOAL
        positions.add(tuple(map(tuple, sorted(map(tuple, balls)))))
    assert len(positions) > 1  # they actually move


def _fixed_state(agent_pos, agent_dir, ball_at=None):
    state = mg.reset(P8, jax.random.PRNGKey(0))
    grid = np.asarray(state.grid).copy()
    grid[(grid[..., 0] == mg.BALL).nonzero()] = [mg.EMPTY, 0, 0]
    balls = [(3, 5), (5, 3), (5, 5)]  # 3 fillers away from the action
    if ball_at is not None:
        balls = balls[:3] + [ball_at]
    else:
        balls = balls + [(3, 3)]
    for bx, by in balls:
        grid[bx, by] = [mg.BALL, mg.BLUE, 0]
    return dataclasses.replace(
        state,
        grid=jnp.asarray(grid, jnp.int8),
        agent_pos=jnp.asarray(agent_pos, jnp.int32),
        agent_dir=jnp.int32(agent_dir),
        step_count=jnp.int32(0),
    )


def test_forward_into_wall_terminates_minus_one():
    # Upstream quirk: not_clear counts ANY occupied non-goal cell,
    # including the border walls.
    state = _fixed_state((1, 1), 2)  # facing left into the border wall
    _, r, term, _ = mg.step(P8, state, jnp.int32(mg.A_FORWARD))
    assert bool(term) and float(r) == -1.0


def test_forward_into_ball_terminates_minus_one():
    # Ball boxed in by the agent's cell? No — surround it so it cannot
    # move: put it against the wall corner pocket. Simpler: the pre-move
    # grid is what the rule reads, so even if the ball moves away this
    # step, walking forward still scores −1 (upstream evaluates
    # not_clear before moving the obstacles).
    state = _fixed_state((2, 1), 0, ball_at=(3, 1))  # facing the ball
    _, r, term, _ = mg.step(P8, state, jnp.int32(mg.A_FORWARD))
    assert bool(term) and float(r) == -1.0


def test_goal_still_rewards():
    state = _fixed_state((5, 6), 0)  # facing the goal at (6, 6)
    _, r, term, _ = mg.step(P8, state, jnp.int32(mg.A_FORWARD))
    assert bool(term) and float(r) == pytest.approx(
        1.0 - 0.9 * 1 / P8.max_steps
    )


def test_out_of_range_action_wraps_to_left():
    state = _fixed_state((1, 1), 0)
    s1, r, term, _ = mg.step(P8, state, jnp.int32(5))  # >= 3 → left
    assert not bool(term) and float(r) == 0.0
    assert int(s1.agent_dir) == 3  # turned left from dir 0
    assert tuple(np.asarray(s1.agent_pos)) == (1, 1)


def test_blocked_ball_stays():
    # Box a ball into the corner pocket (1,1)-adjacent cells occupied:
    # ball at (1,2) with agent at (1,1), walls left/below, and fillers
    # at (2,1),(2,2),(2,3),(1,3): every neighbor is invalid → it stays.
    state = mg.reset(P8, jax.random.PRNGKey(0))
    grid = np.asarray(state.grid).copy()
    grid[(grid[..., 0] == mg.BALL).nonzero()] = [mg.EMPTY, 0, 0]
    for bx, by in [(1, 2), (2, 1), (2, 2), (2, 3)]:
        grid[bx, by] = [mg.BALL, mg.BLUE, 0]
    grid[1, 3] = [mg.WALL, mg.GREY, 0]
    state = dataclasses.replace(
        state, grid=jnp.asarray(grid, jnp.int8),
        agent_pos=jnp.asarray([1, 1], jnp.int32), agent_dir=jnp.int32(0),
    )
    s1, *_ = mg.step(P8, state, jnp.int32(mg.A_LEFT))
    assert np.asarray(s1.grid)[1, 2, 0] == mg.BALL


def test_vector_env_num_actions_and_rollout():
    env = JaxVectorEnv("MiniGrid-Dynamic-Obstacles-6x6-v0", 4)
    assert env.num_actions == 3
    assert env.single_action_space.n == 3
    vec_state, obs0 = env.reset_fn(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    done_seen = False
    for _ in range(40):
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (4,), 0, 3)
        vec_state, obs, reward, terminated, truncated, info = env.step_fn(
            vec_state, actions
        )
        done_seen = done_seen or bool(np.asarray(terminated).any())
    assert done_seen  # random walks collide quickly in a 6x6 with 3 balls
    assert obs.shape == obs0.shape
