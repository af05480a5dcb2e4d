"""Unlock family: generation invariants, open-door success semantics,
vector-env integration (the reference trains any registered MiniGrid id
via gym.make, `ppo_minigrid.py:106-119`; Unlock exercises the one success
condition the other families don't — terminating on a door toggle,
upstream minigrid/envs/unlock.py).

Upstream minigrid is not installed in this image, so parity is
structural: sampled layouts must satisfy the upstream generator's
invariants, and the scripted solve pins the step() semantics.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg

PARAMS = mg.parse_env_id("MiniGrid-Unlock-v0")


def test_parse_env_id():
    assert PARAMS.kind == "unlock"
    assert (PARAMS.width, PARAMS.height) == (11, 6)  # RoomGrid 2×1, size 6
    assert PARAMS.max_steps == 8 * 6 * 6
    assert PARAMS.success == "open_door"
    assert not PARAMS.see_through_walls
    assert mg.parse_env_id("MiniGrid-Unlock").kind == "unlock"


@pytest.mark.parametrize("seed", range(20))
def test_layout_invariants(seed):
    state = mg.reset(PARAMS, jax.random.PRNGKey(seed))
    grid = np.asarray(state.grid)

    # Dividing wall at x=5 holds exactly one LOCKED door, y in [1, 4].
    col = grid[5]
    doors = np.nonzero(col[:, 0] == mg.DOOR)[0]
    assert len(doors) == 1
    (door_y,) = doors
    assert 1 <= door_y <= PARAMS.height - 2
    assert col[door_y, 2] == mg.LOCKED
    assert all(col[y, 0] == mg.WALL for y in range(6) if y != door_y)

    # Exactly one key, in the left room, matching the door's color.
    keys = np.argwhere(grid[..., 0] == mg.KEY)
    assert len(keys) == 1
    kx, ky = keys[0]
    assert 1 <= kx <= 4 and 1 <= ky <= 4
    assert grid[kx, ky, 1] == col[door_y, 1]

    # No goal square anywhere; whole grid is the only door + key + walls.
    assert not (grid[..., 0] == mg.GOAL).any()

    # Agent on an empty left-room cell (not the key cell).
    ax, ay = np.asarray(state.agent_pos)
    assert 1 <= ax <= 4 and 1 <= ay <= 4
    assert grid[ax, ay, 0] == mg.EMPTY


def _state_with(agent_pos, agent_dir, carrying=None, door_state=mg.LOCKED):
    """Deterministic 11×6 unlock layout: door at (5, 2) (red), key at
    (1, 1)."""
    state = mg.reset(PARAMS, jax.random.PRNGKey(0))
    grid = np.asarray(state.grid).copy()
    grid[5, :, :] = [mg.WALL, mg.GREY, 0]
    grid[5, 2] = [mg.DOOR, mg.RED, door_state]
    grid[(grid[..., 0] == mg.KEY).nonzero()] = [mg.EMPTY, 0, 0]
    grid[1, 1] = [mg.KEY, mg.RED, 0]
    carrying = carrying if carrying is not None else [0, 0, 0]
    return dataclasses.replace(
        state,
        grid=jnp.asarray(grid, jnp.int8),
        agent_pos=jnp.asarray(agent_pos, jnp.int32),
        agent_dir=jnp.int32(agent_dir),
        carrying=jnp.asarray(carrying, jnp.int8),
        step_count=jnp.int32(0),
    )


def test_toggle_with_key_opens_and_terminates():
    # Facing the door at (5,2) from (4,2), carrying the red key.
    state = _state_with((4, 2), 0, carrying=[mg.KEY, mg.RED, 0])
    new, reward, terminated, truncated = mg.step(
        PARAMS, state, jnp.int32(mg.A_TOGGLE)
    )
    assert bool(terminated)
    assert float(reward) == pytest.approx(1.0 - 0.9 * 1 / PARAMS.max_steps)
    assert int(np.asarray(new.grid)[5, 2, 2]) == mg.OPEN


def test_toggle_without_key_stays_locked():
    state = _state_with((4, 2), 0)
    new, reward, terminated, _ = mg.step(PARAMS, state, jnp.int32(mg.A_TOGGLE))
    assert not bool(terminated)
    assert float(reward) == 0.0
    assert int(np.asarray(new.grid)[5, 2, 2]) == mg.LOCKED


def test_toggle_wrong_color_key_stays_locked():
    state = _state_with((4, 2), 0, carrying=[mg.KEY, mg.BLUE, 0])
    new, reward, terminated, _ = mg.step(PARAMS, state, jnp.int32(mg.A_TOGGLE))
    assert not bool(terminated)
    assert int(np.asarray(new.grid)[5, 2, 2]) == mg.LOCKED


def test_reopen_after_close_also_succeeds():
    # Upstream checks door.is_open after ANY toggle: closing an open door
    # then toggling again terminates (the toggle leaves it open).
    state = _state_with((4, 2), 0, door_state=mg.OPEN)
    mid, reward, terminated, _ = mg.step(PARAMS, state, jnp.int32(mg.A_TOGGLE))
    assert not bool(terminated)  # open → closed: no success
    assert int(np.asarray(mid.grid)[5, 2, 2]) == mg.CLOSED
    new, reward, terminated, _ = mg.step(PARAMS, mid, jnp.int32(mg.A_TOGGLE))
    assert bool(terminated)  # closed → open: success
    assert float(reward) > 0


def test_scripted_solve_from_reset():
    """Pick up the key, walk to the door, toggle: positive reward."""
    state = _state_with((2, 1), 2)  # at (2,1) facing left toward key (1,1)
    s, r, term, _ = mg.step(PARAMS, state, jnp.int32(mg.A_PICKUP))
    assert int(np.asarray(s.carrying)[0]) == mg.KEY
    # turn around, walk to (4, 1): face right (dir 0) via two rights
    for a in (mg.A_RIGHT, mg.A_RIGHT, mg.A_FORWARD, mg.A_FORWARD):
        s, r, term, _ = mg.step(PARAMS, s, jnp.int32(a))
        assert not bool(term)
    # down to (4, 2), then face the door at (5, 2)
    for a in (mg.A_RIGHT, mg.A_FORWARD, mg.A_LEFT):
        s, r, term, _ = mg.step(PARAMS, s, jnp.int32(a))
        assert not bool(term)
    assert tuple(np.asarray(s.agent_pos)) == (4, 2)
    s, r, term, _ = mg.step(PARAMS, s, jnp.int32(mg.A_TOGGLE))
    assert bool(term) and float(r) > 0


PICKUP = mg.parse_env_id("MiniGrid-UnlockPickup-v0")


def test_unlockpickup_parse():
    assert PICKUP.kind == "unlock" and PICKUP.success == "pickup_box"
    assert (PICKUP.width, PICKUP.height) == (11, 6)


@pytest.mark.parametrize("seed", range(10))
def test_unlockpickup_layout(seed):
    state = mg.reset(PICKUP, jax.random.PRNGKey(seed))
    grid = np.asarray(state.grid)
    boxes = np.argwhere(grid[..., 0] == mg.BOX)
    assert len(boxes) == 1
    bx, by = boxes[0]
    assert 6 <= bx <= 9 and 1 <= by <= 4  # right room
    # Unlock invariants still hold (door/key/agent in the left room)
    assert len(np.argwhere(grid[..., 0] == mg.KEY)) == 1
    assert len(np.nonzero(grid[5, :, 0] == mg.DOOR)[0]) == 1


def test_unlockpickup_box_pickup_terminates():
    state = mg.reset(PICKUP, jax.random.PRNGKey(3))
    grid = np.asarray(state.grid).copy()
    # normalize: put the box at (7, 2) and the agent next to it, door open
    grid[(grid[..., 0] == mg.BOX).nonzero()] = [mg.EMPTY, 0, 0]
    grid[7, 2] = [mg.BOX, mg.PURPLE, 0]
    state = dataclasses.replace(
        state,
        grid=jnp.asarray(grid, jnp.int8),
        agent_pos=jnp.asarray([6, 2], jnp.int32),
        agent_dir=jnp.int32(0),
        carrying=jnp.zeros(3, jnp.int8),
        step_count=jnp.int32(0),
    )
    s, r, term, _ = mg.step(PICKUP, state, jnp.int32(mg.A_PICKUP))
    assert bool(term)
    assert float(r) == pytest.approx(1.0 - 0.9 * 1 / PICKUP.max_steps)
    assert int(np.asarray(s.carrying)[0]) == mg.BOX


def test_unlockpickup_key_pickup_does_not_terminate():
    state = mg.reset(PICKUP, jax.random.PRNGKey(4))
    grid = np.asarray(state.grid)
    kx, ky = np.argwhere(grid[..., 0] == mg.KEY)[0]
    state = dataclasses.replace(
        state,
        agent_pos=jnp.asarray([kx - 1, ky], jnp.int32)
        if kx > 1 else jnp.asarray([kx + 1, ky], jnp.int32),
        agent_dir=jnp.int32(0 if kx > 1 else 2),
        carrying=jnp.zeros(3, jnp.int8),
    )
    s, r, term, _ = mg.step(PICKUP, state, jnp.int32(mg.A_PICKUP))
    assert not bool(term) and float(r) == 0.0
    assert int(np.asarray(s.carrying)[0]) == mg.KEY


def test_vector_env_random_rollout():
    env = JaxVectorEnv("MiniGrid-Unlock-v0", 4)
    vec_state, obs0 = env.reset_fn(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    obs = obs0
    for _ in range(30):
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (4,), 0, mg.NUM_ACTIONS)
        vec_state, obs, reward, terminated, truncated, info = env.step_fn(
            vec_state, actions
        )
    assert obs.shape == obs0.shape and obs.dtype == obs0.dtype


BLOCKED = mg.parse_env_id("MiniGrid-BlockedUnlockPickup-v0")


def test_blocked_parse():
    assert BLOCKED.kind == "unlock" and BLOCKED.success == "pickup_box"
    assert BLOCKED.blocked_door and BLOCKED.max_steps == 16 * 36


@pytest.mark.parametrize("seed", range(10))
def test_blocked_layout(seed):
    """The blocking ball sits directly left of the locked door
    (upstream blockedunlockpickup.py _gen_grid), on top of the
    UnlockPickup invariants."""
    state = mg.reset(BLOCKED, jax.random.PRNGKey(seed))
    grid = np.asarray(state.grid)
    dy = np.nonzero(grid[5, :, 0] == mg.DOOR)[0]
    assert len(dy) == 1 and grid[5, dy[0], 2] == mg.LOCKED
    assert grid[4, dy[0], 0] == mg.BALL, "ball blocks the door"
    assert len(np.argwhere(grid[..., 0] == mg.BOX)) == 1
    assert len(np.argwhere(grid[..., 0] == mg.BALL)) == 1
    # key/agent never spawn under the ball (it occupies the cell first)
    assert len(np.argwhere(grid[..., 0] == mg.KEY)) == 1
    apos = np.asarray(state.agent_pos)
    assert grid[apos[0], apos[1], 0] == mg.EMPTY


def test_blocked_ball_pickup_does_not_terminate():
    """Moving the blocking ball is a necessary non-terminal step: pickup
    of the BALL neither ends the episode nor pays reward."""
    state = mg.reset(BLOCKED, jax.random.PRNGKey(1))
    grid = np.asarray(state.grid)
    dy = int(np.nonzero(grid[5, :, 0] == mg.DOOR)[0][0])
    state = dataclasses.replace(
        state,
        agent_pos=jnp.asarray([3, dy], jnp.int32),
        agent_dir=jnp.int32(0),
        carrying=jnp.zeros(3, jnp.int8),
    )
    s, r, term, _ = mg.step(BLOCKED, state, jnp.int32(mg.A_PICKUP))
    assert not bool(term) and float(r) == 0.0
    assert int(np.asarray(s.carrying)[0]) == mg.BALL
    assert np.asarray(s.grid)[4, dy, 0] == mg.EMPTY  # door now clear


def test_box_toggle_replaces_with_contents():
    """Upstream Box.toggle puts the box's contents on the grid — or
    nothing when the box is empty. An UnlockPickup box is empty, so
    toggling it destroys it (the episode becomes unwinnable, exactly
    like upstream); a box whose state channel encodes a hidden key
    (1 + color) reveals that key."""
    state = mg.reset(PICKUP, jax.random.PRNGKey(5))
    grid = np.asarray(state.grid).copy()
    bx, by = np.argwhere(grid[..., 0] == mg.BOX)[0]
    # empty box: toggle → gone
    st = dataclasses.replace(
        state,
        agent_pos=jnp.asarray([bx - 1, by], jnp.int32),
        agent_dir=jnp.int32(0),
    )
    s, r, term, _ = mg.step(PICKUP, st, jnp.int32(mg.A_TOGGLE))
    assert not bool(term) and float(r) == 0.0
    assert np.asarray(s.grid)[bx, by, 0] == mg.EMPTY
    # box hiding a purple key: toggle → the key appears
    grid[bx, by] = [mg.BOX, mg.GREY, 1 + mg.PURPLE]
    st = dataclasses.replace(st, grid=jnp.asarray(grid, jnp.int8))
    s, r, term, _ = mg.step(PICKUP, st, jnp.int32(mg.A_TOGGLE))
    cell = np.asarray(s.grid)[bx, by]
    assert cell[0] == mg.KEY and cell[1] == mg.PURPLE and cell[2] == 0


@pytest.mark.parametrize("suffix,key_in_box,blocked", [
    ("1Dl", False, False), ("1Dlh", True, False), ("1Dlhb", True, True),
])
def test_obstructedmaze_layout(suffix, key_in_box, blocked):
    """ObstructedMaze-1Dl{,h,hb}: the Unlock layout with a BLUE target
    ball in the right room; "h" hides the key in a box, "b" blocks the
    door with a non-blue ball."""
    p = mg.parse_env_id(f"MiniGrid-ObstructedMaze-{suffix}-v1")
    assert p.success == "pickup_ball" and p.target_color == mg.BLUE
    assert p.max_steps == 288
    for seed in range(8):
        state = mg.reset(p, jax.random.PRNGKey(seed))
        grid = np.asarray(state.grid)
        dy = np.nonzero(grid[5, :, 0] == mg.DOOR)[0]
        assert len(dy) == 1 and grid[5, dy[0], 2] == mg.LOCKED
        balls = np.argwhere(grid[..., 0] == mg.BALL)
        blue = [b for b in balls if grid[b[0], b[1], 1] == mg.BLUE]
        assert len(blue) == 1 and blue[0][0] >= 6, "blue target right room"
        if blocked:
            assert grid[4, dy[0], 0] == mg.BALL
            assert grid[4, dy[0], 1] != mg.BLUE, "v1 blocker is non-blue"
            assert len(balls) == 2
        else:
            assert len(balls) == 1
        keys = np.argwhere(grid[..., 0] == mg.KEY)
        boxes = np.argwhere(grid[..., 0] == mg.BOX)
        if key_in_box:
            assert len(keys) == 0 and len(boxes) == 1
            bx, by = boxes[0]
            assert bx <= 4, "box in the left room"
            assert grid[bx, by, 2] == 1 + grid[5, dy[0], 1], (
                "box hides the door-color key")
        else:
            assert len(boxes) == 0 and len(keys) == 1
            assert grid[keys[0][0], keys[0][1], 1] == grid[5, dy[0], 1]
        apos = np.asarray(state.agent_pos)
        assert apos[0] <= 4, "agent in the left room"


def test_obstructedmaze_blocker_pickup_not_terminal():
    p = mg.parse_env_id("MiniGrid-ObstructedMaze-1Dlhb-v1")
    state = mg.reset(p, jax.random.PRNGKey(0))
    grid = np.asarray(state.grid)
    dy = int(np.nonzero(grid[5, :, 0] == mg.DOOR)[0][0])
    st = dataclasses.replace(
        state,
        agent_pos=jnp.asarray([3, dy], jnp.int32),
        agent_dir=jnp.int32(0),
        carrying=jnp.zeros(3, jnp.int8),
    )
    s, r, term, _ = mg.step(p, st, jnp.int32(mg.A_PICKUP))
    assert not bool(term) and float(r) == 0.0
    assert int(np.asarray(s.carrying)[0]) == mg.BALL


def test_obstructedmaze_blue_ball_pickup_terminates():
    p = mg.parse_env_id("MiniGrid-ObstructedMaze-1Dl-v0")
    state = mg.reset(p, jax.random.PRNGKey(2))
    grid = np.asarray(state.grid)
    balls = np.argwhere(grid[..., 0] == mg.BALL)
    bx, by = balls[0]
    st = dataclasses.replace(
        state,
        agent_pos=jnp.asarray([bx - 1, by], jnp.int32),
        agent_dir=jnp.int32(0),
        carrying=jnp.zeros(3, jnp.int8),
    )
    s, r, term, _ = mg.step(p, st, jnp.int32(mg.A_PICKUP))
    assert bool(term) and float(r) > 0
