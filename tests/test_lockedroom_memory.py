"""LockedRoom + Memory families: layout invariants and scripted
semantics (the reference trains any registered MiniGrid id via gym.make,
`ppo_minigrid.py:106-119`).

Upstream minigrid is not installed in this image; parity is structural
against the upstream generators (minigrid/envs/lockedroom.py, memory.py
— reconstructed): generator invariants over seeds plus scripted episodes
for the terminal rules.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg


def _face(st, pos, dirn):
    return dataclasses.replace(
        st, agent_pos=jnp.asarray(pos, jnp.int32), agent_dir=jnp.int32(dirn))


def _step(params, st, action):
    st, r, term, trunc = mg.step(params, st, jnp.int32(action))
    return st, float(r), bool(term), bool(trunc)


def test_parse_lockedroom_memory_ids():
    p = mg.parse_env_id("MiniGrid-LockedRoom-v0")
    assert (p.kind, p.width, p.max_steps) == ("lockedroom", 19, 190)
    assert not p.see_through_walls and p.success == "goal"
    p = mg.parse_env_id("MiniGrid-MemoryS13-v0")
    assert (p.kind, p.width, p.max_steps) == ("memory", 13, 5 * 169)
    assert p.success == "memory" and not p.random_length
    p = mg.parse_env_id("MiniGrid-MemoryS17Random-v0")
    assert (p.width, p.random_length) == (17, True)


# ---------------------------------------------------------------------------
# LockedRoom
# ---------------------------------------------------------------------------


def test_lockedroom_structure():
    params = mg.parse_env_id("MiniGrid-LockedRoom-v0")
    door_cells = {(7, 3), (7, 9), (7, 15), (11, 3), (11, 9), (11, 15)}
    for seed in range(6):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        doors = {tuple(map(int, d)) for d in np.argwhere(obj == mg.DOOR)}
        assert doors == door_cells
        # exactly one locked door, distinct colors
        locked = [(x, y) for x, y in doors if g[x, y, 2] == mg.LOCKED]
        assert len(locked) == 1
        assert len({int(g[x, y, 1]) for x, y in doors}) == 6
        # goal inside the locked room, key (matching color) in another room
        (gx, gy) = map(int, np.argwhere(obj == mg.GOAL)[0])
        (kx, ky) = map(int, np.argwhere(obj == mg.KEY)[0])
        (lx, ly) = locked[0]
        assert g[kx, ky, 1] == g[lx, ly, 1]

        def room_of(x, y):
            return (0 if x < 7 else 1), (y - 1) // 6

        locked_room = ((0 if lx == 7 else 1), (ly - 3) // 6)
        assert room_of(gx, gy) == locked_room, "goal inside the locked room"
        assert room_of(kx, ky) != locked_room, "key in a different room"
        # agent on a free hallway cell (strictly between the room walls)
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert 7 < ax < 11 and 0 < ay < 18
        assert obj[ax, ay] == mg.EMPTY


def test_lockedroom_key_unlocks_and_goal_rewards():
    params = mg.parse_env_id("MiniGrid-LockedRoom-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    (lx, ly) = [tuple(map(int, d)) for d in np.argwhere(
        (g[..., 0] == mg.DOOR) & (g[..., 2] == mg.LOCKED))][0]
    color = int(g[lx, ly, 1])
    # face the door from the hallway side
    nx = lx - 1 if lx == 11 else lx + 1
    st1 = _face(st, (nx, ly), 0 if lx == 11 else 2)
    # without the key the locked door won't open
    st2, r, term, _ = _step(params, st1, mg.A_TOGGLE)
    assert np.asarray(st2.grid)[lx, ly, 2] == mg.LOCKED
    # with the matching key it unlocks
    st3 = dataclasses.replace(
        st1, carrying=jnp.asarray([mg.KEY, color, 0], jnp.int8))
    st4, r, term, _ = _step(params, st3, mg.A_TOGGLE)
    assert np.asarray(st4.grid)[lx, ly, 2] == mg.OPEN
    # stepping onto the goal pays the time-scaled reward
    (gx, gy) = map(int, np.argwhere(np.asarray(st4.grid)[..., 0] == mg.GOAL)[0])
    for dirn, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
        px, py = gx - dx, gy - dy
        if np.asarray(st4.grid)[px, py, 0] == mg.EMPTY:
            st5, r, term, _ = _step(params, _face(st4, (px, py), dirn),
                                    mg.A_FORWARD)
            assert term and r == pytest.approx(
                1.0 - 0.9 * 2 / params.max_steps)
            return
    raise AssertionError("goal has no free neighbor")


# ---------------------------------------------------------------------------
# Memory
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id", [
    "MiniGrid-MemoryS7-v0", "MiniGrid-MemoryS13-v0",
])
def test_memory_structure(env_id):
    params = mg.parse_env_id(env_id)
    mid = params.height // 2
    hallway_end = params.width - 3
    for seed in range(6):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        # start object in the start room, green, key or ball
        assert obj[1, mid - 1] in (mg.KEY, mg.BALL)
        # fork pair: one ball + one key on the far side of the vertical wall
        top = obj[hallway_end + 1, mid - 2]
        bot = obj[hallway_end + 1, mid + 2]
        assert {int(top), int(bot)} == {mg.KEY, mg.BALL}
        assert (g[[1, hallway_end + 1, hallway_end + 1],
                  [mid - 1, mid - 2, mid + 2], 1] == mg.GREEN).all()
        # success cell fronts the matching object, failure the other
        t = np.asarray(st.target)
        sx, sy, fx, fy = map(int, t[:4])
        assert sx == fx == hallway_end + 1
        match_y = mid - 2 if obj[1, mid - 1] == top else mid + 2
        assert abs(sy - match_y) == 1 and {sy, fy} == {mid - 1, mid + 1}
        # agent on the hallway row facing right
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert ay == mid and 1 <= ax <= hallway_end
        assert int(st.agent_dir) == 0


def test_memory_random_length_varies():
    params = mg.parse_env_id("MiniGrid-MemoryS17Random-v0")
    xs = set()
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        t = np.asarray(st.target)
        xs.add(int(t[0]))
    assert len(xs) > 1, "Random variant must vary the hallway length"
    assert all(5 <= x <= params.width - 2 for x in xs)


def _memory_walk_to(params, st, y_offset):
    """Walk the agent from the fork gap onto (sx, mid+y_offset)."""
    mid = params.height // 2
    t = np.asarray(st.target)
    sx = int(t[0])
    st = _face(st, (sx - 1, mid), 0)
    st, r, term, trunc = _step(params, st, mg.A_FORWARD)  # onto (sx, mid)
    assert not term
    turn = mg.A_LEFT if y_offset < 0 else mg.A_RIGHT
    st, r, term, trunc = _step(params, st, turn)
    assert not term
    return _step(params, st, mg.A_FORWARD)


def test_memory_success_and_failure_cells():
    params = mg.parse_env_id("MiniGrid-MemoryS13-v0")
    st = mg.reset(params, jax.random.PRNGKey(3))
    mid = params.height // 2
    t = np.asarray(st.target)
    sy = int(t[1])
    # walk to the success cell → time-scaled reward
    st2, r, term, _ = _memory_walk_to(params, st, sy - mid)
    assert term and r == pytest.approx(1.0 - 0.9 * 3 / params.max_steps)
    # walk to the failure cell → terminated with 0
    st3, r, term, _ = _memory_walk_to(params, st, (mid - sy))
    assert term and r == 0.0


def test_memory_pickup_is_remapped_to_toggle():
    """pickup at the fork must NOT lift the object (upstream remaps
    pickup → toggle)."""
    params = mg.parse_env_id("MiniGrid-MemoryS13-v0")
    st = mg.reset(params, jax.random.PRNGKey(3))
    g = np.asarray(st.grid)
    mid = params.height // 2
    t = np.asarray(st.target)
    sx, sy = int(t[0]), int(t[1])
    obj_y = mid - 2 if sy == mid - 1 else mid + 2
    st = _face(st, (sx, sy), 3 if obj_y < mid else 1)
    st2, r, term, _ = _step(params, st, mg.A_PICKUP)
    assert int(st2.carrying[0]) == 0
    g2 = np.asarray(st2.grid)
    assert g2[sx, obj_y, 0] in (mg.KEY, mg.BALL)


def test_lockedroom_memory_train_end_to_end():
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    for env_id in ("MiniGrid-LockedRoom-v0", "MiniGrid-MemoryS7-v0"):
        cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                        update_epochs=2)
        env = JaxVectorEnv(env_id, cfg.num_envs)
        tr = Trainer(cfg, env, num_iterations=2)
        params = init_agent_params(jax.random.PRNGKey(0), env.num_actions,
                                   in_channels=3)
        st = tr.init_state(params, seed=0)
        st, packed = tr.run_iterations(st, 1, 2)
        logs = tr.fetch_logs_chunk(packed)
        assert all(np.isfinite(sc["policy_loss"]) for sc, _ in logs)
