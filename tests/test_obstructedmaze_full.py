"""ObstructedMaze Full family (2Dl*/1Q/2Q/Full) + Playground: layout
invariants and scripted semantics (the reference trains any registered
MiniGrid id via gym.make, `ppo_minigrid.py:106-119`).

Upstream minigrid is not installed in this image; parity is structural
against the upstream generators (minigrid/envs/obstructedmaze.py,
playground.py — reconstructed): generator invariants over seeds plus
scripted episodes for the unlock/pickup rules.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg

SIDE = ((2, 1), (1, 2), (0, 1), (1, 0))
CORNER = ((2, 0), (2, 2), (0, 2), (0, 0))


def _face(st, pos, dirn):
    return dataclasses.replace(
        st, agent_pos=jnp.asarray(pos, jnp.int32), agent_dir=jnp.int32(dirn))


def _step(params, st, action):
    st, r, term, trunc = mg.step(params, st, jnp.int32(action))
    return st, float(r), bool(term), bool(trunc)


def _room_of(x, y):
    return (x - 1) // 5, (y - 1) // 5


def test_parse_obstructed_full_ids():
    p = mg.parse_env_id("MiniGrid-ObstructedMaze-2Dl-v0")
    assert (p.kind, p.width, p.max_steps) == ("obstructedfull", 16, 576)
    assert not p.key_in_box and not p.blocked_door and p.agent_room == (2, 1)
    p = mg.parse_env_id("MiniGrid-ObstructedMaze-2Dlh-v0")
    assert p.key_in_box and not p.blocked_door
    p = mg.parse_env_id("MiniGrid-ObstructedMaze-2Dlhb-v1")
    assert p.key_in_box and p.blocked_door and p.min_rooms == 1
    p = mg.parse_env_id("MiniGrid-ObstructedMaze-1Q-v0")
    assert (p.max_steps, p.min_rooms, p.agent_room) == (720, 1, (1, 1))
    p = mg.parse_env_id("MiniGrid-ObstructedMaze-2Q-v0")
    assert (p.max_steps, p.min_rooms) == (1584, 2)
    p = mg.parse_env_id("MiniGrid-ObstructedMaze-Full-v0")
    assert (p.max_steps, p.min_rooms) == (3600, 4)
    assert p.success == "pickup_ball" and p.target_color == mg.BLUE
    p = mg.parse_env_id("MiniGrid-Playground-v0")
    assert (p.kind, p.width, p.max_steps) == ("playground", 19, 100)


@pytest.mark.parametrize("env_id,quarters,blocked,in_box", [
    ("MiniGrid-ObstructedMaze-2Dl-v0", 1, False, False),
    ("MiniGrid-ObstructedMaze-2Dlh-v0", 1, False, True),
    ("MiniGrid-ObstructedMaze-2Dlhb-v0", 1, True, True),
    ("MiniGrid-ObstructedMaze-1Q-v0", 1, True, True),
    ("MiniGrid-ObstructedMaze-2Q-v0", 2, True, True),
    ("MiniGrid-ObstructedMaze-Full-v0", 4, True, True),
])
def test_obstructed_full_structure(env_id, quarters, blocked, in_box):
    params = mg.parse_env_id(env_id)
    for seed in range(5):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        doors = [tuple(map(int, d)) for d in np.argwhere(obj == mg.DOOR)]
        locked = [(x, y) for x, y in doors if g[x, y, 2] == mg.LOCKED]
        assert len(doors) == 3 * quarters
        assert len(locked) == 2 * quarters
        # one target blue ball, in a corner among the first Q corners
        blue = np.argwhere((obj == mg.BALL) & (g[..., 1] == mg.BLUE))
        assert len(blue) == 1
        bx, by = map(int, blue[0])
        assert _room_of(bx, by) in CORNER[:quarters]
        # keys (bare or hidden in boxes) live in side rooms and match a
        # locked door color
        locked_colors = {int(g[x, y, 1]) for x, y in locked}
        if in_box:
            boxes = np.argwhere(obj == mg.BOX)
            assert len(boxes) == 2 * quarters
            for kx, ky in boxes:
                assert _room_of(int(kx), int(ky)) in SIDE[:quarters]
                assert int(g[kx, ky, 2]) - 1 in locked_colors
        else:
            keys = np.argwhere(obj == mg.KEY)
            assert len(keys) == 2 * quarters
            for kx, ky in keys:
                assert _room_of(int(kx), int(ky)) in SIDE[:quarters]
                assert int(g[kx, ky, 1]) in locked_colors
        # blockers: a non-blue ball on the side-room cell before each
        # locked door
        if blocked:
            for x, y in locked:
                found = False
                for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nx, ny = x + dx, y + dy
                    if (0 <= nx < 16 and 0 <= ny < 16
                            and obj[nx, ny] == mg.BALL
                            and _room_of(nx, ny) in SIDE[:quarters]):
                        assert g[nx, ny, 1] != mg.BLUE
                        found = True
                assert found, f"locked door {(x, y)} not blocked"
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert _room_of(ax, ay) == params.agent_room


def test_obstructed_full_scripted_solve():
    """1Q seed 0: reveal a key from its box, unlock the matching door,
    pick the blue ball up — and confirm the blocker ball does NOT end
    the episode (it is never blue)."""
    params = mg.parse_env_id("MiniGrid-ObstructedMaze-1Q-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    obj = g[..., 0]
    # pick any box; its hidden key's color names a locked door
    (kx, ky) = map(int, np.argwhere(obj == mg.BOX)[0])
    key_color = int(g[kx, ky, 2]) - 1
    st1 = _face(st, (kx - 1, ky), 0)
    st2, r, term, _ = _step(params, st1, mg.A_TOGGLE)
    g2 = np.asarray(st2.grid)
    assert (g2[kx, ky] == [mg.KEY, key_color, 0]).all(), "box reveals key"
    st3, r, term, _ = _step(params, st2, mg.A_PICKUP)
    assert int(st3.carrying[0]) == mg.KEY and int(st3.carrying[1]) == key_color
    # a blocker ball pickup does not terminate (non-blue)
    locked = [tuple(map(int, d)) for d in np.argwhere(
        (g2[..., 0] == mg.DOOR) & (g2[..., 2] == mg.LOCKED))
        if int(g2[d[0], d[1], 1]) == key_color]
    lx, ly = locked[0]
    # the matching key unlocks the matching locked door (teleport next to
    # it on the side-room side, clearing any blocker first)
    g3 = np.asarray(st3.grid)
    for dirn, (dx, dy) in enumerate(((1, 0), (0, 1), (-1, 0), (0, -1))):
        px, py = lx - dx, ly - dy
        if 0 < px < 15 and 0 < py < 15 and _room_of(px, py) == (2, 1):
            if g3[px, py, 0] == mg.BALL:  # the blocker
                st4 = _face(st3, (px, py), dirn)
                g3[px, py] = [mg.EMPTY, 0, 0]
                st4 = dataclasses.replace(st4, grid=jnp.asarray(g3))
            else:
                st4 = _face(st3, (px, py), dirn)
            st5, r, term, _ = _step(params, st4, mg.A_TOGGLE)
            assert np.asarray(st5.grid)[lx, ly, 2] == mg.OPEN
            break
    else:
        raise AssertionError("no side-room cell fronts the locked door")
    # picking the blue ball up terminates with the time-scaled reward
    g5 = np.asarray(st5.grid)
    (tx, ty) = map(int, np.argwhere(
        (g5[..., 0] == mg.BALL) & (g5[..., 1] == mg.BLUE))[0])
    st6 = dataclasses.replace(
        _face(st5, (tx - 1, ty), 0), carrying=jnp.zeros(3, jnp.int8))
    st7, r, term, _ = _step(params, st6, mg.A_PICKUP)
    steps = int(st7.step_count)
    assert term and r == pytest.approx(1.0 - 0.9 * steps / params.max_steps)


def test_obstructed_blocker_pickup_does_not_terminate():
    params = mg.parse_env_id("MiniGrid-ObstructedMaze-2Dlhb-v0")
    st = mg.reset(params, jax.random.PRNGKey(1))
    g = np.asarray(st.grid)
    blockers = np.argwhere(
        (g[..., 0] == mg.BALL) & (g[..., 1] != mg.BLUE))
    bx, by = map(int, blockers[0])
    st1 = dataclasses.replace(
        _face(st, (bx, by - 1), 1), carrying=jnp.zeros(3, jnp.int8))
    if np.asarray(st1.grid)[bx, by - 1, 0] != mg.EMPTY:
        g1 = np.asarray(st1.grid)
        g1[bx, by - 1] = [mg.EMPTY, 0, 0]
        st1 = dataclasses.replace(st1, grid=jnp.asarray(g1))
    st2, r, term, _ = _step(params, st1, mg.A_PICKUP)
    assert int(st2.carrying[0]) == mg.BALL and not term and r == 0.0


def test_playground_structure():
    params = mg.parse_env_id("MiniGrid-Playground-v0")
    for seed in range(5):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        doors = np.argwhere(obj == mg.DOOR)
        assert len(doors) == 12
        assert (g[obj == mg.DOOR, 2] == mg.CLOSED).all()
        for x, y in doors:
            assert (int(x) in (6, 12)) != (int(y) in (6, 12))
        n_objs = sum(int((obj == t).sum()) for t in (mg.KEY, mg.BALL, mg.BOX))
        assert n_objs == 12
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert obj[ax, ay] == mg.EMPTY


def test_playground_no_reward_truncates_at_100():
    params = mg.parse_env_id("MiniGrid-Playground-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    @jax.jit
    def rollout(st, key):
        def body(carry, k):
            st, total, any_term = carry
            a = jax.random.randint(k, (), 0, mg.NUM_ACTIONS)
            st, r, term, trunc = mg.step(params, st, a)
            return (st, total + r, any_term | term), trunc

        (st, total, any_term), truncs = jax.lax.scan(
            body, (st, 0.0, False), jax.random.split(key, 100))
        return total, any_term, truncs

    total, any_term, truncs = rollout(st, key)
    assert float(total) == 0.0, "Playground has no reward source"
    assert not bool(any_term)
    assert bool(truncs[-1]) and not bool(truncs[:-1].any())


def test_obstructed_playground_train_end_to_end():
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    for env_id in ("MiniGrid-ObstructedMaze-2Dlhb-v0",
                   "MiniGrid-Playground-v0"):
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
