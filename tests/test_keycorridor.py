"""KeyCorridor family: layout invariants + a scripted full solve.

Mirrors upstream minigrid/envs/keycorridor.py (RoomGrid 3 cols × R rows,
corridor middle column, locked ball room, matching key on the left,
connect_all doors) — see `_reset_keycorridor`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.minigrid import core as c


REGISTERED = [(3, 1), (3, 2), (3, 3), (4, 3), (5, 3), (6, 3)]


def test_parse_env_id():
    for s, r in REGISTERED:
        p = c.parse_env_id(f"MiniGrid-KeyCorridorS{s}R{r}-v0")
        assert p.kind == "keycorridor"
        assert (p.width, p.height) == ((s - 1) * 3 + 1, (s - 1) * r + 1)
        assert p.max_steps == 30 * s * s
        assert p.success == "pickup_ball"
    with pytest.raises(ValueError, match="KeyCorridor"):
        c.parse_env_id("MiniGrid-KeyCorridor-v0")


def _room_of(pos, s):
    return int(pos[0]) // (s - 1), int(pos[1]) // (s - 1)


@pytest.mark.parametrize("s,r", [(3, 3), (6, 3), (3, 1)])
def test_layout_invariants(s, r):
    p = c.parse_env_id(f"MiniGrid-KeyCorridorS{s}R{r}-v0")
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    states = jax.vmap(lambda k: c.reset(p, k))(keys)
    grids = np.asarray(states.grid)
    for n in range(32):
        g = grids[n]
        locked = (g[..., 0] == c.DOOR) & (g[..., 2] == c.LOCKED)
        assert locked.sum() == 1, "exactly one locked door"
        dx, dy = map(int, np.argwhere(locked)[0])
        assert dx == 2 * (s - 1), "locked door on the right column wall"
        balls = np.argwhere(g[..., 0] == c.BALL)
        assert len(balls) == 1, "exactly one target ball"
        assert _room_of(balls[0], s)[0] == 2, "ball in the right column"
        assert _room_of(balls[0], s)[1] == dy // (s - 1), (
            "ball behind the locked door")
        ks = np.argwhere(g[..., 0] == c.KEY)
        assert len(ks) == 1, "exactly one key"
        assert _room_of(ks[0], s)[0] == 0, "key in the left column"
        assert g[ks[0][0], ks[0][1], 1] == g[dx, dy, 1], (
            "key color matches the locked door")
        apos = np.asarray(states.agent_pos[n])
        assert _room_of(apos, s) == (1, r // 2), "agent in the middle room"
        assert g[apos[0], apos[1], 0] == c.EMPTY
        # corridor: middle-column separators removed
        for j in range(1, r):
            seg = g[s:2 * (s - 1), j * (s - 1), 0]
            assert (seg == c.EMPTY).all()
        # full-grid reachability: flood fill from the agent over
        # passable cells (doors count regardless of state — the agent
        # can toggle/unlock them with the key in hand).
        passable = np.isin(g[..., 0], [c.EMPTY, c.DOOR, c.KEY, c.BALL])
        reach = np.zeros_like(passable)
        reach[apos[0], apos[1]] = True
        for _ in range(g.shape[0] * g.shape[1]):
            grown = reach.copy()
            grown[1:] |= reach[:-1] & passable[1:]
            grown[:-1] |= reach[1:] & passable[:-1]
            grown[:, 1:] |= reach[:, :-1] & passable[:, 1:]
            grown[:, :-1] |= reach[:, 1:] & passable[:, :-1]
            if (grown == reach).all():
                break
            reach = grown
        assert reach[balls[0][0], balls[0][1]], "ball reachable"
        assert reach[ks[0][0], ks[0][1]], "key reachable"


def _turn_to(state, p, target_dir):
    """Actions turning the agent to ``target_dir``, applied immediately."""
    acts = []
    d = int(state.agent_dir)
    while d != target_dir:
        acts.append(c.A_RIGHT)
        d = (d + 1) % 4
    for a in acts:
        state, *_ = c.step(p, state, jnp.int32(a))
    return state


def test_scripted_solve_s3r1():
    """S3R1 has deterministic object cells (1×1 room interiors): pick the
    key, unlock the door, stash the key, grab the ball — terminating with
    the time-scaled reward and episode success."""
    p = c.parse_env_id("MiniGrid-KeyCorridorS3R1-v0")
    st = c.reset(p, jax.random.PRNGKey(4))
    g = np.asarray(st.grid)
    assert tuple(np.asarray(st.agent_pos)) == (3, 1)
    assert g[1, 1, 0] == c.KEY and g[5, 1, 0] == c.BALL
    assert g[4, 1, 0] == c.DOOR and g[4, 1, 2] == c.LOCKED
    # connect_all adds a door between the left and middle rooms
    assert g[2, 1, 0] == c.DOOR and g[2, 1, 2] == c.CLOSED

    def do(st, a):
        st, rew, term, trunc = c.step(p, st, jnp.int32(a))
        return st, float(rew), bool(term)

    st = _turn_to(st, p, 2)               # face the left door
    st, _, _ = do(st, c.A_TOGGLE)         # open it
    st, _, _ = do(st, c.A_FORWARD)        # stand in the doorway (2,1)
    st, _, _ = do(st, c.A_PICKUP)         # grab the key at (1,1)
    assert int(st.carrying[0]) == c.KEY
    st = _turn_to(st, p, 0)               # face right
    st, _, _ = do(st, c.A_FORWARD)        # back to (3,1)
    st, _, term = do(st, c.A_TOGGLE)      # unlock the locked door
    assert not term
    assert np.asarray(st.grid)[4, 1, 2] == c.OPEN
    st, _, _ = do(st, c.A_FORWARD)        # into the doorway (4,1)
    st = _turn_to(st, p, 2)               # face back left
    st, _, _ = do(st, c.A_DROP)           # stash the key at (3,1)
    assert int(st.carrying[0]) == 0
    st = _turn_to(st, p, 0)               # face the ball
    st, rew, term = do(st, c.A_PICKUP)    # success
    assert term and rew > 0
    assert int(st.carrying[0]) == c.BALL


def test_vector_env_runs():
    """Random actions through the batched vector env: shapes, autoreset,
    and the jitted step all work for the new family."""
    from clip_ppo_tpu.envs.vector import JaxVectorEnv

    env = JaxVectorEnv("MiniGrid-KeyCorridorS3R2-v0", 4)
    key = jax.random.PRNGKey(0)
    vec_state, obs = env.reset_fn(key)
    assert obs.shape == (4, 84, 84, 3)
    for i in range(5):
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (4,), 0, env.num_actions)
        vec_state, obs, rew, term, trunc, info = env._step_impl(
            vec_state, actions)
    assert obs.shape == (4, 84, 84, 3)
    assert np.isfinite(np.asarray(rew)).all()
