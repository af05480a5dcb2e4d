"""Mission-conditioned MiniGrid families: GoToDoor, Fetch, GoToObject,
PutNear — layout invariants, target bookkeeping, and scripted success /
failure semantics (the reference trains any registered MiniGrid id via
gym.make, `ppo_minigrid.py:106-119`; it consumes these envs through
ImgObsWrapper, which drops the mission string — the target still drives
the reward, `ppo_minigrid.py:110`).

Upstream minigrid is not installed in this image, so parity is
structural against the upstream generators (minigrid/envs/gotodoor.py,
fetch.py, gotoobject.py, putnear.py — reconstructed): generator
invariants over seeds plus scripted episodes for every terminal rule.
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


def _free_neighbor(obj, x, y):
    """A cardinally adjacent EMPTY cell and the direction facing (x, y)."""
    for dirn, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
        nx, ny = x - dx, y - dy
        if 0 <= nx < obj.shape[0] and 0 <= ny < obj.shape[1] \
                and obj[nx, ny] == mg.EMPTY:
            return (nx, ny), dirn
    raise AssertionError(f"no free neighbor of ({x}, {y})")


# ---------------------------------------------------------------------------
# parse_env_id
# ---------------------------------------------------------------------------


def test_parse_mission_ids():
    p = mg.parse_env_id("MiniGrid-GoToDoor-8x8-v0")
    assert (p.kind, p.width, p.max_steps) == ("gotodoor", 8, 4 * 64)
    assert p.see_through_walls and p.success == "goto_door"
    p = mg.parse_env_id("MiniGrid-Fetch-8x8-N3-v0")
    assert (p.kind, p.num_objs, p.max_steps) == ("fetch", 3, 5 * 64)
    p = mg.parse_env_id("MiniGrid-GoToObject-6x6-N2-v0")
    assert (p.kind, p.num_objs, p.success) == ("gotoobject", 2, "goto_object")
    p = mg.parse_env_id("MiniGrid-PutNear-6x6-N2-v0")
    # PutNear's horizon is deliberately short: 5*size, not 5*size².
    assert (p.kind, p.num_objs, p.max_steps) == ("putnear", 2, 30)


# ---------------------------------------------------------------------------
# GoToDoor
# ---------------------------------------------------------------------------


def test_gotodoor_structure():
    params = mg.parse_env_id("MiniGrid-GoToDoor-8x8-v0")
    room_sizes = set()
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        walls = np.argwhere(obj == mg.WALL)
        rw = int(walls[:, 0].max()) + 1
        rh = int(walls[:, 1].max()) + 1
        assert 5 <= rw <= 8 and 5 <= rh <= 8
        room_sizes.add((rw, rh))
        doors = np.argwhere(obj == mg.DOOR)
        assert len(doors) == 4
        # one door per wall side, never in a corner, all CLOSED, distinct colors
        sides = set()
        for x, y in doors:
            assert g[x, y, 2] == mg.CLOSED
            if y == 0 or y == rh - 1:
                assert 2 <= x <= rw - 3
                sides.add("top" if y == 0 else "bottom")
            else:
                assert x in (0, rw - 1) and 2 <= y <= rh - 3
                sides.add("left" if x == 0 else "right")
        assert sides == {"top", "bottom", "left", "right"}
        assert len({int(g[x, y, 1]) for x, y in doors}) == 4
        # target names one of the doors
        t = np.asarray(st.target)
        assert t[0] == mg.DOOR
        assert obj[t[2], t[3]] == mg.DOOR and g[t[2], t[3], 1] == t[1]
        # agent inside the sampled room on a free cell
        ax, ay = np.asarray(st.agent_pos)
        assert 1 <= ax <= rw - 2 and 1 <= ay <= rh - 2
        # nothing outside the sampled room
        assert (obj[rw:, :] == mg.EMPTY).all() and (obj[:, rh:] == mg.EMPTY).all()
    assert len(room_sizes) > 1, "room size should vary per episode"


def test_gotodoor_done_at_target_rewards():
    params = mg.parse_env_id("MiniGrid-GoToDoor-8x8-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    (nx, ny), dirn = _free_neighbor(g[..., 0], int(t[2]), int(t[3]))
    st = _face(st, (nx, ny), dirn)
    st, r, term, _ = _step(params, st, mg.A_DONE)
    assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)


def test_gotodoor_done_elsewhere_and_toggle_terminate_with_zero():
    params = mg.parse_env_id("MiniGrid-GoToDoor-8x8-v0")
    st0 = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st0.grid)
    t = np.asarray(st0.target)
    # done at a NON-target door: terminated, no reward
    other = [(x, y) for x, y in np.argwhere(g[..., 0] == mg.DOOR)
             if (x, y) != (t[2], t[3])
             and abs(x - t[2]) + abs(y - t[3]) > 2][0]
    (nx, ny), dirn = _free_neighbor(g[..., 0], *map(int, other))
    st, r, term, _ = _step(params, _face(st0, (nx, ny), dirn), mg.A_DONE)
    assert term and r == 0.0
    # toggling ANY door (even the target) terminates with 0
    (nx, ny), dirn = _free_neighbor(g[..., 0], int(t[2]), int(t[3]))
    st, r, term, _ = _step(params, _face(st0, (nx, ny), dirn), mg.A_TOGGLE)
    assert term and r == 0.0


# ---------------------------------------------------------------------------
# Fetch
# ---------------------------------------------------------------------------


def test_fetch_structure():
    params = mg.parse_env_id("MiniGrid-Fetch-8x8-N3-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere((g[..., 0] == mg.KEY) | (g[..., 0] == mg.BALL))
        assert len(objs) == 3
        t = np.asarray(st.target)
        assert t[0] in (mg.KEY, mg.BALL) and 0 <= t[1] < 6
        # the target names an object that exists on the grid
        assert any((g[x, y, 0] == t[0]) and (g[x, y, 1] == t[1])
                   for x, y in objs)
        ax, ay = np.asarray(st.agent_pos)
        assert g[ax, ay, 0] == mg.EMPTY


def _fetch_pickup(seed, want_match):
    params = mg.parse_env_id("MiniGrid-Fetch-8x8-N3-v0")
    st = mg.reset(params, jax.random.PRNGKey(seed))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    is_obj = (g[..., 0] == mg.KEY) | (g[..., 0] == mg.BALL)
    is_target = (g[..., 0] == t[0]) & (g[..., 1] == t[1])
    mask = is_obj & (is_target if want_match else ~is_target)
    cells = np.argwhere(mask)
    if len(cells) == 0:
        return None  # all three sampled objects match the target pair
    (nx, ny), dirn = _free_neighbor(g[..., 0], *map(int, cells[0]))
    return _step(params, _face(st, (nx, ny), dirn), mg.A_PICKUP)


def test_fetch_pickup_target_rewards():
    st, r, term, _ = _fetch_pickup(0, want_match=True)
    params = mg.parse_env_id("MiniGrid-Fetch-8x8-N3-v0")
    assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)


def test_fetch_pickup_wrong_terminates_with_zero():
    for seed in range(4):
        out = _fetch_pickup(seed, want_match=False)
        if out is not None:
            st, r, term, _ = out
            assert term and r == 0.0
            return
    raise AssertionError("no seed with a non-target object")


# ---------------------------------------------------------------------------
# GoToObject
# ---------------------------------------------------------------------------


def test_gotoobject_structure_distinct_pairs():
    params = mg.parse_env_id("MiniGrid-GoToObject-8x8-N2-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], (mg.KEY, mg.BALL, mg.BOX)))
        assert len(objs) == 2
        pairs = {(int(g[x, y, 0]), int(g[x, y, 1])) for x, y in objs}
        assert len(pairs) == 2, "object (type, color) pairs must be distinct"
        t = np.asarray(st.target)
        assert (int(t[0]), int(t[1])) in pairs
        assert g[t[2], t[3], 0] == t[0] and g[t[2], t[3], 1] == t[1]


def test_gotoobject_done_semantics():
    params = mg.parse_env_id("MiniGrid-GoToObject-8x8-N2-v0")
    st0 = mg.reset(params, jax.random.PRNGKey(1))
    g = np.asarray(st0.grid)
    t = np.asarray(st0.target)
    (nx, ny), dirn = _free_neighbor(g[..., 0], int(t[2]), int(t[3]))
    # done within Chebyshev 1 → terminal reward
    st, r, term, _ = _step(params, _face(st0, (nx, ny), dirn), mg.A_DONE)
    assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)
    # done far away → terminated, 0 (place at a far empty cell)
    far = [(x, y) for x, y in np.argwhere(g[..., 0] == mg.EMPTY)
           if max(abs(x - t[2]), abs(y - t[3])) > 1][0]
    st, r, term, _ = _step(params, _face(st0, tuple(far), 0), mg.A_DONE)
    assert term and r == 0.0
    # toggle terminates with 0
    st, r, term, _ = _step(params, _face(st0, (nx, ny), dirn), mg.A_TOGGLE)
    assert term and r == 0.0


# ---------------------------------------------------------------------------
# PutNear
# ---------------------------------------------------------------------------


def test_putnear_structure_no_adjacent_objects():
    params = mg.parse_env_id("MiniGrid-PutNear-8x8-N3-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], (mg.KEY, mg.BALL, mg.BOX)))
        assert len(objs) == 3
        for i in range(3):
            for j in range(i + 1, 3):
                cheb = max(abs(objs[i][0] - objs[j][0]),
                           abs(objs[i][1] - objs[j][1]))
                assert cheb > 1, f"objects adjacent at seed {seed}"
        t = np.asarray(st.target)
        # move and near-target are distinct existing objects
        assert g[t[4], t[5], 0] == t[2] and g[t[4], t[5], 1] == t[3]
        assert any((g[x, y, 0] == t[0]) and (g[x, y, 1] == t[1])
                   for x, y in objs)
        assert not (t[0] == t[2] and t[1] == t[3])


def _putnear_carrying_move(seed):
    """Reset and execute the pickup of the move object; returns
    (params, state, grid, target) with the agent carrying it."""
    params = mg.parse_env_id("MiniGrid-PutNear-8x8-N3-v0")
    st = mg.reset(params, jax.random.PRNGKey(seed))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    (mx, my) = [(x, y) for x, y in np.argwhere(
        (g[..., 0] == t[0]) & (g[..., 1] == t[1]))][0]
    (nx, ny), dirn = _free_neighbor(g[..., 0], int(mx), int(my))
    st, r, term, _ = _step(params, _face(st, (nx, ny), dirn), mg.A_PICKUP)
    assert not term and r == 0.0, "picking the move object must not terminate"
    assert int(st.carrying[0]) == t[0] and int(st.carrying[1]) == t[1]
    return params, st, np.asarray(st.grid), t


def test_putnear_drop_near_target_rewards():
    params, st, g, t = _putnear_carrying_move(0)
    # stand on a free cell Chebyshev-adjacent to the near target whose
    # forward cell is ALSO within Chebyshev 1 (drop lands near)
    for x, y in np.argwhere(g[..., 0] == mg.EMPTY):
        if max(abs(x - t[4]), abs(y - t[5])) > 1:
            continue
        for dirn, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
            fx, fy = x + dx, y + dy
            if g[fx, fy, 0] == mg.EMPTY \
                    and max(abs(fx - t[4]), abs(fy - t[5])) <= 1:
                st2, r, term, _ = _step(
                    params, _face(st, (int(x), int(y)), dirn), mg.A_DROP)
                assert term
                assert r == pytest.approx(1.0 - 0.9 * 2 / params.max_steps)
                g2 = np.asarray(st2.grid)
                assert g2[fx, fy, 0] == t[0] and g2[fx, fy, 1] == t[1]
                return
    raise AssertionError("no drop cell near the target found")


def test_putnear_drop_far_terminates_with_zero():
    params, st, g, t = _putnear_carrying_move(0)
    for x, y in np.argwhere(g[..., 0] == mg.EMPTY):
        if max(abs(x - t[4]), abs(y - t[5])) <= 2:
            continue
        for dirn, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
            fx, fy = x + dx, y + dy
            if g[fx, fy, 0] == mg.EMPTY:
                st2, r, term, _ = _step(
                    params, _face(st, (int(x), int(y)), dirn), mg.A_DROP)
                assert term and r == 0.0
                return
    raise AssertionError("no far drop cell found")


def test_putnear_wrong_pickup_terminates():
    params = mg.parse_env_id("MiniGrid-PutNear-8x8-N3-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    wrong = [(x, y) for x, y in np.argwhere(
        np.isin(g[..., 0], (mg.KEY, mg.BALL, mg.BOX)))
        if not (g[x, y, 0] == t[0] and g[x, y, 1] == t[1])][0]
    (nx, ny), dirn = _free_neighbor(g[..., 0], *map(int, wrong))
    st, r, term, _ = _step(params, _face(st, (nx, ny), dirn), mg.A_PICKUP)
    assert term and r == 0.0


def test_putnear_failed_drop_attempt_still_terminates():
    """A drop action while carrying terminates even when the forward cell
    is blocked (upstream checks `action == drop and preCarrying`, not the
    drop's success)."""
    params, st, g, t = _putnear_carrying_move(0)
    # face a wall so the drop fails
    ax = int(np.asarray(st.agent_pos)[0])
    ay = int(np.asarray(st.agent_pos)[1])
    for dirn, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
        fx, fy = ax + dx, ay + dy
        if g[fx, fy, 0] == mg.WALL:
            st2, r, term, _ = _step(params, _face(st, (ax, ay), dirn),
                                    mg.A_DROP)
            assert term and r == 0.0
            assert int(st2.carrying[0]) == t[0], "carry survives a failed drop"
            return
    # no wall adjacent: walk to the border first
    st2, r, term, _ = _step(params, _face(st, (1, 1), 2), mg.A_DROP)
    assert term and r == 0.0


# ---------------------------------------------------------------------------
# Autoreset keeps per-episode targets fresh; end-to-end Trainer smoke
# ---------------------------------------------------------------------------


def test_autoreset_resamples_target():
    params = mg.parse_env_id("MiniGrid-Fetch-8x8-N3-v0")
    env = JaxVectorEnv("MiniGrid-Fetch-8x8-N3-v0", 32)
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    t0 = np.asarray(state.env.target)
    # done action is a no-op for fetch; force terminations via max_steps
    for _ in range(params.max_steps + 1):
        acts = jnp.zeros(32, jnp.int32).at[:].set(mg.A_LEFT)
        state, obs, r, term, trunc, info = env.step_fn(state, acts)
    t1 = np.asarray(state.env.target)
    assert not np.array_equal(t0, t1), "autoreset must resample the mission"
    assert (np.asarray(state.env.step_count) <= params.max_steps).all()


@pytest.mark.parametrize("env_id", [
    "MiniGrid-GoToDoor-5x5-v0",
    "MiniGrid-Fetch-5x5-N2-v0",
    "MiniGrid-PutNear-6x6-N2-v0",
])
def test_mission_families_train_end_to_end(env_id):
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=2)
    env = JaxVectorEnv(env_id, cfg.num_envs)
    tr = Trainer(cfg, env, num_iterations=4)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions,
                               in_channels=3)
    st = tr.init_state(params, seed=0)
    st, packed = tr.run_iterations(st, 1, 4)
    logs = tr.fetch_logs_chunk(packed)
    assert all(np.isfinite(sc["policy_loss"]) for sc, _ in logs)
