"""The BabyAI maze tier: GoTo[Open], GoToObjMaze[Open|S4R2|S4..S7],
Pickup, UnblockPickup — RoomGrid lattice invariants, connect_all
connectivity, the doors_open post-pass, the check_objs_reachable
rejection (and UnblockPickup's inversion), and the GoToInstr /
PickupInstr terminal rules on maze layouts.

Upstream minigrid is not installed in this image, so parity is
structural against the upstream generators
(minigrid/envs/babyai/{goto,pickup}.py, core/roomgrid.py connect_all,
core/roomgrid_level.py check_objs_reachable — reconstructed).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.minigrid import core as mg

OBJ_TYPES = (mg.KEY, mg.BALL, mg.BOX)

_reset = jax.jit(mg.reset, static_argnums=0)


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
    return None


def _flood(obj, seed):
    """Cells reachable from ``seed`` expanding over EMPTY and DOOR cells
    (upstream check_objs_reachable treats any door as passable)."""
    w, h = obj.shape
    filled = {tuple(seed)}
    stack = [tuple(seed)]
    while stack:
        x, y = stack.pop()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            n = (x + dx, y + dy)
            if n in filled or not (0 <= n[0] < w and 0 <= n[1] < h):
                continue
            if obj[n] in (mg.EMPTY, mg.DOOR):
                filled.add(n)
                stack.append(n)
    return filled


def _all_objs_reachable(obj, agent_pos):
    """Upstream requires every non-wall, non-empty cell — doors
    included — to be reachable (adjacent to the flood or inside it)."""
    filled = _flood(obj, tuple(int(v) for v in np.asarray(agent_pos)))
    targets = np.argwhere(np.isin(obj, OBJ_TYPES + (mg.DOOR,)))
    for x, y in targets:
        near = {(x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)}
        if not (near & filled) and (x, y) not in filled:
            return False
    return True


# ---------------------------------------------------------------------------
# parse_env_id
# ---------------------------------------------------------------------------


def test_parse_maze_ids():
    p = mg.parse_env_id("BabyAI-GoTo-v0")
    assert (p.kind, p.width, p.height) == ("babyai_gotomaze", 22, 22)
    assert (p.num_objs, p.min_rooms, p.max_rooms, p.max_room_size) == \
        (18, 3, 3, 8)
    assert p.success == "babyai_goto" and not p.doors_open
    assert not p.invert_reach and p.max_steps == 8 * 64

    assert mg.parse_env_id("BabyAI-GoToOpen-v0").doors_open

    p = mg.parse_env_id("BabyAI-GoToObjMaze-v0")
    assert (p.width, p.num_objs, p.doors_open) == (22, 1, False)
    assert mg.parse_env_id("BabyAI-GoToObjMazeOpen-v0").doors_open

    p = mg.parse_env_id("BabyAI-GoToObjMazeS4R2-v0")
    assert (p.width, p.min_rooms, p.max_rooms, p.max_room_size) == \
        (7, 2, 2, 4)
    assert p.max_steps == 8 * 16

    for s in (4, 5, 6, 7):
        p = mg.parse_env_id(f"BabyAI-GoToObjMazeS{s}-v0")
        assert (p.width, p.min_rooms, p.max_room_size) == \
            ((s - 1) * 3 + 1, 3, s)

    p = mg.parse_env_id("BabyAI-Pickup-v0")
    assert (p.kind, p.success, p.num_objs, p.invert_reach) == \
        ("babyai_gotomaze", "babyai_pickup", 18, False)
    p = mg.parse_env_id("BabyAI-UnblockPickup-v0")
    assert (p.success, p.num_objs, p.invert_reach) == \
        ("babyai_pickup", 20, True)
    p = mg.parse_env_id("BabyAI-Open-v0")
    assert (p.kind, p.success, p.num_objs) == \
        ("babyai_gotomaze", "babyai_open_color", 18)
    # r4: GoToImpUnlock now parses (the unlock tier); truly unknown ids
    # still raise with the supported grid named
    assert mg.parse_env_id("BabyAI-GoToImpUnlock-v0").locked_room
    with pytest.raises(ValueError, match="BabyAI-GoToObjMaze"):
        mg.parse_env_id("BabyAI-GoToNowhere-v0")


# ---------------------------------------------------------------------------
# Layout invariants
# ---------------------------------------------------------------------------


def _lattice_ok(params, obj):
    """Room-boundary cells are WALL or DOOR; interiors hold no walls."""
    S, R, C = params.max_room_size, params.min_rooms, params.max_rooms
    on_wall = np.zeros(obj.shape, bool)
    for i in range(C + 1):
        on_wall[i * (S - 1), :] = True
    for j in range(R + 1):
        on_wall[:, j * (S - 1)] = True
    assert np.all(np.isin(obj[on_wall], (mg.WALL, mg.DOOR)))
    assert not np.any(obj[~on_wall] == mg.WALL)
    assert not np.any(obj[~on_wall] == mg.DOOR)
    # The four border walls carry no doors.
    for edge in (obj[0, :], obj[-1, :], obj[:, 0], obj[:, -1]):
        assert np.all(edge == mg.WALL)


@pytest.mark.parametrize("env_id", [
    "BabyAI-GoTo-v0", "BabyAI-GoToObjMazeS4R2-v0", "BabyAI-Pickup-v0"])
def test_maze_structure(env_id):
    params = mg.parse_env_id(env_id)
    for seed in range(8):
        st = _reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        _lattice_ok(params, obj)
        # Exactly num_objs distractors, and the mission target matches
        # a placed (type, color) pair.
        objs = np.argwhere(np.isin(obj, OBJ_TYPES))
        assert len(objs) == params.num_objs
        t = np.asarray(st.target)
        assert any(obj[x, y] == t[0] and g[x, y, 1] == t[1]
                   for x, y in objs)
        # Doors exist (min_rooms·max_rooms > 1 needs ≥ rooms−1) and are
        # CLOSED (doors_open=False here).
        doors = np.argwhere(obj == mg.DOOR)
        assert len(doors) >= params.min_rooms * params.max_rooms - 1
        assert np.all(g[obj == mg.DOOR, 2] == mg.CLOSED)
        # connect_all topology: every ROOM is reachable from the
        # agent's room through doors — flood over everything except
        # walls (a distractor may legally sit on a door's approach
        # cell; the agent can pick it up, so upstream accepts it).
        ax, ay = np.asarray(st.agent_pos)
        assert obj[ax, ay] == mg.EMPTY
        passable = np.where(obj == mg.WALL, mg.WALL, mg.EMPTY)
        filled = _flood(passable, (int(ax), int(ay)))
        S = params.max_room_size
        for i in range(params.max_rooms):
            for j in range(params.min_rooms):
                room = {(x, y) for x in range(i * (S - 1) + 1,
                                              (i + 1) * (S - 1))
                        for y in range(j * (S - 1) + 1, (j + 1) * (S - 1))}
                assert room & filled, f"room ({i}, {j}) is cut off"
        # check_objs_reachable passed.
        assert _all_objs_reachable(obj, (ax, ay))


def test_doors_open_variants():
    for env_id in ("BabyAI-GoToOpen-v0", "BabyAI-GoToObjMazeOpen-v0"):
        params = mg.parse_env_id(env_id)
        for seed in range(4):
            st = _reset(params, jax.random.PRNGKey(seed))
            g = np.asarray(st.grid)
            doors = g[..., 0] == mg.DOOR
            assert doors.any()
            assert np.all(g[doors, 2] == mg.OPEN)


def test_unblock_pickup_rejects_reachable_layouts():
    params = mg.parse_env_id("BabyAI-UnblockPickup-v0")
    for seed in range(6):
        st = _reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        assert not _all_objs_reachable(
            g[..., 0], np.asarray(st.agent_pos)), \
            "UnblockPickup must keep at least one object blocked"


def test_gotoobjmaze_single_object_is_target():
    params = mg.parse_env_id("BabyAI-GoToObjMaze-v0")
    types = set()
    for seed in range(12):
        st = _reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
        assert len(objs) == 1
        (x, y), t = objs[0], np.asarray(st.target)
        assert (g[x, y, 0], g[x, y, 1]) == (t[0], t[1])
        types.add(int(t[0]))
    assert len(types) >= 2  # type is sampled, not constant


# ---------------------------------------------------------------------------
# Terminal rules on maze layouts
# ---------------------------------------------------------------------------


def test_goto_succeeds_facing_target():
    params = mg.parse_env_id("BabyAI-GoToObjMazeS4R2-v0")
    done = 0
    for seed in range(8):
        st = _reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        t = np.asarray(st.target)
        (x, y) = np.argwhere(
            (g[..., 0] == t[0]) & (g[..., 1] == t[1]))[0]
        spot = _free_neighbor(g[..., 0], x, y)
        if spot is None:
            continue
        pos, dirn = spot
        st2, r, term, trunc = _step(params, _face(st, pos, dirn), mg.A_DONE)
        assert term and r > 0
        done += 1
    assert done >= 4


def test_goto_no_reward_facing_nonmatching():
    params = mg.parse_env_id("BabyAI-GoTo-v0")
    st = _reset(params, jax.random.PRNGKey(3))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    nonmatch = [(x, y) for x, y in np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
                if not (g[x, y, 0] == t[0] and g[x, y, 1] == t[1])]
    for x, y in nonmatch:
        spot = _free_neighbor(g[..., 0], x, y)
        if spot is None:
            continue
        st2, r, term, trunc = _step(params, _face(st, spot[0], spot[1]),
                                    mg.A_DONE)
        assert not term and r == 0.0
        break
    else:
        pytest.skip("no placeable non-matching object this seed")


def test_open_mission_names_an_existing_door_color():
    params = mg.parse_env_id("BabyAI-Open-v0")
    colors = set()
    for seed in range(8):
        st = _reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        t = np.asarray(st.target)
        assert t[0] == mg.DOOR
        door_colors = g[g[..., 0] == mg.DOOR, 1]
        assert t[1] in door_colors
        colors.add(int(t[1]))
    assert len(colors) >= 2  # the mission color is sampled


def test_open_layouts_reachable():
    """Open rejection-samples blocked layouts like GoTo/Pickup: upstream
    Open.gen_mission calls check_objs_reachable() right after
    add_distractors(18) (minigrid/envs/babyai/open.py — the r3 advisor's
    citation; the registration comment in core.py points here)."""
    params = mg.parse_env_id("BabyAI-Open-v0")
    for seed in range(8):
        st = _reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        assert _all_objs_reachable(g[..., 0], np.asarray(st.agent_pos)), \
            f"seed {seed}: Open produced a blocked layout"


def test_unblock_pickup_blocked_property_statistical():
    """The invert_reach rejection cap (256 in core.py) must make a
    silently-all-reachable layout statistically impossible: across many
    independent resets EVERY layout keeps >=1 blocked object. With the
    measured per-attempt blocked rate >=1/3, 256 draws all-reachable has
    p < 1e-45; 24 seeds here give ~1e-10 power against a cap regression
    to O(1) attempts."""
    params = mg.parse_env_id("BabyAI-UnblockPickup-v0")
    for seed in range(24):
        st = _reset(params, jax.random.PRNGKey(1000 + seed))
        g = np.asarray(st.grid)
        assert not _all_objs_reachable(
            g[..., 0], np.asarray(st.agent_pos)), \
            f"seed {seed}: UnblockPickup returned an all-reachable layout"


def test_open_succeeds_on_matching_toggle_only():
    params = mg.parse_env_id("BabyAI-Open-v0")
    st = _reset(params, jax.random.PRNGKey(1))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    doors = np.argwhere(g[..., 0] == mg.DOOR)
    match = [(x, y) for x, y in doors if g[x, y, 1] == t[1]]
    nonmatch = [(x, y) for x, y in doors if g[x, y, 1] != t[1]]
    for (x, y), should in [(match[0], True)] + (
            [(nonmatch[0], False)] if nonmatch else []):
        spot = _free_neighbor(g[..., 0], x, y)
        if spot is None:
            continue
        pos, dirn = spot
        st2, r, term, trunc = _step(params, _face(st, pos, dirn),
                                    mg.A_TOGGLE)
        assert term == should and (r > 0) == should
        if should:  # the toggle actually opened it
            assert int(st2.grid[x, y, 2]) == mg.OPEN
    # Facing a matching door without toggling never terminates.
    spot = _free_neighbor(g[..., 0], *match[0])
    if spot is not None:
        _, r, term, _ = _step(params, _face(st, spot[0], spot[1]),
                              mg.A_DONE)
        assert not term and r == 0.0


def test_pickup_succeeds_on_pickup_action_only():
    params = mg.parse_env_id("BabyAI-Pickup-v0")
    for seed in range(8):
        st = _reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        t = np.asarray(st.target)
        (x, y) = np.argwhere(
            (g[..., 0] == t[0]) & (g[..., 1] == t[1]))[0]
        spot = _free_neighbor(g[..., 0], x, y)
        if spot is None:
            continue
        pos, dirn = spot
        # Facing it is NOT enough for PickupInstr…
        st2, r, term, trunc = _step(params, _face(st, pos, dirn), mg.A_DONE)
        if term:  # facing a matching duplicate of a GoTo-style rule? no:
            pytest.fail("PickupInstr must not fire without a pickup")
        # …the pickup action is.
        st3, r, term, trunc = _step(params, _face(st, pos, dirn),
                                    mg.A_PICKUP)
        assert term and r > 0
        assert int(st3.carrying[0]) == int(t[0])
        return
    pytest.skip("no placeable target across seeds")
