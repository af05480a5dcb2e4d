"""The BabyAI Open tier — OpenRedDoor, OpenDoor[Color|Loc][Debug] — and
GoToRedBlueBall: layout invariants and OpenInstr success/failure
semantics (the reference trains any registered id via gym.make,
`ppo_minigrid.py:106-119`; the minigrid package registers the BabyAI
namespace alongside the MiniGrid one).

Upstream minigrid is not installed in this image, so parity is
structural against the upstream generators
(minigrid/envs/babyai/{open,goto}.py, core/roomgrid.py,
core/verifier.py — reconstructed): generator invariants over seeds plus
scripted episodes for every terminal rule.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.minigrid import core as mg

OBJ_TYPES = (mg.KEY, mg.BALL, mg.BOX)


def _face(st, pos, dirn):
    return dataclasses.replace(
        st, agent_pos=jnp.asarray(pos, jnp.int32), agent_dir=jnp.int32(dirn))


def _step(params, st, action):
    st, r, term, trunc = mg.step(params, st, jnp.int32(action))
    return st, float(r), bool(term), bool(trunc)


def _doors(grid):
    g = np.asarray(grid)
    return [(int(x), int(y)) for x, y in np.argwhere(g[..., 0] == mg.DOOR)]


def _approach(params, st, dx, dy):
    """Face the door at (dx, dy) from inside the center room."""
    if dx in (7, 14) or params.kind == "babyai_openred":
        apx = dx - 1 if dx > params.width // 2 else dx + 1
        dirn = 0 if dx > params.width // 2 else 2
        return _face(st, (apx, dy), dirn)
    apy = dy - 1 if dy > params.height // 2 else dy + 1
    dirn = 1 if dy > params.height // 2 else 3
    return _face(st, (dx, apy), dirn)


def _matches(params, st):
    """Door positions in the episode's match set (unpacked from target)."""
    t = np.asarray(st.target)
    return [((int(v) - 1) // params.height, (int(v) - 1) % params.height)
            for v in t[:4] if v > 0]


# ---------------------------------------------------------------------------
# parse_env_id
# ---------------------------------------------------------------------------


def test_parse_open_tier_ids():
    p = mg.parse_env_id("BabyAI-OpenRedDoor-v0")
    assert (p.kind, p.width, p.height, p.max_steps) == (
        "babyai_openred", 9, 5, 8 * 25)
    assert p.success == "babyai_open" and not p.strict
    for eid, sb, strict in [
        ("BabyAI-OpenDoor-v0", "", False),
        ("BabyAI-OpenDoorDebug-v0", "", True),
        ("BabyAI-OpenDoorColor-v0", "color", False),
        ("BabyAI-OpenDoorLoc-v0", "loc", False),
    ]:
        p = mg.parse_env_id(eid)
        assert (p.kind, p.width, p.max_steps) == (
            "babyai_opendoor", 22, 8 * 64), eid
        assert (p.select_by, p.strict) == (sb, strict), eid
    p = mg.parse_env_id("BabyAI-GoToRedBlueBall-v0")
    assert (p.kind, p.num_objs, p.rb_target) == ("babyai_goto", 7, True)


# ---------------------------------------------------------------------------
# OpenRedDoor
# ---------------------------------------------------------------------------


def test_openreddoor_structure():
    params = mg.parse_env_id("BabyAI-OpenRedDoor-v0")
    door_ys = set()
    for seed in range(12):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        doors = _doors(st.grid)
        assert len(doors) == 1
        (dx, dy) = doors[0]
        assert dx == 4 and 1 <= dy <= 3, "door on the shared wall"
        door_ys.add(dy)
        assert int(g[dx, dy, 1]) == mg.RED
        assert int(g[dx, dy, 2]) == mg.CLOSED
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert 1 <= ax <= 3 and 1 <= ay <= 3, "agent in the left room"
        assert _matches(params, st) == [(dx, dy)]
    assert len(door_ys) > 1, "door y varies across episodes"


def test_openreddoor_toggle_succeeds_from_either_side():
    params = mg.parse_env_id("BabyAI-OpenRedDoor-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    (dx, dy) = _doors(st.grid)[0]
    for pos, dirn in [((dx - 1, dy), 0), ((dx + 1, dy), 2)]:
        st2, r, term, _ = _step(params, _face(st, pos, dirn), mg.A_TOGGLE)
        assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)
        assert int(np.asarray(st2.grid)[dx, dy, 2]) == mg.OPEN
    # a non-toggle action facing the door does not verify
    st2, r, term, _ = _step(params, _face(st, (dx - 1, dy), 0), mg.A_DONE)
    assert not term and r == 0.0
    # a toggle NOT facing the door does nothing
    st2, r, term, _ = _step(params, _face(st, (2, 2), 3), mg.A_TOGGLE)
    assert not term and r == 0.0


# ---------------------------------------------------------------------------
# OpenDoor
# ---------------------------------------------------------------------------


def test_opendoor_structure():
    params = mg.parse_env_id("BabyAI-OpenDoor-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        doors = _doors(st.grid)
        assert len(doors) == 4
        walls = {(x if x in (7, 14) else None, y if y in (7, 14) else None)
                 for x, y in doors}
        assert walls == {(14, None), (None, 14), (7, None), (None, 7)}, (
            "one door per center-room wall")
        for x, y in doors:
            if x in (7, 14):
                assert 8 <= y <= 13
            else:
                assert 8 <= x <= 13
            assert int(g[x, y, 2]) == mg.CLOSED
        assert len({int(g[x, y, 1]) for x, y in doors}) == 4, (
            "door colors pairwise distinct")
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert 8 <= ax <= 13 and 8 <= ay <= 13, "agent in the center room"
        assert len(_matches(params, st)) >= 1


def test_opendoor_color_matches_exactly_the_east_door():
    params = mg.parse_env_id("BabyAI-OpenDoorColor-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        m = _matches(params, st)
        assert len(m) == 1 and m[0][0] == 14, (
            "select_by=color names the first (east) door")


def test_opendoor_loc_matches_dot_product_rule():
    params = mg.parse_env_id("BabyAI-OpenDoorLoc-v0")
    seen_sizes = set()
    for seed in range(24):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        m = set(_matches(params, st))
        assert m, "loc match set never empty"
        seen_sizes.add(len(m))
        # the match set must be consistent with exactly one of the four
        # location predicates relative to the agent's start pose
        ax, ay = map(int, np.asarray(st.agent_pos))
        d1 = mg.DIR_TO_VEC[int(st.agent_dir)]
        d2 = mg.DIR_TO_VEC[(int(st.agent_dir) + 1) % 4]
        doors = _doors(st.grid)
        preds = {
            "left": lambda x, y: (x - ax) * d2[0] + (y - ay) * d2[1] < 0,
            "right": lambda x, y: (x - ax) * d2[0] + (y - ay) * d2[1] > 0,
            "front": lambda x, y: (x - ax) * d1[0] + (y - ay) * d1[1] > 0,
            "behind": lambda x, y: (x - ax) * d1[0] + (y - ay) * d1[1] < 0,
        }
        consistent = [
            name for name, pred in preds.items()
            if m == {(x, y) for x, y in doors if pred(x, y)}
        ]
        assert consistent, (seed, m, doors, (ax, ay))
    assert max(seen_sizes) > 1, "some poses match multiple doors"


def test_opendoor_matching_toggle_succeeds_wrong_continues():
    params = mg.parse_env_id("BabyAI-OpenDoor-v0")
    st = mg.reset(params, jax.random.PRNGKey(1))
    match = _matches(params, st)
    wrong = [d for d in _doors(st.grid) if d not in match]
    st2, r, term, _ = _step(
        params, _approach(params, st, *match[0]), mg.A_TOGGLE)
    assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)
    if wrong:
        st2, r, term, _ = _step(
            params, _approach(params, st, *wrong[0]), mg.A_TOGGLE)
        assert not term and r == 0.0, "non-strict wrong toggle continues"
        assert int(np.asarray(st2.grid)[wrong[0][0], wrong[0][1], 2]) \
            == mg.OPEN, "the wrong door still opens"


def test_opendoor_debug_strict_failures():
    params = mg.parse_env_id("BabyAI-OpenDoorDebug-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        match = _matches(params, st)
        wrong = [d for d in _doors(st.grid) if d not in match]
        if not wrong:
            continue
        # wrong-door toggle FAILS the episode with 0 reward
        st2, r, term, _ = _step(
            params, _approach(params, st, *wrong[0]), mg.A_TOGGLE)
        assert term and r == 0.0
        # re-closing an already-open matching door also fails (the
        # post-toggle front cell is a door but not open)
        mx, my = match[0]
        opened = dataclasses.replace(
            st, grid=st.grid.at[mx, my, 2].set(mg.OPEN))
        st2, r, term, _ = _step(
            params, _approach(params, opened, mx, my), mg.A_TOGGLE)
        assert term and r == 0.0
        # and the matching toggle still succeeds
        st2, r, term, _ = _step(
            params, _approach(params, st, mx, my), mg.A_TOGGLE)
        assert term and r > 0.0
        return
    raise AssertionError("no seed with a non-matching door")


# ---------------------------------------------------------------------------
# GoToRedBlueBall
# ---------------------------------------------------------------------------


def test_gotoredblueball_structure():
    params = mg.parse_env_id("BabyAI-GoToRedBlueBall-v0")
    colors = set()
    for seed in range(16):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
        assert len(objs) == 8, "target ball + 7 distractors"
        t = np.asarray(st.target)
        assert int(t[0]) == mg.BALL and int(t[1]) in (mg.RED, mg.BLUE)
        colors.add(int(t[1]))
        rb_balls = [(x, y) for x, y in objs
                    if g[x, y, 0] == mg.BALL
                    and g[x, y, 1] in (mg.RED, mg.BLUE)]
        assert len(rb_balls) == 1, "no distractor may be a red/blue ball"
        assert int(g[rb_balls[0][0], rb_balls[0][1], 1]) == int(t[1])
    assert colors == {mg.RED, mg.BLUE}, "both target colors appear"


def test_gotoredblueball_facing_target_succeeds():
    params = mg.parse_env_id("BabyAI-GoToRedBlueBall-v0")
    st = mg.reset(params, jax.random.PRNGKey(3))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    (bx, by) = map(int, np.argwhere(
        (g[..., 0] == mg.BALL) & (g[..., 1] == t[1]))[0])
    # stand facing the ball, step with DONE (any action verifies
    # GoToInstr post-step)
    (nx, ny), dirn = next(
        (((bx - dx, by - dy), d)
         for d, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)])
         if g[bx - dx, by - dy, 0] == mg.EMPTY))
    st2, r, term, _ = _step(params, _face(st, (nx, ny), dirn), mg.A_DONE)
    assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)


# ---------------------------------------------------------------------------
# ActionObjDoor
# ---------------------------------------------------------------------------


def test_actionobjdoor_structure():
    params = mg.parse_env_id("BabyAI-ActionObjDoor-v0")
    assert (params.kind, params.width, params.max_steps) == (
        "babyai_actionobj", 19, 8 * 49)
    verbs = set()
    for seed in range(16):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        doors = _doors(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
        assert len(doors) == 4 and len(objs) == 5
        walls = {(x if x in (6, 12) else None, y if y in (6, 12) else None)
                 for x, y in doors}
        assert walls == {(12, None), (None, 12), (6, None), (None, 6)}
        pairs = {(int(g[x, y, 0]), int(g[x, y, 1])) for x, y in objs}
        assert len(pairs) == 5, "distractors pairwise distinct"
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert 7 <= ax <= 11 and 7 <= ay <= 11
        t = np.asarray(st.target)
        verbs.add(int(t[0]))
        if t[1] == mg.DOOR:
            assert int(t[0]) in (0, 2), "doors get goto or open"
            assert any(int(g[x, y, 1]) == t[2] for x, y in doors)
        else:
            assert int(t[0]) in (0, 1), "objects get goto or pickup"
            assert (int(t[1]), int(t[2])) in pairs
    assert verbs == {0, 1, 2}, "all three verbs appear across episodes"


def _actionobj_episode(seed, want_verb):
    params = mg.parse_env_id("BabyAI-ActionObjDoor-v0")
    st = mg.reset(params, jax.random.PRNGKey(seed))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    if int(t[0]) != want_verb:
        return None
    cells = np.argwhere((g[..., 0] == t[1]) & (g[..., 1] == t[2]))
    for cx, cy in cells:
        for dirn, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
            nx, ny = cx - dx, cy - dy
            if g[nx, ny, 0] == mg.EMPTY:
                action = {0: mg.A_DONE, 1: mg.A_PICKUP,
                          2: mg.A_TOGGLE}[want_verb]
                st2 = _face(st, (int(nx), int(ny)), dirn)
                return _step(params, st2, action), params, st, g, t
    return None


@pytest.mark.parametrize("verb", [0, 1, 2])
def test_actionobjdoor_each_verb_succeeds(verb):
    for seed in range(64):
        out = _actionobj_episode(seed, verb)
        if out is None:
            continue
        (st2, r, term, _), params, *_ = out
        assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)
        return
    raise AssertionError(f"no seed with verb {verb}")


def test_actionobjdoor_wrong_verb_or_object_continues():
    params = mg.parse_env_id("BabyAI-ActionObjDoor-v0")
    for seed in range(64):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        t = np.asarray(st.target)
        if int(t[0]) != 1:
            continue
        # pickup of a NON-matching object does not end a pickup mission
        others = [
            (x, y)
            for x, y in np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
            if not (g[x, y, 0] == t[1] and g[x, y, 1] == t[2])
        ]
        for cx, cy in others:
            for dirn, (dx, dy) in enumerate(
                    [(1, 0), (0, 1), (-1, 0), (0, -1)]):
                nx, ny = cx - dx, cy - dy
                if g[nx, ny, 0] == mg.EMPTY:
                    st2, r, term, _ = _step(
                        params, _face(st, (int(nx), int(ny)), dirn),
                        mg.A_PICKUP)
                    assert not term and r == 0.0
                    return
    raise AssertionError("no pickup-mission seed with a reachable distractor")
