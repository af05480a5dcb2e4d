"""BabyAI round-4 families: the composite-instruction machine
(Before/After/And over goto/open/pickup/putnext — upstream
minigrid/envs/babyai/core/verifier.py, reconstructed) and the new
straggler levels: OneRoomS{n}, FindObjS{n}, PickupAbove, GoToDoor,
GoToObjDoor, PutNextS{s}N{n}[Carrying], MoveTwoAcross, OpenTwoDoors /
OpenRedBlueDoors[Debug], OpenDoorsOrderN{2,4}[Debug], PickupLoc.

Upstream minigrid is not installed in this image, so parity is
structural (generator invariants over seeds) plus scripted episodes for
every terminal rule of the new mechanism.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.minigrid import core as mg


def _face(st, pos, dirn):
    return dataclasses.replace(
        st, agent_pos=jnp.asarray(pos, jnp.int32), agent_dir=jnp.int32(dirn))


def _step(params, st, action):
    st, r, term, trunc = mg.step(params, st, jnp.int32(action))
    return st, float(r), bool(term), bool(trunc)


def _doors(grid):
    g = np.asarray(grid)
    return [(int(x), int(y)) for x, y in np.argwhere(g[..., 0] == mg.DOOR)]


def _objs(grid):
    g = np.asarray(grid)
    mask = np.isin(g[..., 0], (mg.KEY, mg.BALL, mg.BOX))
    return [(int(x), int(y), int(g[x, y, 0]), int(g[x, y, 1]))
            for x, y in np.argwhere(mask)]


def _toggle_door(params, st, dx, dy):
    """Face the door from a free side and toggle it."""
    for (ax, ay), dirn in [((dx - 1, dy), 0), ((dx + 1, dy), 2),
                           ((dx, dy - 1), 1), ((dx, dy + 1), 3)]:
        if 0 < ax < params.width - 1 and 0 < ay < params.height - 1:
            g = np.asarray(st.grid)
            if g[ax, ay, 0] == mg.EMPTY:
                return _step(params, _face(st, (ax, ay), dirn), mg.A_TOGGLE)
    raise AssertionError("no free cell beside the door")


# ---------------------------------------------------------------------------
# parse + structure
# ---------------------------------------------------------------------------


def test_parse_new_ids():
    p = mg.parse_env_id("BabyAI-OneRoomS12-v0")
    assert (p.kind, p.width, p.success, p.type_only) == (
        "babyai_goto", 12, "babyai_pickup", True)
    p = mg.parse_env_id("BabyAI-FindObjS6-v0")
    assert (p.kind, p.width, p.fixed_agent_room, p.agent_room) == (
        "babyai_gotomaze", 16, True, (1, 1))
    p = mg.parse_env_id("BabyAI-PickupAbove-v0")
    assert (p.obj_room, p.predoor) == ((1, 0), (1, 1, 3))
    p = mg.parse_env_id("BabyAI-GoToDoor-v0")
    assert (p.kind, p.width, p.num_objs) == ("babyai_objdoor", 19, 0)
    p = mg.parse_env_id("BabyAI-GoToObjDoor-v0")
    assert (p.kind, p.width, p.num_objs) == ("babyai_objdoor", 16, 8)
    p = mg.parse_env_id("BabyAI-PutNextS7N4Carrying-v0")
    assert (p.kind, p.width, p.height, p.num_objs, p.start_carrying) == (
        "babyai_putnext2", 13, 7, 4, True)
    p = mg.parse_env_id("BabyAI-MoveTwoAcrossS8N9-v0")
    assert (p.kind, p.num_objs, p.success) == (
        "babyai_putnext2", 9, "babyai_seq")
    p = mg.parse_env_id("BabyAI-OpenRedBlueDoorsDebug-v0")
    assert (p.comp, p.first_color, p.second_color, p.strict) == (
        "before", mg.RED, mg.BLUE, True)
    p = mg.parse_env_id("BabyAI-OpenDoorsOrderN4-v0")
    assert (p.comp, p.num_objs, p.strict) == ("", 4, False)
    p = mg.parse_env_id("BabyAI-PickupLoc-v0")
    assert (p.kind, p.num_objs, p.success) == (
        "babyai_pickuploc", 8, "babyai_seq")


def test_oneroom_structure_and_pickup():
    params = mg.parse_env_id("BabyAI-OneRoomS8-v0")
    colors = set()
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        objs = _objs(st.grid)
        assert len(objs) == 1 and objs[0][2] == mg.BALL
        colors.add(objs[0][3])
        t = np.asarray(st.target)
        assert t[0] == mg.BALL and t[1] == -1, "type-only mission"
    assert len(colors) > 1, "ball color varies"
    # scripted pickup of the ball succeeds with the time-scaled reward
    st = mg.reset(params, jax.random.PRNGKey(0))
    (x, y, _, _) = _objs(st.grid)[0]
    st2, r, term, _ = _step(params, _face(st, (x - 1, y), 0), mg.A_PICKUP)
    assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)


def test_findobj_structure():
    params = mg.parse_env_id("BabyAI-FindObjS5-v0")
    rooms = set()
    for seed in range(10):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        objs = _objs(st.grid)
        assert len(objs) == 1
        (x, y, t, c) = objs[0]
        rooms.add((x // 4, y // 4))
        tt = np.asarray(st.target)
        assert tt[0] == t and tt[1] == -1
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert 4 < ax < 8 and 4 < ay < 8, "agent in the middle room"
    assert len(rooms) > 2, "object room varies"


def test_pickupabove_structure_and_solve():
    params = mg.parse_env_id("BabyAI-PickupAbove-v0")
    for seed in range(6):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        objs = _objs(st.grid)
        assert len(objs) == 1
        (x, y, t, c) = objs[0]
        assert 7 < x < 14 and 0 < y < 7, "object in the room above middle"
        # a door exists on the wall between rooms (1,1) and (1,0)
        top_wall = [d for d in _doors(st.grid) if d[1] == 7 and 7 < d[0] < 14]
        assert top_wall, "guaranteed top door (add_door(1,1,3))"
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert 7 < ax < 14 and 7 < ay < 14
    st = mg.reset(params, jax.random.PRNGKey(1))
    (x, y, t, c) = _objs(st.grid)[0]
    st2, r, term, _ = _step(params, _face(st, (x, y + 1), 3), mg.A_PICKUP)
    assert term and r > 0


def test_gotodoor_structure_and_goto():
    params = mg.parse_env_id("BabyAI-GoToDoor-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    doors = _doors(st.grid)
    assert len(doors) == 4 and not _objs(st.grid)
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    assert t[0] == mg.DOOR
    match = [d for d in doors if g[d[0], d[1], 1] == t[1]]
    assert match, "target color names at least one door"
    # facing a matching door succeeds (GoToInstr on the post-step front)
    dx, dy = match[0]
    if dx in (6, 12):
        pos, dirn = ((dx - 1, dy), 0) if dx == 12 else ((dx + 1, dy), 2)
    else:
        pos, dirn = ((dx, dy - 1), 1) if dy == 12 else ((dx, dy + 1), 3)
    st2, r, term, _ = _step(params, _face(st, pos, dirn), mg.A_DONE)
    assert term and r > 0
    # facing a NON-matching door does not
    non = [d for d in doors if g[d[0], d[1], 1] != t[1]]
    if non:
        dx, dy = non[0]
        if dx in (6, 12):
            pos, dirn = ((dx - 1, dy), 0) if dx == 12 else ((dx + 1, dy), 2)
        else:
            pos, dirn = ((dx, dy - 1), 1) if dy == 12 else ((dx, dy + 1), 3)
        st2, r, term, _ = _step(params, _face(st, pos, dirn), mg.A_DONE)
        assert not term


def test_gotoobjdoor_structure():
    params = mg.parse_env_id("BabyAI-GoToObjDoor-v0")
    door_targets = obj_targets = 0
    for seed in range(12):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        assert len(_doors(st.grid)) == 4
        assert len(_objs(st.grid)) == 8
        t = np.asarray(st.target)
        if t[0] == mg.DOOR:
            door_targets += 1
        else:
            obj_targets += 1
    assert door_targets and obj_targets, "mission mixes doors and objects"


def test_putnext_structure_carrying_and_drop():
    params = mg.parse_env_id("BabyAI-PutNextS5N2-v0")
    st = mg.reset(params, jax.random.PRNGKey(3))
    objs = _objs(st.grid)
    assert len(objs) == 4
    assert len({(t, c) for (_, _, t, c) in objs}) == 4, "all distinct"
    left = [o for o in objs if o[0] < 4]
    right = [o for o in objs if o[0] > 4]
    assert len(left) == 2 and len(right) == 2
    # no dividing wall: column 4 interior is open floor
    g = np.asarray(st.grid)
    assert (g[4, 1:-1, 0] != mg.WALL).all()
    t = np.asarray(st.target)
    pairs = {(o[2], o[3]) for o in objs}
    assert (t[0], t[1]) in pairs and (t[2], t[3]) in pairs

    # Carrying variant: the move object starts in hand and off the grid
    pc = mg.parse_env_id("BabyAI-PutNextS5N2Carrying-v0")
    stc = mg.reset(pc, jax.random.PRNGKey(3))
    tc = np.asarray(stc.target)
    carry = np.asarray(stc.carrying)
    assert (carry[0], carry[1]) == (tc[0], tc[1])
    assert len(_objs(stc.grid)) == 3
    # drop it next to the fixed object -> success
    fixed = [o for o in _objs(stc.grid) if (o[2], o[3]) == (tc[2], tc[3])]
    fx, fy = fixed[0][:2]
    g = np.asarray(stc.grid)
    for (ex, ey) in [(fx - 1, fy), (fx + 1, fy), (fx, fy - 1), (fx, fy + 1)]:
        if g[ex, ey, 0] == mg.EMPTY:
            for (ax, ay), dirn in [((ex - 1, ey), 0), ((ex + 1, ey), 2),
                                   ((ex, ey - 1), 1), ((ex, ey + 1), 3)]:
                if (0 < ax < pc.width - 1 and 0 < ay < pc.height - 1
                        and g[ax, ay, 0] == mg.EMPTY):
                    st2, r, term, _ = _step(
                        pc, _face(stc, (ax, ay), dirn), mg.A_DROP)
                    assert term and r > 0
                    return
    raise AssertionError("no drop cell found")


# ---------------------------------------------------------------------------
# the composite machine: Before / After / And
# ---------------------------------------------------------------------------


def test_opentwodoors_before_semantics():
    params = mg.parse_env_id("BabyAI-OpenTwoDoors-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    doors = _doors(st.grid)
    assert sorted(d[0] for d in doors) == [5, 10], "west + east walls"
    g = np.asarray(st.grid)
    instr = np.asarray(st.instr)
    assert int(np.asarray(st.target)[0]) == 2, "comp = before"
    c1, c2 = instr[0][2], instr[2][2]
    assert c1 != c2
    d1 = next(d for d in doors if g[d[0], d[1], 1] == c1)
    d2 = next(d for d in doors if g[d[0], d[1], 1] == c2)

    # opening door2 FIRST does nothing (B unverified while A incomplete)
    st1, r, term, _ = _toggle_door(params, st, *d2)
    assert not term and r == 0.0
    assert int(np.asarray(st1.instr_state)[2, 0]) == 0
    # opening door1 completes A; B's same-step verify sees no door2 toggle
    st2, r, term, _ = _toggle_door(params, st1, *d1)
    assert not term
    assert int(np.asarray(st2.instr_state)[0, 0]) == 1, "A latched"
    # door2 is open from the premature toggle; re-toggling closes it
    st3, r, term, _ = _toggle_door(params, st2, *d2)
    assert not term, "toggle closed the open door - not a success"
    # ...and the next toggle opens it: success with the time reward
    st4, r, term, _ = _toggle_door(params, st3, *d2)
    assert term and r == pytest.approx(
        1.0 - 0.9 * float(st4.step_count) / params.max_steps)


def test_openredblue_debug_strict_failure():
    params = mg.parse_env_id("BabyAI-OpenRedBlueDoorsDebug-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    doors = _doors(st.grid)
    red = next(d for d in doors if g[d[0], d[1], 1] == mg.RED)
    blue = next(d for d in doors if g[d[0], d[1], 1] == mg.BLUE)
    # toggling the blue door while verifying the strict red OpenInstr fails
    st1, r, term, _ = _toggle_door(params, st, *blue)
    assert term and r == 0.0, "strict OpenInstr fails on a wrong front door"
    # the happy path: red then blue
    st1, r, term, _ = _toggle_door(params, st, *red)
    assert not term
    st2, r, term, _ = _toggle_door(params, st1, *blue)
    assert term and r > 0


def _find_order_seed(params, want_comp):
    for seed in range(64):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        if int(np.asarray(st.target)[0]) == want_comp:
            return st
    raise AssertionError(f"no seed with comp={want_comp}")


def test_opendoorsorder_modes():
    params = mg.parse_env_id("BabyAI-OpenDoorsOrderN2-v0")
    # single mode: opening door1 alone succeeds
    st = _find_order_seed(params, 0)
    g = np.asarray(st.grid)
    instr = np.asarray(st.instr)
    assert instr[2][0] == 0, "slot B absent in single mode"
    d1 = next(d for d in _doors(st.grid) if g[d[0], d[1], 1] == instr[0][2])
    st1, r, term, _ = _toggle_door(params, st, *d1)
    assert term and r > 0

    # after mode: door2 must be opened before door1
    st = _find_order_seed(params, 3)
    g = np.asarray(st.grid)
    instr = np.asarray(st.instr)
    d1 = next(d for d in _doors(st.grid) if g[d[0], d[1], 1] == instr[0][2])
    d2 = next(d for d in _doors(st.grid) if g[d[0], d[1], 1] == instr[2][2])
    # door1 first: unverified, no latch
    st1, r, term, _ = _toggle_door(params, st, *d1)
    assert not term and int(np.asarray(st1.instr_state)[0, 0]) == 0
    # door2 (the B half) latches
    st2, r, term, _ = _toggle_door(params, st1, *d2)
    assert not term and int(np.asarray(st2.instr_state)[2, 0]) == 1
    # door1 is open from the premature toggle; close it, open it -> success
    st3, _, term, _ = _toggle_door(params, st2, *d1)
    assert not term
    st4, r, term, _ = _toggle_door(params, st3, *d1)
    assert term and r > 0


def test_and_composition_via_injected_instr():
    """No generated level uses a bare And yet (that is the Synth tier);
    pin AndInstr's order-free semantics by injecting comp=1 over the
    OpenDoorsOrder layout."""
    params = mg.parse_env_id("BabyAI-OpenDoorsOrderN2-v0")
    st = _find_order_seed(params, 2)  # any 2-door layout
    g = np.asarray(st.grid)
    instr = np.asarray(st.instr).copy()
    instr[1] = instr[2]          # and(open d1, open d2) in slots 0-1
    instr[2] = 0
    st = dataclasses.replace(
        st,
        instr=jnp.asarray(instr),
        target=jnp.zeros(8, jnp.int32).at[0].set(1),
    )
    d1 = next(d for d in _doors(st.grid) if g[d[0], d[1], 1] == instr[0][2])
    d2 = next(d for d in _doors(st.grid) if g[d[0], d[1], 1] == instr[1][2])
    # either order works; second completion succeeds
    st1, r, term, _ = _toggle_door(params, st, *d2)
    assert not term and int(np.asarray(st1.instr_state)[1, 0]) == 1
    st2, r, term, _ = _toggle_door(params, st1, *d1)
    assert term and r > 0


def test_before_and_composed_b_latches_pre_a():
    """Non-strict Before(A, And(B1, B2)): upstream verifier.py's
    BeforeInstr calls instr_b.verify(action) every step pre-A in
    non-strict mode, so the And's INTERNAL latches accumulate — a B
    sub-goal completed before A stays done (the agent need not redo
    it). A single-instruction B half does NOT persist (upstream
    overwrites b_done each step; pinned by
    test_opentwodoors_before_semantics). Injected over the
    OpenDoorsOrderN4 4-door layout since no generated level emits
    Before with an And half directly."""
    params = mg.parse_env_id("BabyAI-OpenDoorsOrderN4-v0")
    st = _find_order_seed(params, 2)  # any 4-door layout
    g = np.asarray(st.grid)
    instr = np.asarray(st.instr).copy()
    doors = _doors(st.grid)
    colors = [int(g[x, y, 1]) for x, y in doors]
    assert len(set(colors)) >= 3
    c1, c2, c3 = colors[:3]
    row = instr[0].copy()
    for slot, color in ((0, c1), (2, c2), (3, c3)):
        instr[slot] = row
        instr[slot][2] = color
    instr[1] = 0
    st = dataclasses.replace(
        st,
        instr=jnp.asarray(instr),
        instr_state=jnp.zeros_like(st.instr_state),
        target=jnp.zeros(8, jnp.int32).at[0].set(2),  # before
    )
    d1, d2, d3 = doors[:3]
    # B1 (door c2) pre-A: the And-composed B half LATCHES
    st1, r, term, _ = _toggle_door(params, st, *d2)
    assert not term and r == 0.0
    assert int(np.asarray(st1.instr_state)[2, 0]) == 1, \
        "And-composed B sub-goal latches pre-A (upstream non-strict)"
    # A (door c1) completes
    st2, r, term, _ = _toggle_door(params, st1, *d1)
    assert not term
    assert int(np.asarray(st2.instr_state)[0, 0]) == 1
    # B2 (door c3) completes B — success WITHOUT redoing B1
    st3, r, term, _ = _toggle_door(params, st2, *d3)
    assert term and r == pytest.approx(
        1.0 - 0.9 * float(st3.step_count) / params.max_steps)


def test_movetwoacross_before_putnext():
    params = mg.parse_env_id("BabyAI-MoveTwoAcrossS5N2-v0")
    st = mg.reset(params, jax.random.PRNGKey(5))
    instr = np.asarray(st.instr)
    assert instr[0][0] == 4 and instr[2][0] == 4
    assert int(np.asarray(st.target)[0]) == 2

    def drop_next_to(stx, move_tc, fixed_tc):
        """Teleport-carry the move object and drop it beside the fixed."""
        g = np.asarray(stx.grid)
        objs = _objs(stx.grid)
        (mx, my, _, _) = next(o for o in objs if (o[2], o[3]) == move_tc)
        (fx, fy, _, _) = next(o for o in objs if (o[2], o[3]) == fixed_tc)
        g2 = jnp.asarray(g).at[mx, my].set(
            jnp.asarray([mg.EMPTY, 0, 0], jnp.int8))
        stx = dataclasses.replace(
            stx, grid=g2,
            carrying=jnp.asarray([move_tc[0], move_tc[1], 0], jnp.int8))
        g = np.asarray(stx.grid)
        for (ex, ey) in [(fx - 1, fy), (fx + 1, fy), (fx, fy - 1),
                         (fx, fy + 1)]:
            if g[ex, ey, 0] != mg.EMPTY:
                continue
            for (ax, ay), dirn in [((ex - 1, ey), 0), ((ex + 1, ey), 2),
                                   ((ex, ey - 1), 1), ((ex, ey + 1), 3)]:
                if (0 < ax < params.width - 1 and 0 < ay < params.height - 1
                        and g[ax, ay, 0] == mg.EMPTY and (ax, ay) != (ex, ey)):
                    return _step(params, _face(stx, (ax, ay), dirn), mg.A_DROP)
        raise AssertionError("no drop spot")

    a = (instr[0][1], instr[0][2])
    b = (instr[0][3], instr[0][4])
    c = (instr[2][1], instr[2][2])
    dd = (instr[2][3], instr[2][4])
    # first putnext latches A, no success yet
    st1, r, term, _ = drop_next_to(st, a, b)
    assert not term and int(np.asarray(st1.instr_state)[0, 0]) == 1
    # second putnext completes B -> success
    st2, r, term, _ = drop_next_to(st1, c, dd)
    assert term and r > 0


def test_movetwoacross_b_first_counts_on_a_completion():
    """Upstream BeforeInstr verifies B on the very step A completes — if
    B's condition already holds on the grid, that same drop succeeds."""
    params = mg.parse_env_id("BabyAI-MoveTwoAcrossS5N2-v0")
    st = mg.reset(params, jax.random.PRNGKey(5))
    instr = np.asarray(st.instr)
    a = (instr[0][1], instr[0][2])
    b = (instr[0][3], instr[0][4])
    c = (instr[2][1], instr[2][2])
    dd = (instr[2][3], instr[2][4])

    # manually place c adjacent to d BEFORE A is done
    g = np.asarray(st.grid)
    objs = _objs(st.grid)
    (cx, cy, _, _) = next(o for o in objs if (o[2], o[3]) == c)
    (dx, dy, _, _) = next(o for o in objs if (o[2], o[3]) == dd)
    g2 = jnp.asarray(g).at[cx, cy].set(jnp.asarray([mg.EMPTY, 0, 0], jnp.int8))
    placed = False
    for (ex, ey) in [(dx - 1, dy), (dx + 1, dy), (dx, dy - 1), (dx, dy + 1)]:
        if g[ex, ey, 0] == mg.EMPTY and (ex, ey) != (cx, cy):
            g2 = g2.at[ex, ey].set(jnp.asarray([c[0], c[1], 0], jnp.int8))
            placed = True
            break
    if not placed:
        pytest.skip("layout leaves no adjacent cell")
    st = dataclasses.replace(st, grid=g2)

    # now the drop that completes A also satisfies B's same-step verify
    objs = _objs(st.grid)
    (ax_, ay_, _, _) = next(o for o in objs if (o[2], o[3]) == a)
    (bx, by, _, _) = next(o for o in objs if (o[2], o[3]) == b)
    g = np.asarray(st.grid)
    g2 = jnp.asarray(g).at[ax_, ay_].set(
        jnp.asarray([mg.EMPTY, 0, 0], jnp.int8))
    st = dataclasses.replace(
        st, grid=g2, carrying=jnp.asarray([a[0], a[1], 0], jnp.int8))
    g = np.asarray(st.grid)
    for (ex, ey) in [(bx - 1, by), (bx + 1, by), (bx, by - 1), (bx, by + 1)]:
        if g[ex, ey, 0] != mg.EMPTY:
            continue
        for (px, py), dirn in [((ex - 1, ey), 0), ((ex + 1, ey), 2),
                               ((ex, ey - 1), 1), ((ex, ey + 1), 3)]:
            if (0 < px < params.width - 1 and 0 < py < params.height - 1
                    and g[px, py, 0] == mg.EMPTY and (px, py) != (ex, ey)):
                st2, r, term, _ = _step(
                    params, _face(st, (px, py), dirn), mg.A_DROP)
                assert term and r > 0
                return
    pytest.skip("no drop spot in this layout")


# ---------------------------------------------------------------------------
# PickupLoc: location descriptors + identity tracking
# ---------------------------------------------------------------------------


def test_pickuploc_structure():
    params = mg.parse_env_id("BabyAI-PickupLoc-v0")
    saw_positional = saw_desc = False
    for seed in range(24):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        assert len(_objs(st.grid)) == 8
        instr = np.asarray(st.instr)
        assert instr[0][0] == 3, "a pickup instruction"
        if instr[0][5] & 1:
            saw_positional = True
            poss = [int(v) for v in instr[0][6:12] if v > 0]
            assert poss, "positional set non-empty"
            g = np.asarray(st.grid)
            for v in poss:
                x, y = (v - 1) // params.height, (v - 1) % params.height
                assert g[x, y, 0] in (mg.KEY, mg.BALL, mg.BOX)
        else:
            saw_desc = True
            g = np.asarray(st.grid)
            t, c = instr[0][1], instr[0][2]
            m = (g[..., 0] == t) & ((c < 0) | (g[..., 1] == c))
            assert m.any(), "descriptor matches at least one object"
    assert saw_positional and saw_desc, "both desc kinds appear"


def test_pickuploc_identity_tracking():
    params = mg.parse_env_id("BabyAI-PickupLoc-v0")
    for seed in range(64):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        instr = np.asarray(st.instr)
        if not (instr[0][5] & 1):
            continue
        poss = [int(v) for v in instr[0][6:12] if v > 0]
        g = np.asarray(st.grid)
        all_objs = _objs(st.grid)
        tracked = {((v - 1) // params.height, (v - 1) % params.height)
                   for v in poss}
        untracked = [(x, y) for (x, y, t, c) in all_objs
                     if (x, y) not in tracked]
        (tx, ty) = next(iter(tracked))
        # picking an UNTRACKED object: continue (loc filter excludes it)
        if untracked:
            (ux, uy) = untracked[0]
            st1, r, term, _ = _step(
                params, _face(st, (ux, uy - 1), 1), mg.A_PICKUP)
            if np.asarray(st1.carrying)[0] != 0:  # pickup actually happened
                assert not term and r == 0.0
        # picking a TRACKED object succeeds
        st2, r, term, _ = _step(
            params, _face(st, (tx, ty - 1), 1), mg.A_PICKUP)
        if np.asarray(st2.carrying)[0] == 0:
            continue  # faced a wall-adjacent quirk; try another seed
        assert term and r > 0
        return
    pytest.skip("no positional episode with a pickable layout found")


def test_positional_drop_resync():
    """A tracked object keeps its identity across pickup/drop (upstream
    update_objs_poss): dropped elsewhere, it still satisfies the
    instruction; built directly on the machine with an injected goto."""
    params = mg.parse_env_id("BabyAI-PickupLoc-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    (x, y, t, c) = _objs(st.grid)[0]
    packed = x * params.height + y + 1
    # pickup slot, positional, tracking exactly that object
    row = np.zeros(12, np.int64)
    row[0] = 3
    row[5] = 1
    row[6] = packed
    st = dataclasses.replace(
        st,
        instr=jnp.zeros((4, 12), jnp.int32).at[0].set(
            jnp.asarray(row, jnp.int32)),
        target=jnp.zeros(8, jnp.int32),
    )
    # 1. another pickup/drop cycle by the agent elsewhere does not break it
    st1, _, term, _ = _step(params, _face(st, (x, y + 1), 3), mg.A_PICKUP)
    assert term, "picking the tracked object succeeds"
    # 2. drop re-sync: suppress success by making it a goto slot first
    row[0] = 1
    st2 = dataclasses.replace(
        st, instr=jnp.zeros((4, 12), jnp.int32).at[0].set(
            jnp.asarray(row, jnp.int32)))
    # facing the tracked object succeeds as goto
    st3, r, term, _ = _step(params, _face(st2, (x, y + 1), 3), mg.A_FORWARD)
    assert term and r > 0


def test_registry_additions_parse_and_reset():
    new_ids = [
        "BabyAI-OneRoomS8-v0", "BabyAI-OneRoomS12-v0",
        "BabyAI-OneRoomS16-v0", "BabyAI-OneRoomS20-v0",
        "BabyAI-FindObjS5-v0", "BabyAI-FindObjS6-v0", "BabyAI-FindObjS7-v0",
        "BabyAI-PickupAbove-v0", "BabyAI-GoToDoor-v0", "BabyAI-GoToObjDoor-v0",
        "BabyAI-PutNextS4N1-v0", "BabyAI-PutNextS5N1-v0",
        "BabyAI-PutNextS5N2-v0", "BabyAI-PutNextS6N3-v0",
        "BabyAI-PutNextS7N4-v0", "BabyAI-PutNextS5N2Carrying-v0",
        "BabyAI-PutNextS6N3Carrying-v0", "BabyAI-PutNextS7N4Carrying-v0",
        "BabyAI-MoveTwoAcrossS5N2-v0", "BabyAI-MoveTwoAcrossS8N9-v0",
        "BabyAI-OpenTwoDoors-v0", "BabyAI-OpenRedBlueDoors-v0",
        "BabyAI-OpenRedBlueDoorsDebug-v0",
        "BabyAI-OpenDoorsOrderN2-v0", "BabyAI-OpenDoorsOrderN4-v0",
        "BabyAI-OpenDoorsOrderN2Debug-v0", "BabyAI-OpenDoorsOrderN4Debug-v0",
        "BabyAI-PickupLoc-v0",
    ]
    for env_id in new_ids:
        params = mg.parse_env_id(env_id)
        st = mg.reset(params, jax.random.PRNGKey(0))
        assert np.asarray(st.grid).shape == (params.width, params.height, 3)
