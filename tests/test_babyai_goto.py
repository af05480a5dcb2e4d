"""The single-room BabyAI tier: GoToRedBall{,Grey,NoDists}, GoToObj[Ss],
GoToLocal[SsNn], PutNextLocal[SsNn], PickupDist[Debug] — layout
invariants, the check_objs_reachable rejection rule, and
GoToInstr/PutNextInstr/PickupInstr success semantics (the reference
trains any registered id via gym.make, `ppo_minigrid.py:106-119`; the
minigrid package registers the BabyAI namespace alongside the MiniGrid
one).

Upstream minigrid is not installed in this image, so parity is
structural against the upstream generators
(minigrid/envs/babyai/{goto,putnext,pickup}.py, core/roomgrid_level.py,
core/verifier.py — reconstructed): generator invariants over seeds plus
scripted episodes for every terminal rule.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg

OBJ_TYPES = (mg.KEY, mg.BALL, mg.BOX)


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


def _reachable_oracle(obj, agent_pos):
    """Python mirror of upstream check_objs_reachable: flood-fill from
    the agent over EMPTY cells (objects don't expand); every object cell
    must end up 4-adjacent to a filled cell (or be the seed)."""
    w, h = obj.shape
    filled = {tuple(agent_pos)}
    stack = [tuple(agent_pos)]
    while stack:
        x, y = stack.pop()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            n = (x + dx, y + dy)
            if n in filled or not (0 <= n[0] < w and 0 <= n[1] < h):
                continue
            if obj[n] == mg.EMPTY:
                filled.add(n)
                stack.append(n)
    for x, y in np.argwhere(np.isin(obj, OBJ_TYPES)):
        near = {(x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)}
        if not (near & filled):
            return False
    return True


# ---------------------------------------------------------------------------
# parse_env_id
# ---------------------------------------------------------------------------


def test_parse_babyai_ids():
    p = mg.parse_env_id("BabyAI-GoToRedBall-v0")
    assert (p.kind, p.width, p.max_steps) == ("babyai_goto", 8, 8 * 64)
    assert p.num_objs == 7 and not p.grey_dists and p.target_color == mg.RED
    assert not p.see_through_walls and p.success == "babyai_goto"
    p = mg.parse_env_id("BabyAI-GoToRedBallGrey-v0")
    assert p.num_objs == 7 and p.grey_dists
    p = mg.parse_env_id("BabyAI-GoToRedBallNoDists-v0")
    assert p.num_objs == 0 and p.target_color == mg.RED
    p = mg.parse_env_id("BabyAI-GoToObjS4-v0")
    assert (p.width, p.num_objs, p.max_steps) == (4, 1, 8 * 16)
    assert p.target_color == -1
    p = mg.parse_env_id("BabyAI-GoToLocalS6N3-v0")
    assert (p.width, p.num_objs, p.max_steps) == (6, 3, 8 * 36)
    p = mg.parse_env_id("BabyAI-GoToLocal-v0")
    assert (p.width, p.num_objs) == (8, 8)
    # r4: BossLevel now parses (the LevelGen tier); truly unknown ids
    # still raise with the supported grid named
    assert mg.parse_env_id("BabyAI-BossLevel-v0").success == "babyai_seq"
    with pytest.raises(ValueError, match="BabyAI-GoToLocal"):
        mg.parse_env_id("BabyAI-NoSuchLevel-v0")


# ---------------------------------------------------------------------------
# Layout invariants
# ---------------------------------------------------------------------------


def test_redball_structure():
    params = mg.parse_env_id("BabyAI-GoToRedBall-v0")
    dist_pairs = set()
    for seed in range(16):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        objs = np.argwhere(np.isin(obj, OBJ_TYPES))
        assert len(objs) == 8
        red_balls = [(x, y) for x, y in objs
                     if obj[x, y] == mg.BALL and g[x, y, 1] == mg.RED]
        assert len(red_balls) >= 1
        for x, y in objs:
            dist_pairs.add((int(obj[x, y]), int(g[x, y, 1])))
        t = np.asarray(st.target)
        assert (t[0], t[1]) == (mg.BALL, mg.RED)
        ax, ay = np.asarray(st.agent_pos)
        assert obj[ax, ay] == mg.EMPTY and 1 <= ax <= 6 and 1 <= ay <= 6
        assert _reachable_oracle(obj, (int(ax), int(ay)))
    # distractor types and colors both vary across episodes
    assert len({p[0] for p in dist_pairs}) == 3
    assert len({p[1] for p in dist_pairs}) >= 4


def test_redball_grey_recolors_distractors():
    params = mg.parse_env_id("BabyAI-GoToRedBallGrey-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
        assert len(objs) == 8
        reds = [(x, y) for x, y in objs if g[x, y, 1] == mg.RED]
        assert len(reds) == 1 and g[reds[0][0], reds[0][1], 0] == mg.BALL
        for x, y in objs:
            if (x, y) != reds[0]:
                assert g[x, y, 1] == mg.GREY


def test_nodists_single_red_ball():
    params = mg.parse_env_id("BabyAI-GoToRedBallNoDists-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
        assert len(objs) == 1
        x, y = objs[0]
        assert g[x, y, 0] == mg.BALL and g[x, y, 1] == mg.RED


def test_gotoobj_and_local_target_names_placed_object():
    for env_id, n in [("BabyAI-GoToObj-v0", 1), ("BabyAI-GoToObjS4-v0", 1),
                      ("BabyAI-GoToLocal-v0", 8),
                      ("BabyAI-GoToLocalS5N2-v0", 2)]:
        params = mg.parse_env_id(env_id)
        targets = set()
        for seed in range(12):
            st = mg.reset(params, jax.random.PRNGKey(seed))
            g = np.asarray(st.grid)
            objs = np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
            assert len(objs) == n, env_id
            t = np.asarray(st.target)
            assert any(g[x, y, 0] == t[0] and g[x, y, 1] == t[1]
                       for x, y in objs), env_id
            targets.add((int(t[0]), int(t[1])))
        assert len(targets) > 1, f"{env_id}: mission must vary per episode"


def test_local_layouts_always_reachable():
    params = mg.parse_env_id("BabyAI-GoToLocal-v0")
    keys = jax.random.split(jax.random.PRNGKey(7), 64)
    states = jax.vmap(lambda k: mg.reset(params, k))(keys)
    grids = np.asarray(states.grid)
    agents = np.asarray(states.agent_pos)
    for i in range(len(keys)):
        assert _reachable_oracle(grids[i, ..., 0], tuple(agents[i]))


# ---------------------------------------------------------------------------
# GoToInstr success semantics
# ---------------------------------------------------------------------------


def _target_and_neighbor(st):
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    cells = np.argwhere((g[..., 0] == t[0]) & (g[..., 1] == t[1]))
    x, y = map(int, cells[0])
    (nx, ny), dirn = _free_neighbor(g[..., 0], x, y)
    return g, t, (x, y), (nx, ny), dirn


def test_turn_to_face_target_succeeds():
    params = mg.parse_env_id("BabyAI-GoToRedBall-v0")
    for seed in range(6):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        _, _, _, (nx, ny), dirn = _target_and_neighbor(st)
        st = _face(st, (nx, ny), (dirn + 1) % 4)
        st, r, term, _ = _step(params, st, mg.A_LEFT)
        assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)


def test_forward_into_facing_cell_succeeds():
    """Stepping forward so the target enters the front cell succeeds."""
    params = mg.parse_env_id("BabyAI-GoToLocal-v0")
    for seed in range(12):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g, t, (x, y), (nx, ny), dirn = _target_and_neighbor(st)
        dx, dy = [(1, 0), (0, 1), (-1, 0), (0, -1)][dirn]
        bx, by = nx - dx, ny - dy  # one further back, same facing
        if not (0 <= bx < g.shape[0] and 0 <= by < g.shape[1]) \
                or g[bx, by, 0] != mg.EMPTY:
            continue
        st = _face(st, (bx, by), dirn)
        st, r, term, _ = _step(params, st, mg.A_FORWARD)
        assert term and r > 0
        return
    raise AssertionError("no seed with a two-deep approach lane")


def test_facing_non_matching_distractor_continues():
    params = mg.parse_env_id("BabyAI-GoToRedBallGrey-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    grey = [(x, y) for x, y in np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
            if g[x, y, 1] == mg.GREY][0]
    (nx, ny), dirn = _free_neighbor(g[..., 0], *map(int, grey))
    st = _face(st, (nx, ny), (dirn + 1) % 4)
    st, r, term, _ = _step(params, st, mg.A_LEFT)
    assert not term and r == 0.0
    # done / toggle are plain actions for GoTo missions (no special rule)
    st2, r, term, _ = _step(params, st, mg.A_DONE)
    assert not term and r == 0.0


def test_pickup_of_target_succeeds_from_reset_facing_state():
    """Upstream's verifier keeps the stale position list at the pickup
    step, so picking the target up from a state already facing it ends
    the episode with the reward."""
    params = mg.parse_env_id("BabyAI-GoToRedBallNoDists-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    _, _, _, (nx, ny), dirn = _target_and_neighbor(st)
    st = _face(st, (nx, ny), dirn)
    st, r, term, _ = _step(params, st, mg.A_PICKUP)
    assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)
    assert int(st.carrying[0]) == mg.BALL


def test_pickup_of_distractor_continues_and_drop_in_front_succeeds():
    params = mg.parse_env_id("BabyAI-GoToRedBallGrey-v0")
    st0 = mg.reset(params, jax.random.PRNGKey(1))
    g = np.asarray(st0.grid)
    grey = [(x, y) for x, y in np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
            if g[x, y, 1] == mg.GREY][0]
    (nx, ny), dirn = _free_neighbor(g[..., 0], *map(int, grey))
    st, r, term, _ = _step(params, _face(st0, (nx, ny), dirn), mg.A_PICKUP)
    assert not term and r == 0.0 and int(st.carrying[1]) == mg.GREY
    # dropping the MATCHING object in front succeeds via the refreshed
    # grid (upstream update_objs_poss on drop): hand the agent a red ball
    st = dataclasses.replace(
        st, carrying=jnp.asarray([mg.BALL, mg.RED, 0], jnp.int8))
    st, r, term, _ = _step(params, st, mg.A_DROP)
    g2 = np.asarray(st.grid)
    assert g2[grey[0], grey[1], 0] == mg.BALL and g2[grey[0], grey[1], 1] == mg.RED
    assert term and r == pytest.approx(1.0 - 0.9 * 2 / params.max_steps)


def test_truncates_at_max_steps():
    # spinning in place for max_steps must truncate without terminating —
    # from a cell none of whose neighbors holds the object (facing an
    # object IS success for GoTo missions, so the cell must be clear)
    params = mg.parse_env_id("BabyAI-GoToObjS6-v0")
    st = mg.reset(params, jax.random.PRNGKey(3))
    g = np.asarray(st.grid)
    obj = g[..., 0]
    spot = next(
        (x, y) for x, y in np.argwhere(obj == mg.EMPTY)
        if all(obj[x + dx, y + dy] in (mg.EMPTY, mg.WALL)
               for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))))
    st = _face(st, (int(spot[0]), int(spot[1])), 0)
    term = trunc = False
    for _ in range(params.max_steps):
        st, r, term, trunc = _step(params, st, mg.A_RIGHT)
        assert not term
    assert trunc


# ---------------------------------------------------------------------------
# PutNextLocal
# ---------------------------------------------------------------------------


def test_parse_putnext_and_pickup_ids():
    p = mg.parse_env_id("BabyAI-PutNextLocal-v0")
    assert (p.kind, p.width, p.num_objs, p.max_steps) == (
        "babyai_putnext", 8, 8, 8 * 64)
    p = mg.parse_env_id("BabyAI-PutNextLocalS5N3-v0")
    assert (p.width, p.num_objs) == (5, 3)
    p = mg.parse_env_id("BabyAI-PickupDist-v0")
    assert (p.kind, p.width, p.num_objs, p.strict) == (
        "babyai_pickup", 7, 5, False)
    assert mg.parse_env_id("BabyAI-PickupDistDebug-v0").strict


def test_putnext_structure():
    params = mg.parse_env_id("BabyAI-PutNextLocal-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
        assert len(objs) == 8
        pairs = {(int(g[x, y, 0]), int(g[x, y, 1])) for x, y in objs}
        assert len(pairs) == 8, "objects must be pairwise distinct"
        t = np.asarray(st.target)
        assert (int(t[0]), int(t[1])) in pairs
        assert (int(t[2]), int(t[3])) in pairs
        assert (t[0], t[1]) != (t[2], t[3]), "move and fixed must differ"
        ax, ay = np.asarray(st.agent_pos)
        assert _reachable_oracle(g[..., 0], (int(ax), int(ay)))


def test_putnext_carry_drop_next_to_fixed_succeeds():
    params = mg.parse_env_id("BabyAI-PutNextLocalS6N4-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    (ax, ay) = map(int, np.argwhere(
        (g[..., 0] == t[0]) & (g[..., 1] == t[1]))[0])
    (bx, by) = map(int, np.argwhere(
        (g[..., 0] == t[2]) & (g[..., 1] == t[3]))[0])
    (nx, ny), dirn = _free_neighbor(g[..., 0], ax, ay)
    st, r, term, _ = _step(params, _face(st, (nx, ny), dirn), mg.A_PICKUP)
    assert not term and r == 0.0, "picking the move object must not end it"
    g2 = np.asarray(st.grid)
    for cx, cy in ((bx + 1, by), (bx - 1, by), (bx, by + 1), (bx, by - 1)):
        if g2[cx, cy, 0] != mg.EMPTY:
            continue
        (sx, sy), dirn = _free_neighbor(g2[..., 0], cx, cy)
        st2, r, term, _ = _step(params, _face(st, (sx, sy), dirn), mg.A_DROP)
        assert term and r == pytest.approx(1.0 - 0.9 * 2 / params.max_steps)
        return
    raise AssertionError("no free drop cell adjacent to the fixed object")


def test_putnext_far_drop_and_diagonal_do_not_terminate():
    params = mg.parse_env_id("BabyAI-PutNextLocal-v0")
    st = mg.reset(params, jax.random.PRNGKey(2))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    (ax, ay) = map(int, np.argwhere(
        (g[..., 0] == t[0]) & (g[..., 1] == t[1]))[0])
    (bx, by) = map(int, np.argwhere(
        (g[..., 0] == t[2]) & (g[..., 1] == t[3]))[0])
    (nx, ny), dirn = _free_neighbor(g[..., 0], ax, ay)
    st, r, term, _ = _step(params, _face(st, (nx, ny), dirn), mg.A_PICKUP)
    assert not term
    g2 = np.asarray(st.grid)
    # a drop ≥ 2 away from the fixed object must NOT end the episode
    # (unlike MiniGrid's PutNear, where any drop terminates)
    for x, y in np.argwhere(g2[..., 0] == mg.EMPTY):
        if abs(x - bx) + abs(y - by) <= 2:
            continue
        for dirn, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
            sx, sy = x - dx, y - dy
            if g2[sx, sy, 0] == mg.EMPTY:
                st2, r, term, _ = _step(
                    params, _face(st, (int(sx), int(sy)), dirn), mg.A_DROP)
                assert not term and r == 0.0
                return
    raise AssertionError("no far drop cell found")


def test_putnext_verifies_on_drop_action_even_with_empty_hands():
    """Upstream PutNextInstr checks the ACTION, not the drop's effect:
    if the pair already sits adjacent, any drop action succeeds."""
    params = mg.parse_env_id("BabyAI-PutNextLocal-v0")
    for seed in range(64):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        t = np.asarray(st.target)
        (ax, ay) = map(int, np.argwhere(
            (g[..., 0] == t[0]) & (g[..., 1] == t[1]))[0])
        (bx, by) = map(int, np.argwhere(
            (g[..., 0] == t[2]) & (g[..., 1] == t[3]))[0])
        if abs(ax - bx) + abs(ay - by) != 1:
            continue
        st, r, term, _ = _step(params, st, mg.A_DROP)
        assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)
        # ... and a non-drop action does not trigger the verifier
        st = mg.reset(params, jax.random.PRNGKey(seed))
        st, r, term, _ = _step(params, st, mg.A_LEFT)
        assert not term
        return
    raise AssertionError("no seed with the pair adjacent at reset")


# ---------------------------------------------------------------------------
# PickupDist
# ---------------------------------------------------------------------------


def test_pickupdist_structure_and_wildcards():
    params = mg.parse_env_id("BabyAI-PickupDist-v0")
    wildcards = set()
    for seed in range(24):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        objs = np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
        assert len(objs) == 5
        pairs = {(int(g[x, y, 0]), int(g[x, y, 1])) for x, y in objs}
        assert len(pairs) == 5
        t = np.asarray(st.target)
        wildcards.add((bool(t[0] < 0), bool(t[1] < 0)))
        # a placed object matches the (possibly wildcarded) description
        assert any((t[0] < 0 or g[x, y, 0] == t[0])
                   and (t[1] < 0 or g[x, y, 1] == t[1]) for x, y in objs)
        assert not (t[0] < 0 and t[1] < 0), "at most one wildcard"
    # all three select_by modes appear: type-only, color-only, both
    assert wildcards == {(False, False), (True, False), (False, True)}


def _pickupdist_pickup(env_id, seed, want_match):
    params = mg.parse_env_id(env_id)
    st = mg.reset(params, jax.random.PRNGKey(seed))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    def matches(x, y):
        return ((t[0] < 0 or g[x, y, 0] == t[0])
                and (t[1] < 0 or g[x, y, 1] == t[1]))
    cells = [(x, y) for x, y in np.argwhere(np.isin(g[..., 0], OBJ_TYPES))
             if matches(x, y) == want_match]
    if not cells:
        return None
    (nx, ny), dirn = _free_neighbor(g[..., 0], *map(int, cells[0]))
    return _step(params, _face(st, (nx, ny), dirn), mg.A_PICKUP), params


def test_pickupdist_matching_pickup_rewards():
    out = _pickupdist_pickup("BabyAI-PickupDist-v0", 0, want_match=True)
    (st, r, term, _), params = out
    assert term and r == pytest.approx(1.0 - 0.9 * 1 / params.max_steps)


def test_pickupdist_wrong_pickup_continues_unless_debug():
    for seed in range(6):
        out = _pickupdist_pickup("BabyAI-PickupDist-v0", seed, False)
        if out is None:
            continue
        (st, r, term, _), _ = out
        assert not term and r == 0.0
        out = _pickupdist_pickup("BabyAI-PickupDistDebug-v0", seed, False)
        (st, r, term, _), _ = out
        assert term and r == 0.0, "strict mode fails on a wrong pickup"
        return
    raise AssertionError("no seed with a non-matching object")


# ---------------------------------------------------------------------------
# End-to-end
# ---------------------------------------------------------------------------


def test_autoreset_resamples_target():
    env = JaxVectorEnv("BabyAI-GoToLocalS5N2-v0", 32)
    params = env.params
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    t0 = np.asarray(state.env.target)
    for _ in range(params.max_steps + 1):
        acts = jnp.full((32,), mg.A_RIGHT, jnp.int32)
        state, obs, r, term, trunc, info = env.step_fn(state, acts)
    t1 = np.asarray(state.env.target)
    assert not np.array_equal(t0, t1), "autoreset must resample the mission"


def test_babyai_trains_end_to_end():
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2,
                    update_epochs=2)
    env = JaxVectorEnv("BabyAI-GoToRedBallNoDists-v0", cfg.num_envs)
    tr = Trainer(cfg, env, num_iterations=4)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions,
                               in_channels=3)
    st = tr.init_state(params, seed=0)
    st, packed = tr.run_iterations(st, 1, 4)
    logs = tr.fetch_logs_chunk(packed)
    assert all(np.isfinite(sc["policy_loss"]) for sc, _ in logs)
