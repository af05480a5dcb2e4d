"""BabyAI unlock tier: Unlock, UnlockLocal[Dist], KeyInBox,
UnlockPickup[Dist], BlockedUnlockPickup, UnlockToUnlock, GoToImpUnlock
(upstream minigrid/envs/babyai/unlock.py — reconstructed; the package is
not installed in this image, so parity is structural invariants over
seeds plus scripted terminal-rule episodes).
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


def _carry(st, t, c):
    return dataclasses.replace(
        st, carrying=jnp.asarray([t, c, 0], jnp.int8))


def _locked_doors(grid):
    g = np.asarray(grid)
    return [(int(x), int(y)) for x, y in
            np.argwhere((g[..., 0] == mg.DOOR) & (g[..., 2] == mg.LOCKED))]


def _room_of(x, y, pitch=7):
    return (x // pitch, y // pitch)


def _toggle_at(params, st, dx, dy):
    g = np.asarray(st.grid)
    for (ax, ay), dirn in [((dx - 1, dy), 0), ((dx + 1, dy), 2),
                           ((dx, dy - 1), 1), ((dx, dy + 1), 3)]:
        if (0 < ax < params.width - 1 and 0 < ay < params.height - 1
                and g[ax, ay, 0] == mg.EMPTY):
            return _step(params, _face(st, (ax, ay), dirn), mg.A_TOGGLE)
    raise AssertionError("no free cell beside the door")


def test_unlock_structure_and_solve():
    params = mg.parse_env_id("BabyAI-Unlock-v0")
    assert params.locked_room and params.num_objs == 18
    for seed in range(6):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        locked = _locked_doors(st.grid)
        assert len(locked) == 1
        (dx, dy) = locked[0]
        lcolor = int(g[dx, dy, 1])
        t = np.asarray(st.target)
        assert (t[0], t[1]) == (mg.DOOR, lcolor)
        # the matching key exists somewhere
        keys = np.argwhere((g[..., 0] == mg.KEY) & (g[..., 1] == lcolor))
        assert len(keys) >= 1
        # agent is not inside the locked room (the locked door is on its
        # wall; at least assert the agent is somewhere valid)
        ax, ay = map(int, np.asarray(st.agent_pos))
        assert g[ax, ay, 0] == mg.EMPTY
    # scripted: with the key in hand, toggling the locked door open wins
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    (dx, dy) = _locked_doors(st.grid)[0]
    st = _carry(st, mg.KEY, int(g[dx, dy, 1]))
    st2, r, term, _ = _toggle_at(params, st, dx, dy)
    assert term and r > 0
    # toggling a connect_all door (unlocked, wrong color allowed to be
    # same only when the uniqueness branch was off) never unlocks by
    # itself without the key — covered by the wrong-key case:
    st = mg.reset(params, jax.random.PRNGKey(0))
    wrong = (int(g[dx, dy, 1]) + 1) % 6
    st = _carry(st, mg.KEY, wrong)
    st2, r, term, _ = _toggle_at(params, st, dx, dy)
    assert not term and r == 0.0
    assert np.asarray(st2.grid)[dx, dy, 2] == mg.LOCKED


def test_unlocklocal_and_keyinbox():
    for env_id, in_box, n_dists in [
        ("BabyAI-UnlockLocal-v0", False, 0),
        ("BabyAI-UnlockLocalDist-v0", False, 3),
        ("BabyAI-KeyInBox-v0", True, 0),
    ]:
        params = mg.parse_env_id(env_id)
        st = mg.reset(params, jax.random.PRNGKey(2))
        g = np.asarray(st.grid)
        locked = _locked_doors(st.grid)
        assert len(locked) == 1, env_id
        (dx, dy) = locked[0]
        lcolor = int(g[dx, dy, 1])
        # door on the center room's wall
        assert dx in (7, 14) or dy in (7, 14)
        if in_box:
            boxes = np.argwhere((g[..., 0] == mg.BOX) & (g[..., 2] > 0))
            assert len(boxes) == 1
            bx, by = boxes[0]
            assert int(g[bx, by, 2]) == lcolor + 1, "box hides the key"
        else:
            keys = np.argwhere((g[..., 0] == mg.KEY) & (g[..., 1] == lcolor))
            assert len(keys) == 1
            kx, ky = keys[0]
            assert 7 < kx < 14 and 7 < ky < 14, "key inside the room"
        t = np.asarray(st.target)
        assert t[0] == mg.DOOR and t[1] == -1, "type-only OpenInstr"
        # scripted: key in hand -> toggle -> success (color wildcard)
        st = _carry(st, mg.KEY, lcolor)
        st2, r, term, _ = _toggle_at(params, st, dx, dy)
        assert term and r > 0, env_id


def test_keyinbox_box_reveals_key():
    params = mg.parse_env_id("BabyAI-KeyInBox-v0")
    st = mg.reset(params, jax.random.PRNGKey(1))
    g = np.asarray(st.grid)
    (bx, by) = np.argwhere((g[..., 0] == mg.BOX) & (g[..., 2] > 0))[0]
    lcolor = int(g[bx, by, 2]) - 1
    st2, r, term, _ = _toggle_at(params, st, int(bx), int(by))
    assert not term
    g2 = np.asarray(st2.grid)
    assert g2[bx, by, 0] == mg.KEY and g2[bx, by, 1] == lcolor


def test_unlockpickupdist_color_matters():
    params = mg.parse_env_id("BabyAI-UnlockPickupDist-v0")
    assert params.success == "babyai_pickup" and params.num_objs == 4
    st = mg.reset(params, jax.random.PRNGKey(4))
    g = np.asarray(st.grid)
    t = np.asarray(st.target)
    assert t[0] == mg.BOX
    # all objects distinct by (type, color)
    mask = np.isin(g[..., 0], (mg.KEY, mg.BALL, mg.BOX))
    pairs = [(int(g[x, y, 0]), int(g[x, y, 1])) for x, y in np.argwhere(mask)]
    assert len(pairs) == len(set(pairs)) == 6  # key + box + 4 distractors
    # picking the mission box succeeds; a distractor box would not match
    boxes = [(x, y) for x, y in np.argwhere(
        (g[..., 0] == mg.BOX) & (g[..., 1] == t[1]))]
    (bx, by) = boxes[0]
    found = False
    for (ax, ay), dirn in [((bx - 1, by), 0), ((bx + 1, by), 2),
                           ((bx, by - 1), 1), ((bx, by + 1), 3)]:
        if (0 < ax < params.width - 1 and 0 < ay < params.height - 1
                and g[ax, ay, 0] == mg.EMPTY):
            st2, r, term, _ = _step(
                params, _face(st, (ax, ay), dirn), mg.A_PICKUP)
            assert term and r > 0
            found = True
            break
    assert found
    wrong = [(x, y) for x, y in np.argwhere(
        (g[..., 0] == mg.BOX) & (g[..., 1] != t[1]))]
    for (wx, wy) in wrong:
        for (ax, ay), dirn in [((wx - 1, wy), 0), ((wx + 1, wy), 2),
                               ((wx, wy - 1), 1), ((wx, wy + 1), 3)]:
            if (0 < ax < params.width - 1 and 0 < ay < params.height - 1
                    and g[ax, ay, 0] == mg.EMPTY):
                st2, r, term, _ = _step(
                    params, _face(st, (ax, ay), dirn), mg.A_PICKUP)
                assert not term and r == 0.0
                return


def test_unlocktounlock_structure_and_final_rule():
    params = mg.parse_env_id("BabyAI-UnlockToUnlock-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    locked = sorted(_locked_doors(st.grid))
    assert [d[0] for d in locked] == [5, 10]
    cA = int(g[locked[0][0], locked[0][1], 1])  # left<->middle door
    cB = int(g[locked[1][0], locked[1][1], 1])
    assert cA != cB
    # key A in the RIGHT room, key B in the MIDDLE
    keys = {(int(g[x, y, 1])): int(x)
            for x, y in np.argwhere(g[..., 0] == mg.KEY)}
    assert keys[cA] > 10 and 5 < keys[cB] < 10
    # ball in the LEFT room; mission is the type-only pickup
    balls = np.argwhere(g[..., 0] == mg.BALL)
    assert len(balls) == 1 and balls[0][0] < 5
    t = np.asarray(st.target)
    assert t[0] == mg.BALL and t[1] == -1
    ax, ay = map(int, np.asarray(st.agent_pos))
    assert 5 < ax < 10, "agent starts in the middle"
    # final rule: picking the ball up succeeds
    (bx, by) = balls[0]
    st2 = _face(st, (int(bx), int(by) + 1), 3)
    st2, r, term, _ = _step(params, st2, mg.A_PICKUP)
    assert term and r > 0


def test_gotoimpunlock_target_in_locked_room():
    params = mg.parse_env_id("BabyAI-GoToImpUnlock-v0")
    assert params.target_in_locked and params.dists_per_room
    st = mg.reset(params, jax.random.PRNGKey(1))
    g = np.asarray(st.grid)
    (dx, dy) = _locked_doors(st.grid)[0]
    t = np.asarray(st.target)
    # at least one object matching the mission desc sits in some room;
    # the generator placed one inside the locked room — find the locked
    # room from the door's wall and the key's side
    matches = np.argwhere((g[..., 0] == t[0]) & (g[..., 1] == t[1]))
    assert len(matches) >= 1
    # facing a matching object terminates with reward (GoToInstr)
    (mx, my) = matches[0]
    for (ax, ay), dirn in [((mx - 1, my), 0), ((mx + 1, my), 2),
                           ((mx, my - 1), 1), ((mx, my + 1), 3)]:
        if (0 < ax < params.width - 1 and 0 < ay < params.height - 1
                and g[ax, ay, 0] == mg.EMPTY):
            st2, r, term, _ = _step(params, _face(st, (ax, ay), dirn),
                                    mg.A_DONE)
            assert term and r > 0
            return
    pytest.skip("matching object fully enclosed in this layout")


def test_unlock_tier_ids_parse_and_reset():
    for env_id in [
        "BabyAI-Unlock-v0", "BabyAI-UnlockLocal-v0",
        "BabyAI-UnlockLocalDist-v0", "BabyAI-KeyInBox-v0",
        "BabyAI-UnlockPickup-v0", "BabyAI-UnlockPickupDist-v0",
        "BabyAI-BlockedUnlockPickup-v0", "BabyAI-UnlockToUnlock-v0",
        "BabyAI-GoToImpUnlock-v0",
    ]:
        params = mg.parse_env_id(env_id)
        st = mg.reset(params, jax.random.PRNGKey(0))
        assert np.asarray(st.grid).shape == (params.width, params.height, 3)
        assert len(_locked_doors(st.grid)) >= 1
