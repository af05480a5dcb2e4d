"""BabyAI LevelGen tier: GoToSeq[S5R2], Synth[S5R2], SynthLoc, SynthSeq,
MiniBossLevel, BossLevel[NoUnlock] (upstream
minigrid/envs/babyai/core/levelgen.py + synth.py — reconstructed).

Generator invariants over seeds (instruction validity, locked-room
machinery, grammar mix) plus a scripted solve of a single-goto episode;
the composition semantics themselves are pinned by test_babyai_seq.py.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.minigrid import core as mg

LEVELGEN_IDS = [
    "BabyAI-GoToSeq-v0", "BabyAI-GoToSeqS5R2-v0",
    "BabyAI-Synth-v0", "BabyAI-SynthS5R2-v0",
    "BabyAI-SynthLoc-v0", "BabyAI-SynthSeq-v0",
    "BabyAI-MiniBossLevel-v0", "BabyAI-BossLevel-v0",
    "BabyAI-BossLevelNoUnlock-v0",
]


def _desc_matches(params, st, row):
    """Number of grid cells matching a slot's descriptor."""
    g = np.asarray(st.grid)
    if row[5] & 1:  # positional
        return sum(1 for v in row[6:12] if v > 0)
    t, c = int(row[1]), int(row[2])
    m = (g[..., 0] == t) if t >= 0 else np.isin(
        g[..., 0], (mg.KEY, mg.BALL, mg.BOX, mg.DOOR))
    if c >= 0:
        m = m & (g[..., 1] == c)
    return int(m.sum())


@pytest.mark.parametrize("env_id", LEVELGEN_IDS)
def test_instructions_are_satisfiable(env_id):
    params = mg.parse_env_id(env_id)
    assert params.success == "babyai_seq"
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        instr = np.asarray(st.instr)
        comp = int(np.asarray(st.target)[0])
        used = [0] + ([1] if comp == 1 else []) + (
            [2] if comp >= 2 else [])
        used += [1] if comp >= 2 and instr[1][0] else []
        used += [3] if comp >= 2 and instr[3][0] else []
        for i in set(used):
            row = instr[i]
            assert row[0] in (1, 2, 3, 4), (env_id, seed, i, row)
            assert _desc_matches(params, st, row) >= 1, (env_id, seed, i)
            if row[0] == 4:  # putnext second desc
                g = np.asarray(st.grid)
                t2, c2 = int(row[3]), int(row[4])
                m = np.isin(g[..., 0], (mg.KEY, mg.BALL, mg.BOX))
                m = m & (g[..., 0] == t2) if t2 >= 0 else m
                if c2 >= 0:
                    m = m & (g[..., 1] == c2)
                assert m.sum() >= 1, (env_id, seed, i)
        # unused slots are zeroed
        for i in range(4):
            if i not in used:
                assert instr[i][0] == 0


def test_gotoseq_is_goto_only_no_locks():
    params = mg.parse_env_id("BabyAI-GoToSeq-v0")
    comps = set()
    for seed in range(10):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        assert not ((g[..., 0] == mg.DOOR) & (g[..., 2] == mg.LOCKED)).any()
        instr = np.asarray(st.instr)
        for row in instr:
            assert row[0] in (0, 1), "goto-only grammar"
        comps.add(int(np.asarray(st.target)[0]))
    assert len(comps) > 1, "grammar mixes action/and/seq"


def test_bosslevel_locked_room_machinery():
    params = mg.parse_env_id("BabyAI-BossLevel-v0")
    locked_seen = unlocked_seen = 0
    for seed in range(12):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        locked = np.argwhere((g[..., 0] == mg.DOOR) & (g[..., 2] == mg.LOCKED))
        if len(locked) == 0:
            unlocked_seen += 1
            continue
        locked_seen += 1
        assert len(locked) == 1
        (dx, dy) = locked[0]
        lcolor = int(g[dx, dy, 1])
        keys = np.argwhere((g[..., 0] == mg.KEY) & (g[..., 1] == lcolor))
        assert len(keys) >= 1, "matching key exists (add_locked_room)"
    assert locked_seen and unlocked_seen, "locked_room_prob=0.5 mixes"
    # NoUnlock: never a locked door
    params = mg.parse_env_id("BabyAI-BossLevelNoUnlock-v0")
    for seed in range(8):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        assert not ((g[..., 0] == mg.DOOR) & (g[..., 2] == mg.LOCKED)).any()


def test_synthloc_positional_slots_valid():
    params = mg.parse_env_id("BabyAI-SynthLoc-v0")
    saw = 0
    for seed in range(24):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        instr = np.asarray(st.instr)
        g = np.asarray(st.grid)
        for row in instr:
            if row[0] and (row[5] & 1):
                saw += 1
                for v in row[6:12]:
                    if v > 0:
                        x, y = (int(v) - 1) // params.height, (
                            int(v) - 1) % params.height
                        assert g[x, y, 0] in (
                            mg.KEY, mg.BALL, mg.BOX, mg.DOOR)
    assert saw >= 2, "location descriptors appear"


def test_scripted_single_goto_solve():
    params = mg.parse_env_id("BabyAI-GoToSeq-v0")
    for seed in range(32):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        instr = np.asarray(st.instr)
        comp = int(np.asarray(st.target)[0])
        if comp != 0:
            continue
        t, c = int(instr[0][1]), int(instr[0][2])
        g = np.asarray(st.grid)
        m = (g[..., 0] == t)
        if c >= 0:
            m = m & (g[..., 1] == c)
        for (mx, my) in np.argwhere(m):
            for (ax, ay), dirn in [((mx - 1, my), 0), ((mx + 1, my), 2),
                                   ((mx, my - 1), 1), ((mx, my + 1), 3)]:
                if (0 < ax < params.width - 1
                        and 0 < ay < params.height - 1
                        and g[ax, ay, 0] == mg.EMPTY):
                    st2 = dataclasses.replace(
                        st, agent_pos=jnp.asarray((ax, ay), jnp.int32),
                        agent_dir=jnp.int32(dirn))
                    st2, r, term, _ = mg.step(params, st2, jnp.int32(6))
                    assert bool(term) and float(r) > 0
                    return
    pytest.skip("no single-goto episode with an approachable target")
