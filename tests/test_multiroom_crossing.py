"""MultiRoom + {Simple,Lava}Crossing generation: structure, solvability,
env-id parsing (VERDICT r2 item 5 — the reference trains any registered
MiniGrid id via gym.make, `ppo_minigrid.py:106-119`; these families cover
the classic curriculum beyond the experiment grid).

Upstream minigrid is not installed in this image, so parity is established
structurally: every sampled layout must satisfy the upstream generator's
invariants (room/river counts, door placement, border rules) and be
solvable by construction (BFS over passable cells).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg


def _bfs_reachable(grid: np.ndarray, start, passable) -> np.ndarray:
    """Boolean reachability mask from ``start`` over 4-connected cells
    whose object id is in ``passable``."""
    w, h = grid.shape[:2]
    ok = np.isin(grid[..., 0], list(passable))
    seen = np.zeros((w, h), bool)
    stack = [tuple(start)]
    seen[tuple(start)] = True
    while stack:
        x, y = stack.pop()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = x + dx, y + dy
            if 0 <= nx < w and 0 <= ny < h and ok[nx, ny] and not seen[nx, ny]:
                seen[nx, ny] = True
                stack.append((nx, ny))
    return seen


def _goal_pos(grid: np.ndarray):
    xs, ys = np.nonzero(grid[..., 0] == mg.GOAL)
    assert len(xs) == 1
    return int(xs[0]), int(ys[0])


# ---------------------------------------------------------------------------
# parse_env_id
# ---------------------------------------------------------------------------


def test_parse_multiroom_ids():
    p = mg.parse_env_id("MiniGrid-MultiRoom-N2-S4-v0")
    assert (p.kind, p.width, p.max_steps) == ("multiroom", 25, 40)
    assert (p.min_rooms, p.max_rooms, p.max_room_size) == (2, 2, 4)
    p = mg.parse_env_id("MiniGrid-MultiRoom-N6-v0")
    assert (p.max_rooms, p.max_room_size, p.max_steps) == (6, 10, 120)
    assert not p.see_through_walls


def test_parse_crossing_ids():
    p = mg.parse_env_id("MiniGrid-SimpleCrossingS9N1-v0")
    assert (p.kind, p.width, p.num_crossings, p.obstacle) == ("crossing", 9, 1, mg.WALL)
    assert p.max_steps == 4 * 81
    p = mg.parse_env_id("MiniGrid-LavaCrossingS11N5-v0")
    assert (p.width, p.num_crossings, p.obstacle) == (11, 5, mg.LAVA)


def test_parse_unknown_id_lists_families():
    # (ObstructedMaze-1Dl, then GoToDoor, were this test's unknown
    # examples until those families landed — hence the made-up id.)
    with pytest.raises(ValueError, match="MultiRoom.*Crossing"):
        mg.parse_env_id("MiniGrid-GoToNowhere-5x5-v0")
    with pytest.raises(ValueError, match="unsupported"):
        mg.parse_env_id("CartPole-v1")


# ---------------------------------------------------------------------------
# MultiRoom structure
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id,n_rooms", [
    ("MiniGrid-MultiRoom-N2-S4-v0", 2),
    ("MiniGrid-MultiRoom-N4-S5-v0", 4),
    ("MiniGrid-MultiRoom-N6-v0", 6),
])
def test_multiroom_structure(env_id, n_rooms):
    params = mg.parse_env_id(env_id)
    for seed in range(4):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        # exactly n-1 connecting doors, all closed+unlocked, one goal
        doors = np.argwhere(obj == mg.DOOR)
        assert len(doors) == n_rooms - 1, f"seed {seed}"
        for (x, y) in doors:
            assert g[x, y, 2] == mg.CLOSED
        assert (obj == mg.GOAL).sum() == 1
        # agent stands on an empty cell inside the walls
        ax, ay = np.asarray(st.agent_pos)
        assert obj[ax, ay] == mg.EMPTY
        # solvable: goal reachable through empty cells + (toggleable) doors
        reach = _bfs_reachable(g, (ax, ay), {mg.EMPTY, mg.DOOR, mg.GOAL})
        assert reach[_goal_pos(g)], f"seed {seed}: goal unreachable"
        # the rooms enclose the agent: the outer frame is never reachable
        assert not reach[0, :].any() and not reach[:, 0].any()


def test_multiroom_layouts_vary_and_doors_differ_in_color():
    params = mg.parse_env_id("MiniGrid-MultiRoom-N4-S5-v0")
    grids = [np.asarray(mg.reset(params, jax.random.PRNGKey(s)).grid)
             for s in range(3)]
    assert not np.array_equal(grids[0], grids[1])
    assert not np.array_equal(grids[1], grids[2])
    for g in grids:
        colors = g[g[..., 0] == mg.DOOR, 1]
        # consecutive chain doors can't share a color; with 3 doors total a
        # weaker but layout-checkable invariant: not all identical
        assert len(set(colors.tolist())) >= 2


# ---------------------------------------------------------------------------
# Crossing structure
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id,n,obstacle", [
    ("MiniGrid-SimpleCrossingS9N1-v0", 1, mg.WALL),
    ("MiniGrid-SimpleCrossingS9N3-v0", 3, mg.WALL),
    ("MiniGrid-LavaCrossingS9N2-v0", 2, mg.LAVA),
    ("MiniGrid-LavaCrossingS11N5-v0", 5, mg.LAVA),
])
def test_crossing_structure(env_id, n, obstacle):
    params = mg.parse_env_id(env_id)
    size = params.width
    for seed in range(4):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        # agent fixed at (1,1) facing right; goal at (size-2, size-2)
        assert tuple(np.asarray(st.agent_pos)) == (1, 1)
        assert int(st.agent_dir) == 0
        assert obj[size - 2, size - 2] == mg.GOAL
        # rivers live only on even interior rows/columns; each has exactly
        # one opening (upstream: one crossing per river on the path)
        river_lines = 0
        for c in range(2, size - 2, 2):
            col = obj[c, 1:size - 1]
            row = obj[1:size - 1, c]
            for line in (col, row):
                hits = (line == obstacle).sum()
                if hits == size - 3:
                    # full river minus its single opening
                    river_lines += 1
                else:
                    # otherwise only crossing cells of perpendicular rivers
                    assert hits <= n, f"partial river at {c}"
        assert river_lines == n
        # solvable WITHOUT touching obstacles (lava is lethal)
        reach = _bfs_reachable(g, (1, 1), {mg.EMPTY, mg.GOAL})
        assert reach[size - 2, size - 2], f"seed {seed}: goal unreachable"


def test_lava_crossing_step_semantics():
    """Walking into lava terminates with zero reward (upstream CrossingEnv
    inherits MiniGridEnv lava semantics; our step already handles LAVA)."""
    params = mg.parse_env_id("MiniGrid-LavaCrossingS9N1-v0")
    st = mg.reset(params, jax.random.PRNGKey(1))
    g = np.asarray(st.grid)
    # find a lava cell adjacent to an empty cell and walk into it
    lx, ly = np.argwhere(g[..., 0] == mg.LAVA)[0]
    # place the agent next to it facing the lava (direct state surgery)
    import dataclasses
    if g[lx - 1, ly, 0] == mg.EMPTY:
        pos, dirn = (lx - 1, ly), 0  # facing +x
    else:
        assert g[lx, ly - 1, 0] == mg.EMPTY
        pos, dirn = (lx, ly - 1), 1  # facing +y
    st = dataclasses.replace(
        st, agent_pos=jnp.asarray(pos, jnp.int32), agent_dir=jnp.int32(dirn)
    )
    st2, reward, terminated, truncated = mg.step(params, st, jnp.int32(mg.A_FORWARD))
    assert bool(terminated) and float(reward) == 0.0


# ---------------------------------------------------------------------------
# End-to-end: the families train through the standard Trainer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id", [
    "MiniGrid-MultiRoom-N2-S4-v0",
    "MiniGrid-SimpleCrossingS9N1-v0",
])
def test_new_families_train_end_to_end(env_id):
    """Both families run through the jitted Trainer: the in-graph autoreset
    regenerates fresh layouts (MultiRoom's rejection loop compiles into
    the rollout scan), episodes terminate, update scalars stay finite.

    Learning-curve evidence lives in docs/PERFORMANCE.md hardware runs —
    on this single-CPU CI box an iteration costs ~5-11 s, so return
    improvement is out of test budget (calibrated r3: 40 iterations of
    SimpleCrossingS9N1 = 460 s with no reliable signal yet).
    """
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    cfg = PPOConfig(num_envs=4, num_steps=16, num_minibatches=2, update_epochs=2)
    env = JaxVectorEnv(env_id, cfg.num_envs)
    tr = Trainer(cfg, env, num_iterations=4)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions, in_channels=3)
    st = tr.init_state(params, seed=0)
    st, packed = tr.run_iterations(st, 1, 4)
    logs = tr.fetch_logs_chunk(packed)
    assert all(np.isfinite(sc["policy_loss"]) for sc, _ in logs)
    if "MultiRoom" in env_id:
        # max_steps=40 → truncations must fire within the 64 steps
        dones = sum(int(stats["done_mask"].sum()) for _, stats in logs)
        assert dones > 0
