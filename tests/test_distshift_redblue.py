"""DistShift + RedBlueDoors families: layout, step semantics, env-id
parsing (the reference trains any registered MiniGrid id via gym.make,
`ppo_minigrid.py:106-119`; these extend the supported curriculum grid).

Upstream minigrid is not installed in this image, so parity is
established structurally against the upstream generators
(minigrid/envs/distshift.py, redbluedoors.py): DistShift layouts are
deterministic and asserted cell-exactly; RedBlueDoors layouts must
satisfy the generator's invariants and the ordered-door success rule is
driven by scripted episodes.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg


# ---------------------------------------------------------------------------
# parse_env_id
# ---------------------------------------------------------------------------


def test_parse_distshift_ids():
    p = mg.parse_env_id("MiniGrid-DistShift1-v0")
    assert (p.kind, p.width, p.height, p.strip_row) == ("distshift", 9, 7, 2)
    assert p.max_steps == 4 * 81 and p.see_through_walls
    p = mg.parse_env_id("MiniGrid-DistShift2-v0")
    assert p.strip_row == 5


def test_parse_redbluedoors_ids():
    p = mg.parse_env_id("MiniGrid-RedBlueDoors-6x6-v0")
    assert (p.kind, p.width, p.height) == ("redblue", 12, 6)
    assert p.max_steps == 20 * 36 and p.success == "red_then_blue"
    p = mg.parse_env_id("MiniGrid-RedBlueDoors-8x8-v0")
    assert (p.width, p.height, p.max_steps) == (16, 8, 20 * 64)


def test_unknown_id_error_names_new_families():
    with pytest.raises(ValueError, match="DistShift.*RedBlueDoors"):
        mg.parse_env_id("MiniGrid-GoToSeq-5x5-v0")


# ---------------------------------------------------------------------------
# DistShift: deterministic golden layout + semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id,row", [
    ("MiniGrid-DistShift1-v0", 2),
    ("MiniGrid-DistShift2-v0", 5),
])
def test_distshift_golden_layout(env_id, row):
    params = mg.parse_env_id(env_id)
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    obj = g[..., 0]
    # border walls only, goal at (width-2, 1), lava strip x∈[3,5] in `row`
    assert obj[7, 1] == mg.GOAL and (obj == mg.GOAL).sum() == 1
    lava = np.argwhere(obj == mg.LAVA)
    assert sorted(map(tuple, lava)) == [(3, row), (4, row), (5, row)]
    interior = obj[1:-1, 1:-1]
    assert ((interior == mg.EMPTY) | (interior == mg.GOAL)
            | (interior == mg.LAVA)).all()
    # deterministic start: (1,1) facing right; layout identical across seeds
    assert tuple(np.asarray(st.agent_pos)) == (1, 1) and int(st.agent_dir) == 0
    st2 = mg.reset(params, jax.random.PRNGKey(7))
    assert np.array_equal(g, np.asarray(st2.grid))


def test_distshift_goal_path():
    """Six forwards along the top row reach the goal with the time-scaled
    reward (the lava strip never blocks row 1)."""
    for env_id in ("MiniGrid-DistShift1-v0", "MiniGrid-DistShift2-v0"):
        params = mg.parse_env_id(env_id)
        st = mg.reset(params, jax.random.PRNGKey(0))
        for i in range(6):
            st, reward, terminated, truncated = mg.step(
                params, st, jnp.int32(mg.A_FORWARD))
        assert bool(terminated) and not bool(truncated)
        assert float(reward) == pytest.approx(1.0 - 0.9 * 6 / params.max_steps)


def test_distshift_lava_is_lethal():
    params = mg.parse_env_id("MiniGrid-DistShift1-v0")
    st = mg.reset(params, jax.random.PRNGKey(0))
    st = dataclasses.replace(
        st, agent_pos=jnp.asarray([4, 1], jnp.int32), agent_dir=jnp.int32(1))
    st, reward, terminated, _ = mg.step(params, st, jnp.int32(mg.A_FORWARD))
    assert bool(terminated) and float(reward) == 0.0


# ---------------------------------------------------------------------------
# RedBlueDoors: structure + ordered-door semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id,size", [
    ("MiniGrid-RedBlueDoors-6x6-v0", 6),
    ("MiniGrid-RedBlueDoors-8x8-v0", 8),
])
def test_redbluedoors_structure(env_id, size):
    params = mg.parse_env_id(env_id)
    lx, rx = size // 2, size // 2 + size - 1
    for seed in range(4):
        st = mg.reset(params, jax.random.PRNGKey(seed))
        g = np.asarray(st.grid)
        obj = g[..., 0]
        doors = np.argwhere(obj == mg.DOOR)
        assert len(doors) == 2, f"seed {seed}"
        by_x = {int(x): (int(x), int(y)) for x, y in doors}
        assert set(by_x) == {lx, rx}, f"doors off the room walls, seed {seed}"
        red, blue = by_x[lx], by_x[rx]
        assert g[red][1] == mg.RED and g[blue][1] == mg.BLUE
        assert g[red][2] == mg.CLOSED and g[blue][2] == mg.CLOSED
        # room walls are solid apart from the doors
        for x, (dx, dy) in ((lx, red), (rx, blue)):
            col = obj[x, :]
            assert ((col == mg.WALL) | (np.arange(size) == dy)).all()
        # agent inside the room on a free cell
        ax, ay = np.asarray(st.agent_pos)
        assert lx < ax < rx and 1 <= ay <= size - 2
        assert obj[ax, ay] == mg.EMPTY


def test_redbluedoors_layouts_vary():
    params = mg.parse_env_id("MiniGrid-RedBlueDoors-6x6-v0")
    obs = [np.asarray(mg.reset(params, jax.random.PRNGKey(s)).grid)
           for s in range(4)]
    assert any(not np.array_equal(obs[0], o) for o in obs[1:])


def _face(st, pos, dirn):
    return dataclasses.replace(
        st, agent_pos=jnp.asarray(pos, jnp.int32), agent_dir=jnp.int32(dirn))


def _door_pos(grid, color):
    (p,) = np.argwhere((grid[..., 0] == mg.DOOR) & (grid[..., 1] == color))
    return tuple(int(v) for v in p)


def test_redbluedoors_red_then_blue_succeeds():
    params = mg.parse_env_id("MiniGrid-RedBlueDoors-6x6-v0")
    st = mg.reset(params, jax.random.PRNGKey(3))
    g = np.asarray(st.grid)
    (rx, ry), (bx, by) = _door_pos(g, mg.RED), _door_pos(g, mg.BLUE)
    # open red from inside the room (agent east of it, facing left)
    st = _face(st, (rx + 1, ry), 2)
    st, reward, terminated, _ = mg.step(params, st, jnp.int32(mg.A_TOGGLE))
    assert not bool(terminated) and float(reward) == 0.0
    assert np.asarray(st.grid)[rx, ry, 2] == mg.OPEN
    # then open blue (agent west of it, facing right) → terminal reward
    st = _face(st, (bx - 1, by), 0)
    st, reward, terminated, _ = mg.step(params, st, jnp.int32(mg.A_TOGGLE))
    assert bool(terminated)
    assert float(reward) == pytest.approx(1.0 - 0.9 * 2 / params.max_steps)


def test_redbluedoors_blue_first_fails():
    params = mg.parse_env_id("MiniGrid-RedBlueDoors-6x6-v0")
    st = mg.reset(params, jax.random.PRNGKey(3))
    (bx, by) = _door_pos(np.asarray(st.grid), mg.BLUE)
    st = _face(st, (bx - 1, by), 0)
    st, reward, terminated, _ = mg.step(params, st, jnp.int32(mg.A_TOGGLE))
    assert bool(terminated) and float(reward) == 0.0


def test_redbluedoors_closing_red_forfeits():
    """Red opened then closed again before blue → opening blue terminates
    with 0 (upstream tracks is_open live, not a latch)."""
    params = mg.parse_env_id("MiniGrid-RedBlueDoors-6x6-v0")
    st = mg.reset(params, jax.random.PRNGKey(3))
    g = np.asarray(st.grid)
    (rx, ry), (bx, by) = _door_pos(g, mg.RED), _door_pos(g, mg.BLUE)
    st = _face(st, (rx + 1, ry), 2)
    st, _, _, _ = mg.step(params, st, jnp.int32(mg.A_TOGGLE))   # open red
    st, _, term, _ = mg.step(params, st, jnp.int32(mg.A_TOGGLE))  # close red
    assert not bool(term)
    st = _face(st, (bx - 1, by), 0)
    st, reward, terminated, _ = mg.step(params, st, jnp.int32(mg.A_TOGGLE))
    assert bool(terminated) and float(reward) == 0.0


# ---------------------------------------------------------------------------
# End-to-end: both families run through the standard Trainer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id", [
    "MiniGrid-DistShift1-v0",
    "MiniGrid-RedBlueDoors-6x6-v0",
])
def test_new_families_train_end_to_end(env_id):
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
