"""Property-based invariants (hypothesis) for envs and the tokenizer."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.minigrid import core as mg
from clip_ppo_tpu.envs.atari import core as at
from clip_ppo_tpu.models.clip.tokenizer import BPETokenizer

SETTINGS = dict(max_examples=20, deadline=None)

_PARAMS = mg.parse_env_id("MiniGrid-DoorKey-6x6-v0")
_STEP = jax.jit(mg.step, static_argnames=("params",))
_RESET = jax.jit(mg.reset, static_argnames=("params",))


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    actions=st.lists(st.integers(0, mg.NUM_ACTIONS - 1), min_size=1, max_size=40),
)
def test_minigrid_invariants(seed, actions):
    """For any action sequence: the agent stays in bounds, the border
    stays wall, exactly one key+door exist (held or on grid), reward only
    on termination, and step_count increments by one."""
    s = _RESET(_PARAMS, jax.random.PRNGKey(seed))
    prev_count = 0
    for a in actions:
        s, r, term, trunc = _STEP(_PARAMS, s, jnp.int32(a))
        x, y = np.asarray(s.agent_pos)
        assert 0 < x < _PARAMS.width - 1 and 0 < y < _PARAMS.height - 1
        g = np.asarray(s.grid)
        assert (g[0, :, 0] == mg.WALL).all() and (g[-1, :, 0] == mg.WALL).all()
        assert (g[:, 0, 0] == mg.WALL).all() and (g[:, -1, 0] == mg.WALL).all()
        keys_on_grid = int((g[..., 0] == mg.KEY).sum())
        carrying_key = int(np.asarray(s.carrying)[0]) == mg.KEY
        assert keys_on_grid + int(carrying_key) == 1
        assert int((g[..., 0] == mg.DOOR).sum()) == 1
        if float(r) != 0.0:
            assert bool(term)
        assert int(s.step_count) == prev_count + 1
        prev_count = int(s.step_count)
        if bool(term) or bool(trunc):
            break


_FUZZ_IDS = (
    "MiniGrid-LockedRoom-v0",
    "MiniGrid-MemoryS13-v0",
    "MiniGrid-ObstructedMaze-Full-v0",
    "MiniGrid-Playground-v0",
    "MiniGrid-PutNear-6x6-N2-v0",
    "MiniGrid-KeyCorridorS3R2-v0",
    "BabyAI-GoToObjMazeS4R2-v0",
)


@pytest.mark.parametrize("env_id", _FUZZ_IDS)
@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    actions=st.lists(st.integers(0, mg.NUM_ACTIONS - 1), min_size=1,
                     max_size=40),
)
def test_family_invariants(env_id, seed, actions):
    """Family-generic invariants under arbitrary action sequences: agent
    in bounds, border stays wall, step_count increments, reward ∈ [0, 1]
    and only on termination."""
    params = mg.parse_env_id(env_id)
    s = _RESET(params, jax.random.PRNGKey(seed))
    prev_count = 0
    for a in actions:
        s, r, term, trunc = _STEP(params, s, jnp.int32(a))
        x, y = np.asarray(s.agent_pos)
        assert 0 < x < params.width - 1 and 0 < y < params.height - 1
        g = np.asarray(s.grid)
        assert (g[0, :, 0] == mg.WALL).all() and (g[-1, :, 0] == mg.WALL).all()
        assert (g[:, 0, 0] == mg.WALL).all() and (g[:, -1, 0] == mg.WALL).all()
        assert 0.0 <= float(r) <= 1.0
        if float(r) != 0.0:
            assert bool(term)
        assert int(s.step_count) == prev_count + 1
        prev_count = int(s.step_count)
        if bool(term) or bool(trunc):
            break


_BK_STEP = jax.jit(at.breakout_step)
_BK_RESET = jax.jit(at.breakout_reset)


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    actions=st.lists(st.integers(0, 3), min_size=1, max_size=60),
)
def test_breakout_invariants(seed, actions):
    """Paddle/ball stay in the playfield; lives never increase; score is
    non-decreasing; reward matches the score delta."""
    s = _BK_RESET(jax.random.PRNGKey(seed))
    lives, score = int(s.lives), int(s.score)
    for a in actions:
        s, r, done, game_over = _BK_STEP(s, jnp.int32(a))
        assert at.BK_SIDE <= float(s.paddle_x) <= at.SCREEN_W - at.BK_SIDE - at.BK_PADDLE_W
        assert int(s.lives) <= lives
        assert int(s.score) >= score
        assert int(s.score) - score == int(float(r))
        lives, score = int(s.lives), int(s.score)
        if bool(game_over):
            break


TINY_MERGES = [("t", "h"), ("th", "e</w>"), ("a", "t</w>"), ("i", "n"),
               ("in", "g</w>"), ("r", "e")]


@settings(**SETTINGS)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]),
               max_size=60))
def test_tokenizer_roundtrip(text):
    """decode(encode(x)) recovers the cleaned, lowercased text (modulo the
    word-boundary spaces BPE introduces)."""
    tok = BPETokenizer(TINY_MERGES, use_native=False)
    ids = tok.encode(text)
    out = tok.decode(ids)
    import html
    import re

    cleaned = re.sub(r"\s+", " ", html.unescape(html.unescape(text))).strip().lower()
    # BPE reconstruction joins tokens with the </w> markers as spaces.
    assert out.replace(" ", "") == cleaned.replace(" ", "")


@settings(**SETTINGS)
@given(st.lists(st.text(alphabet="abcdefgh (),0123456789", min_size=0, max_size=50),
                min_size=1, max_size=8))
def test_tokenize_shape_contract(texts):
    tok = BPETokenizer(TINY_MERGES, use_native=False)
    out = tok.tokenize(texts)
    assert out.shape == (len(texts), 77) and out.dtype == np.int32
    assert (out[:, 0] == tok.sot_token).all()
    for row in out:
        eots = np.nonzero(row == tok.eot_token)[0]
        assert len(eots) >= 1
        assert not row[eots[-1] + 1 :].any()  # zero padding after EOT
