"""Native C BPE merge loop: exact parity with the Python implementation."""

import numpy as np
import pytest

from clip_ppo_tpu import native
from clip_ppo_tpu.models.clip.tokenizer import BPETokenizer

TINY_MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "t</w>"),
    ("e", "n"),
    ("en", "t</w>"),
    ("a", "g"),
    ("ag", "ent</w>"),
    ("i", "n"),
    ("in", "g</w>"),
    ("r", "e"),
    ("re", "a"),
    ("o", "n</w>"),
]

needs_native = pytest.mark.skipif(
    not native.available(), reason="gcc toolchain unavailable"
)


@needs_native
def test_native_builds():
    assert native.get_lib() is not None


@needs_native
@pytest.mark.parametrize(
    "text",
    [
        "the agent at the gate",
        "agent at (1,1) facing right, objects: wall at (0,0)",
        "Breakout score 42, ball (80,120), paddle (72), lives 5, ball hitting bricks",
        "Pong score 3-2, ball (100,90), player paddle (88), computer paddle (92)",
        "a",
        "reaction on entering",
        "",
        "ünïcode & symbols !!! 123",
    ],
)
def test_native_matches_python(text):
    py = BPETokenizer(TINY_MERGES, use_native=False)
    nat = BPETokenizer(TINY_MERGES, use_native=True)
    assert nat._native is not None
    assert py.encode(text) == nat.encode(text)
    np.testing.assert_array_equal(py.tokenize(text), nat.tokenize(text))


@needs_native
def test_native_fuzz():
    rng = np.random.RandomState(0)
    py = BPETokenizer(TINY_MERGES, use_native=False)
    nat = BPETokenizer(TINY_MERGES, use_native=True)
    alphabet = list("theagentringo ().,0123456789")
    for _ in range(200):
        n = rng.randint(1, 60)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert py.encode(text) == nat.encode(text), repr(text)


@needs_native
def test_row_cache_consistency():
    nat = BPETokenizer(TINY_MERGES)
    a = nat.tokenize("the agent at the gate")
    b = nat.tokenize("the agent at the gate")  # cached row
    np.testing.assert_array_equal(a, b)


@needs_native
def test_batch_entry_point():
    nat = BPETokenizer(TINY_MERGES)
    words = [nat._word_syms(w) for w in ("the", "agent", "x")]
    out = native.bpe_encode_batch(words, nat._keys, nat._ranks, nat._new_ids)
    assert [list(o) for o in out] == [
        [nat.encoder["the</w>"]],
        [nat.encoder["agent</w>"]],
        [nat.encoder["x</w>"]],
    ]
