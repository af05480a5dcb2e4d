"""Merge-table file loading + tokenizer selection (gated vocab path)."""

import gzip

import numpy as np

from clip_ppo_tpu.models.clip import tokenizer as T


def _write_vocab(path, merges):
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("bpe_simple_vocab_16e6.txt#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def test_load_merges_roundtrip(tmp_path):
    merges = [("t", "h"), ("th", "e</w>"), ("a", "t</w>")]
    p = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    _write_vocab(p, merges)
    loaded = T.load_merges(str(p))
    assert loaded == merges


def test_env_var_selects_bpe(tmp_path, monkeypatch):
    merges = [("t", "h"), ("th", "e</w>")]
    p = tmp_path / "vocab.txt.gz"
    _write_vocab(p, merges)
    monkeypatch.setenv("CLIP_PPO_BPE_PATH", str(p))
    # find_bpe_vocab reads env at call time; get_tokenizer caches, so build
    # directly through the public pieces.
    monkeypatch.setattr(
        T, "_DEFAULT_BPE_PATHS", (str(p), ""), raising=True
    )
    assert T.find_bpe_vocab() == str(p)
    tok = T.BPETokenizer(T.load_merges(T.find_bpe_vocab()))
    assert tok.encode("the") == [tok.encoder["the</w>"]]


def test_fallback_without_vocab(monkeypatch):
    monkeypatch.setattr(T, "_DEFAULT_BPE_PATHS", ("", ""), raising=True)
    assert T.find_bpe_vocab() is None
    tok = T.HashTokenizer()
    out = tok.tokenize("hello world")
    assert out.shape == (1, 77) and out[0, 0] == tok.sot_token


def test_vocab_size_with_full_table():
    """Vocab derived from a full-size merge table hits OpenAI's 49408
    (256 bytes + 256 byte</w> + 48894 merges + 2 specials)."""
    n_merges = 49152 - 256 - 2  # == load_merges' slice length (48894)
    base = list(T.bytes_to_unicode().values())
    merges = []
    for a in base:
        for b in base:
            merges.append((a, b))
            if len(merges) == n_merges:
                break
        if len(merges) == n_merges:
            break
    tok = T.BPETokenizer(merges, use_native=False)
    assert tok.vocab_size == 49408
    assert tok.eot_token == 49407  # == real CLIP's EOT id
