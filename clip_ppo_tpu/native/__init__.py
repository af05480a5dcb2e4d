"""Native host-runtime components (C, built on demand, ctypes-bound).

The TPU compute path is XLA/Pallas; the host runtime around it uses C for
its hot paths — currently the BPE merge loop feeding the CLIP text tower
(`clip_ppo_tpu/native/fast_bpe.c`). The shared object is compiled once
with the system gcc into ``~/.cache/clip_ppo_tpu`` (keyed by a source
hash) and bound with ctypes; every consumer has a pure-Python fallback
with identical, parity-tested semantics, so missing toolchains degrade
gracefully.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
import uuid
import warnings
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).with_name("fast_bpe.c")
_CACHE_DIR = Path(
    os.environ.get("CLIP_PPO_NATIVE_CACHE", "~/.cache/clip_ppo_tpu")
).expanduser()

_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_build_lock = threading.Lock()


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    so_path = _CACHE_DIR / f"fast_bpe-{tag}.so"
    if not so_path.exists():
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        # Unique tmp name per build attempt: concurrent cold-cache builds
        # (processes OR threads) must never share a path — interleaved
        # writes could atomically publish a corrupt .so into the
        # hash-keyed cache, poisoning every later process.
        tmp = so_path.with_suffix(f".so.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}")
        cmd = [
            "gcc", "-O2", "-shared", "-fPIC", "-o", str(tmp), str(_SRC),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)  # atomic publish
        except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
            warnings.warn(f"native fast_bpe build failed ({e}); using Python BPE")
            tmp.unlink(missing_ok=True)
            return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError as e:
        warnings.warn(f"native fast_bpe load failed ({e}); using Python BPE")
        return None
    lib.fast_bpe_encode_batch.restype = None
    lib.fast_bpe_encode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # all_syms (in/out)
        ctypes.POINTER(ctypes.c_int64),   # offsets
        ctypes.c_int64,                   # n_words
        ctypes.POINTER(ctypes.c_uint64),  # keys
        ctypes.POINTER(ctypes.c_int32),   # ranks
        ctypes.POINTER(ctypes.c_int32),   # new_ids
        ctypes.c_int64,                   # n_pairs
        ctypes.POINTER(ctypes.c_int32),   # out_lens
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first use; None if unavailable."""
    global _lib, _build_failed
    if _lib is None and not _build_failed:
        with _build_lock:
            if _lib is None and not _build_failed:
                _lib = _build()
                _build_failed = _lib is None
    return _lib


def available() -> bool:
    return get_lib() is not None


def bpe_encode_batch(
    words: list[np.ndarray],
    keys: np.ndarray,
    ranks: np.ndarray,
    new_ids: np.ndarray,
) -> list[np.ndarray]:
    """Encode a batch of words (each an int32 symbol-id array) with one C
    call. ``keys`` must be sorted ascending; returns the merged id arrays."""
    lib = get_lib()
    assert lib is not None, "call available() first"
    offsets = np.zeros(len(words) + 1, np.int64)
    for i, w in enumerate(words):
        offsets[i + 1] = offsets[i] + len(w)
    all_syms = (
        np.concatenate(words).astype(np.int32)
        if words and offsets[-1] > 0
        else np.zeros(0, np.int32)
    )
    out_lens = np.zeros(len(words), np.int32)
    lib.fast_bpe_encode_batch(
        all_syms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int64(len(words)),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ranks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        new_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int64(len(keys)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    out = []
    for i in range(len(words)):
        start = offsets[i]
        out.append(all_syms[start : start + out_lens[i]].copy())
    return out
