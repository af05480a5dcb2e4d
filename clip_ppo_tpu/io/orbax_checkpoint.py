"""Orbax checkpoint backend with the reference's naming/payload semantics.

The default backend (`clip_ppo_tpu.io.checkpoint`) stores the reference's
exact payload schema in a single pickle — simple, torch-`.pt`-like, fine
for single-host research runs. This module provides the same surface on
top of `orbax.checkpoint` for production/multi-host use: atomic writes,
async-friendly, sharding-aware restore (each host restores only its
shards). Naming mirrors the reference (`shared/checkpoint_utils.py:37-46`):
``{prefix}_step_{N}`` directories plus ``_latest`` and ``_final``.

Select with ``clip_ppo_tpu.io.save_checkpoint(..., backend="orbax")`` or
``CLIP_PPO_CKPT_BACKEND=orbax``; ``load_checkpoint`` auto-detects orbax
directories.
"""

from __future__ import annotations

import dataclasses
import json
from enum import Enum
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _jsonable(value):
    if isinstance(value, Enum):
        return value.value
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        return {
            f.name: _jsonable(getattr(value, f.name))
            for f in dataclasses.fields(value)
        }
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if isinstance(value, (str, int, float, bool)) or value is None:
        return value
    return str(value)  # Paths and other odd config values


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint_orbax(
    prefix: str,
    params: dict,
    opt_state: Any,
    iteration: int,
    global_step: int,
    args: Any,
    b_returns: Optional[np.ndarray] = None,
    final: bool = False,
    extra_models: Optional[dict] = None,
) -> str:
    """Write the reference payload as an orbax checkpoint directory."""
    ckptr = _checkpointer()
    tree = {
        "agent_state": params,
        "optimizer_state": opt_state,
    }
    if extra_models:
        for name, sub in extra_models.items():
            if sub is not None:
                tree[f"{name}_state"] = sub
    if b_returns is not None:
        tree["returns"] = np.asarray(b_returns)

    # _jsonable handles dataclasses itself — dataclasses.asdict would
    # pre-flatten to dicts and strand Enum/Path leaves for json.dumps.
    meta = {
        "iteration": int(iteration),
        "global_step": int(global_step),
        "args": _jsonable(args if dataclasses.is_dataclass(args) else dict(args)),
        "training_complete": bool(final),
    }

    import os
    import shutil

    def _write(t: Path) -> None:
        if t.exists() or t.is_symlink():
            if t.is_symlink():
                t.unlink()
            else:
                shutil.rmtree(t)
        ckptr.save(t, tree)
        ckptr.wait_until_finished()
        # Atomic metadata write (the orbax dir itself lands via atomic
        # rename; this closes the metadata side of that window).
        tmp = t / "metadata.json.tmp"
        tmp.write_text(json.dumps(meta))
        os.replace(tmp, t / "metadata.json")

    if final:
        path = Path(f"{prefix}_final").absolute()
        _write(path)
        print(f"Final model saved: {path}")
    else:
        path = Path(f"{prefix}_step_{global_step}").absolute()
        _write(path)
        # _latest is a symlink to the step directory (no second
        # serialization); copy as a fallback for symlink-less filesystems.
        latest = Path(f"{prefix}_latest").absolute()
        try:
            tmp_link = latest.with_name(latest.name + ".tmp")
            if tmp_link.is_symlink() or tmp_link.exists():
                tmp_link.unlink()
            tmp_link.symlink_to(path)
            if latest.is_symlink() or latest.is_file():
                latest.unlink()
            elif latest.exists():
                shutil.rmtree(latest)
            os.replace(tmp_link, latest)
        except OSError:
            if latest.exists():
                shutil.rmtree(latest)
            shutil.copytree(path, latest)
        print(f"Model saved at step {global_step}")
    return str(path)


def load_checkpoint_orbax(
    path: str,
    params_template: dict,
    opt_state_template: Any,
    extra_templates: Optional[dict] = None,
) -> tuple[dict, Any, int, int, dict]:
    """Restore (params, opt_state, iteration, global_step, metadata).

    Restores the full on-disk tree without a target (so checkpoints that
    also stored ``returns``/extra models load fine), then maps the
    agent/optimizer subtrees onto the provided templates' structure.
    """
    import orbax.checkpoint as ocp

    print(f"Loading checkpoint from {path}")
    p = Path(path).absolute()
    meta_path = p / "metadata.json"
    if not meta_path.exists():
        raise FileNotFoundError(
            f"{meta_path} missing — incomplete/torn checkpoint directory"
        )
    meta = json.loads(meta_path.read_text())
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(p)
    iteration = meta["iteration"]
    global_step = meta["global_step"]
    print(f"Checkpoint loaded: iteration {iteration}, global_step {global_step}")
    if meta.get("training_complete", False):
        print("Warning: This was a final checkpoint - training was marked as complete")

    def onto(template, sub):
        """Rebuild the template's container types from orbax's target-less
        restore, which returns only plain containers: tuples/namedtuples
        come back as lists/dicts and leafless states (optax ``EmptyState``)
        come back as ``None``. Walks both trees in parallel, placing leaves
        on device — a flat tree_map would reject the mismatched treedefs."""
        if sub is None:
            return template  # leafless subtree (e.g. optax EmptyState)
        if isinstance(template, dict):
            _check(sorted(template), sorted(sub))
            return {k: onto(template[k], sub[k]) for k in template}
        if hasattr(template, "_fields"):  # namedtuple → dict of fields
            _check(len(template._fields), len(sub))
            return type(template)(
                **{f: onto(getattr(template, f), sub[f]) for f in template._fields}
            )
        if isinstance(template, (list, tuple)):
            _check(len(template), len(sub))
            return type(template)(onto(t, s) for t, s in zip(template, sub))
        return jax.numpy.asarray(sub)

    def _check(a, b):
        if a != b:
            raise ValueError(
                f"checkpoint structure mismatch: template has {a}, "
                f"restored tree has {b}"
            )

    params = onto(params_template, restored["agent_state"])
    opt_state = onto(opt_state_template, restored["optimizer_state"])
    for name in extra_templates or {}:
        if f"{name}_state" in restored:
            meta.setdefault("extras", {})[name] = onto(
                extra_templates[name], restored[f"{name}_state"]
            )
    return params, opt_state, iteration, global_step, meta
