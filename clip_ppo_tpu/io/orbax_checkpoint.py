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
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    return value


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

    meta = {
        "iteration": int(iteration),
        "global_step": int(global_step),
        "args": _jsonable(
            dataclasses.asdict(args) if dataclasses.is_dataclass(args) else dict(args)
        ),
        "training_complete": bool(final),
    }

    if final:
        path = Path(f"{prefix}_final").absolute()
        targets = [path]
        print(f"Final model saved: {path}")
    else:
        path = Path(f"{prefix}_step_{global_step}").absolute()
        latest = Path(f"{prefix}_latest").absolute()
        targets = [path, latest]
        print(f"Model saved at step {global_step}")

    for t in targets:
        if t.exists():
            import shutil

            shutil.rmtree(t)
        ckptr.save(t, tree)
        ckptr.wait_until_finished()
        (t / "metadata.json").write_text(json.dumps(meta))
    return str(targets[0])


def load_checkpoint_orbax(
    path: str,
    params_template: dict,
    opt_state_template: Any,
    extra_templates: Optional[dict] = None,
) -> tuple[dict, Any, int, int, dict]:
    """Restore (params, opt_state, iteration, global_step, metadata)."""
    import orbax.checkpoint as ocp

    print(f"Loading checkpoint from {path}")
    p = Path(path).absolute()
    meta = json.loads((p / "metadata.json").read_text())
    target = {
        "agent_state": params_template,
        "optimizer_state": opt_state_template,
    }
    if extra_templates:
        for name, sub in extra_templates.items():
            target[f"{name}_state"] = sub
    # Tolerate extra saved subtrees (e.g. returns) via partial restore.
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(p, target=jax.tree_util.tree_map(np.asarray, target))
    iteration = meta["iteration"]
    global_step = meta["global_step"]
    print(f"Checkpoint loaded: iteration {iteration}, global_step {global_step}")
    if meta.get("training_complete", False):
        print("Warning: This was a final checkpoint - training was marked as complete")
    params = jax.tree_util.tree_map(
        lambda a: jax.numpy.asarray(a), restored["agent_state"]
    )
    opt_state = jax.tree_util.tree_map(
        lambda a: jax.numpy.asarray(a), restored["optimizer_state"]
    )
    return params, opt_state, iteration, global_step, meta
