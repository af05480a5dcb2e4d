"""Checkpoint save/load with the reference's naming and payload schema.

Payload mirrors `shared/checkpoint_utils.py:9-46`: iteration, global_step,
agent + optimizer state, the args dict, the last batch returns, a
``training_complete`` flag, and optional ``extra_models``. Naming:
``{prefix}_step_{global_step}.ckpt`` plus a ``_latest.ckpt`` overwrite and
``_final.ckpt`` at the end of training.

Arrays are stored as numpy inside a single pickle per checkpoint (the
analog of a torch .pt file); pytree structure is preserved, so restoring
is a pure tree_map back onto device — mesh/sharding-agnostic, which is
what makes resume work across host topologies.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from enum import Enum
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    def get(x):
        # Multi-process (DCN) training: replicated params span other
        # hosts' devices, where np.asarray raises — the local shard IS
        # the full value.
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            local = np.asarray(x.addressable_shards[0].data)
            assert local.shape == x.shape, (
                f"checkpointing a non-replicated multi-process array "
                f"(shard {local.shape} != global {x.shape})"
            )
            return local
        return np.asarray(x)

    return jax.tree_util.tree_map(get, tree)


def _jsonable(value):
    if isinstance(value, Enum):
        return value.value
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        return {f.name: _jsonable(getattr(value, f.name)) for f in dataclasses.fields(value)}
    if isinstance(value, (list, tuple)):
        return type(value)(_jsonable(v) for v in value)
    return value


def _backend(backend: Optional[str]) -> str:
    return backend or os.environ.get("CLIP_PPO_CKPT_BACKEND", "pickle")


def _ext() -> str:
    """Checkpoint file extension — ``.ckpt`` by default; set
    ``CLIP_PPO_CKPT_EXT=.pt`` for reference-identical filenames
    (`checkpoint_utils.py:37-46` writes ``*.pt``). The payload is a plain
    pickle either way (not a torch zipfile), so only the name changes."""
    return os.environ.get("CLIP_PPO_CKPT_EXT", ".ckpt")


def save_checkpoint(
    prefix: str,
    params: dict,
    opt_state: Any,
    iteration: int,
    global_step: int,
    args: Any,
    b_returns: Optional[np.ndarray] = None,
    final: bool = False,
    extra_models: Optional[dict] = None,
    backend: Optional[str] = None,
) -> str:
    """``backend``: "pickle" (default) or "orbax"; also settable via the
    ``CLIP_PPO_CKPT_BACKEND`` env var."""
    if _backend(backend) == "orbax":
        from clip_ppo_tpu.io.orbax_checkpoint import save_checkpoint_orbax

        return save_checkpoint_orbax(
            prefix, params, opt_state, iteration, global_step, args,
            b_returns=b_returns, final=final, extra_models=extra_models,
        )
    checkpoint = {
        "iteration": int(iteration),
        "global_step": int(global_step),
        "agent_state": _to_numpy(params),
        "optimizer_state": _to_numpy(opt_state),
        "args": _jsonable(
            dataclasses.asdict(args) if dataclasses.is_dataclass(args) else dict(args)
        ),
        "returns": np.asarray(b_returns) if b_returns is not None else None,
        "training_complete": bool(final),
    }
    if extra_models:
        for name, tree in extra_models.items():
            if tree is not None:
                checkpoint[f"{name}_state"] = _to_numpy(tree)

    ext = _ext()
    if final:
        filename = f"{prefix}_final{ext}"
        print(f"Final model saved: {filename}")
    else:
        filename = f"{prefix}_step_{global_step}{ext}"
        print(f"Model saved at step {global_step}")
        with open(f"{prefix}_latest{ext}", "wb") as f:
            pickle.dump(checkpoint, f)

    with open(filename, "wb") as f:
        pickle.dump(checkpoint, f)
    return filename


def load_checkpoint(
    path: str,
    params_template: dict,
    opt_state_template: Any,
    backend: Optional[str] = None,
    extra_templates: Optional[dict] = None,
) -> tuple[dict, Any, int, int, dict]:
    """Restore (params, opt_state, iteration, global_step, raw_checkpoint).

    Like the reference loader (`checkpoint_utils.py:49-80`), warns when
    resuming from a final checkpoint. Orbax checkpoint directories are
    auto-detected (or force with ``backend="orbax"``).

    ``extra_templates``: optional ``{name: pytree}`` — for each name, the
    stored ``{name}_state`` payload (written via ``extra_models``) is
    restored onto the template's structure as device arrays and placed in
    ``raw_checkpoint["extras"][name]``. Names missing from the checkpoint
    are skipped, so callers can pass every state leaf they *could* restore
    (e.g. SimHash counts, LSTM carry) and resume older checkpoints too.
    """
    if _backend(backend) == "orbax" or Path(path).is_dir():
        from clip_ppo_tpu.io.orbax_checkpoint import load_checkpoint_orbax

        return load_checkpoint_orbax(
            path, params_template, opt_state_template,
            extra_templates=extra_templates,
        )
    print(f"Loading checkpoint from {path}")
    with open(path, "rb") as f:
        checkpoint = pickle.load(f)

    params = jax.tree_util.tree_map(
        lambda t, a: jnp.asarray(a), params_template, checkpoint["agent_state"]
    )
    opt_state = jax.tree_util.tree_map(
        lambda t, a: jnp.asarray(a), opt_state_template, checkpoint["optimizer_state"]
    )
    for name, template in (extra_templates or {}).items():
        stored = checkpoint.get(f"{name}_state")
        if stored is not None:
            checkpoint.setdefault("extras", {})[name] = jax.tree_util.tree_map(
                lambda t, a: jnp.asarray(a), template, stored
            )
    iteration = checkpoint["iteration"]
    global_step = checkpoint["global_step"]
    print(f"Checkpoint loaded: iteration {iteration}, global_step {global_step}")
    if checkpoint.get("training_complete", False):
        print("Warning: This was a final checkpoint - training was marked as complete")
    return params, opt_state, iteration, global_step, checkpoint
