"""Optional Weights & Biases tracking + jax.profiler trace capture.

The reference inits W&B with ``sync_tensorboard=True`` behind ``--track``
(`ppo_minigrid.py:171-182`); this helper reproduces that behavior and
degrades with a clear message when wandb isn't installed (it is not baked
into this image). Profiling follows SURVEY §5.1: the reference has only
wall-clock SPS; here a ``jax.profiler`` trace of a few steady-state
iterations can be captured to a directory for tensorboard's profile
plugin / Perfetto.
"""

from __future__ import annotations

from typing import Any, Optional


def maybe_init_wandb(args: Any, run_name: str):
    """Start W&B tracking if ``args.track``; returns the run or None."""
    if not getattr(args, "track", False):
        return None
    try:
        import wandb
    except ImportError:
        print(
            "WARNING: --track requested but wandb is not installed; "
            "continuing with TensorBoard only."
        )
        return None
    import dataclasses

    return wandb.init(
        project=args.wandb_project_name,
        entity=args.wandb_entity,
        sync_tensorboard=True,
        config=dataclasses.asdict(args) if dataclasses.is_dataclass(args) else vars(args),
        name=run_name,
        monitor_gym=True,
        save_code=True,
    )


class ProfilerWindow:
    """Capture a jax.profiler trace for iterations [start, stop)."""

    def __init__(self, profile_dir: Optional[str], start: int = 3, stop: int = 6):
        self.profile_dir = profile_dir
        self.start = start
        self.stop = stop
        self._active = False

    def step(self, iteration: int) -> None:
        if not self.profile_dir:
            return
        import jax

        if iteration == self.start and not self._active:
            jax.profiler.start_trace(self.profile_dir)
            self._active = True
            print(f"profiler: tracing iterations {self.start}..{self.stop - 1} "
                  f"→ {self.profile_dir}")
        elif iteration == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler: trace written to {self.profile_dir}")

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
