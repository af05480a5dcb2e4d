"""``--distributed`` plumbing shared by the four training CLIs.

The reference is single-process/single-device (SURVEY §2c,
`ppo_minigrid.py:195`); here multi-host data-parallel training is a CLI
flag: ``--distributed`` brings up `jax.distributed` (coordinator/process
count/id from ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
``JAX_PROCESS_ID``, or Cloud TPU pod auto-detection) and builds the
global ``dp`` mesh over every process's devices. Environments and the
PPO batch shard across hosts; parameters replicate; gradient psums ride
the dp axis (DCN between hosts, ICI within one).

Only the main process (``jax.process_index() == 0``) writes artifacts —
TensorBoard, videos, checkpoints, W&B; the others get a no-op writer.
"""

from __future__ import annotations

from typing import Optional


def setup_mesh(distributed: bool, num_devices: int, tp: int = 1):
    """Returns ``(mesh, is_main_process)``.

    ``distributed=True``: initialize the multi-process runtime and span
    the mesh over all processes' devices. Otherwise the single-process
    behavior: a local dp mesh when ``num_devices`` != 1 (0 = all local
    devices), else no mesh. ``tp > 1`` adds a tensor-parallel axis
    (``(dp, tp)`` mesh; dp = devices/tp) for the Megatron-sharded CLIP
    encode — single-process only (cross-host tp would put the per-layer
    all-reduces on DCN).

    Must be called before any JAX computation (jax.distributed rule).
    """
    import jax

    if distributed and tp > 1:
        raise NotImplementedError(
            "--tp composes with the local dp mesh only; multi-host "
            "tensor parallelism would ride DCN"
        )
    if distributed:
        from clip_ppo_tpu.parallel.distributed import (
            global_mesh,
            initialize_distributed,
        )

        if not initialize_distributed():
            raise RuntimeError(
                "--distributed needs JAX_COORDINATOR_ADDRESS, "
                "JAX_NUM_PROCESSES and JAX_PROCESS_ID (or Cloud TPU pod "
                "auto-detection)"
            )
        mesh = global_mesh()
        is_main = jax.process_index() == 0
        print(
            f"Distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, global dp={mesh.shape['dp']} "
            f"({jax.device_count()} devices)"
        )
        return mesh, is_main

    n_dev = num_devices if num_devices > 0 else len(jax.devices())
    if tp > 1 and num_devices == 1:
        n_dev = tp  # bare --tp N: a 1 x N mesh
    if n_dev > 1:
        from clip_ppo_tpu.parallel.mesh import make_mesh

        return make_mesh(num_devices=n_dev, tp=tp), True
    return None, True


class NullWriter:
    """SummaryWriter stand-in for non-main processes (writes nothing)."""

    def add_scalar(self, *args, **kwargs) -> None:
        pass

    def add_text(self, *args, **kwargs) -> None:
        pass

    def close(self) -> None:
        pass
